package graft

import java.io.FileNotFoundException

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the fork-free local filesystem (round 20): the NIO
  * overrides must report and apply EXACTLY what the shipped shell-exec
  * fallback did — permissions round-trip bit-for-bit, missing paths throw
  * FileNotFoundException, statuses carry real owner/length/mtime — while
  * making zero forks (the perf claim itself is receipted in
  * OPTIMIZATION_r20.md's micro-benchmarks; here we pin behavior).
  */
class GraftLocalFsSpec extends AnyFunSuite {

  private def freshDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_fs_spec_").toFile
    d.deleteOnExit()
    d
  }

  private def conf(): Configuration = {
    val c = new Configuration()
    c.set("fs.file.impl", "graft.hadoop.GraftLocalFileSystem")
    c.set("fs.AbstractFileSystem.file.impl", "graft.hadoop.GraftLocalFs")
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }

  test("registered impls resolve for both FileSystem and FileContext APIs") {
    val p = new Path(s"file:${freshDir().getAbsolutePath}")
    val fs = p.getFileSystem(conf())
    assert(fs.getClass.getName == "graft.hadoop.GraftLocalFileSystem")
    val fc = FileContext.getFileContext(p.toUri, conf())
    assert(fc.getDefaultFileSystem.getClass.getName == "graft.hadoop.GraftLocalFs")
  }

  test("setPermission round-trips every 0777 bit pattern") {
    val dir = freshDir()
    val fs = FileSystem.get(new java.net.URI("file:///"), conf())
    val f = new Path(s"file:${dir.getAbsolutePath}/perm_target")
    fs.create(f, true).close()
    for (bits <- Seq(0x1ff, 0x1ed, 0x180, 0x124, 0x1a4, 0x0)) {
      fs.setPermission(f, new FsPermission(bits.toShort))
      val got = fs.getFileStatus(f).getPermission.toShort.toInt
      assert(got == bits, f"wrote $bits%03o, read back $got%03o")
    }
  }

  test("getFileStatus matches java.io ground truth and FNFs on missing paths") {
    val dir = freshDir()
    val fs = FileSystem.get(new java.net.URI("file:///"), conf())
    val f = new Path(s"file:${dir.getAbsolutePath}/status_target")
    val os = fs.create(f, true)
    os.write(Array.fill[Byte](12345)(1))
    os.close()
    val st = fs.getFileStatus(f)
    val io = new java.io.File(dir, "status_target")
    assert(st.getLen == 12345 && !st.isDirectory)
    assert(st.getModificationTime == io.lastModified())
    assert(st.getOwner.nonEmpty && st.getGroup.nonEmpty)
    val dst = fs.getFileStatus(new Path(s"file:${dir.getAbsolutePath}"))
    assert(dst.isDirectory)
    intercept[FileNotFoundException] {
      fs.getFileStatus(new Path(s"file:${dir.getAbsolutePath}/nope"))
    }
    intercept[FileNotFoundException] {
      fs.getFileLinkStatus(new Path(s"file:${dir.getAbsolutePath}/nope"))
    }
  }

  test("FileContext atomic write + overwrite-rename round-trips content") {
    // The streaming CheckpointFileManager's exact sequence: create a temp
    // file via FileContext, write, close, rename(OVERWRITE) over a
    // pre-existing destination.
    val dir = freshDir()
    val base = new Path(s"file:${dir.getAbsolutePath}")
    val fc = FileContext.getFileContext(base.toUri, conf())
    val dst = new Path(base, "1.changelog")
    def writeVia(tmpName: String, payload: String): Unit = {
      val tmp = new Path(base, tmpName)
      val os = fc.create(tmp,
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
          org.apache.hadoop.fs.CreateFlag.OVERWRITE))
      os.write(payload.getBytes("UTF-8"))
      os.close()
      fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    writeVia(".1.tmp", "first")
    writeVia(".2.tmp", "second-longer")
    val in = fc.open(dst)
    val buf = new Array[Byte](64)
    val n = in.read(buf)
    in.close()
    assert(new String(buf, 0, n, "UTF-8") == "second-longer")
    assert(fc.getFileStatus(dst).getLen == "second-longer".length)
  }
}
