package graft.hadoop

import java.io.FileNotFoundException
import java.net.URI
import java.nio.file.{Files, NoSuchFileException}
import java.nio.file.attribute.{PosixFileAttributes, PosixFilePermission}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.local.LocalConfigKeys
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free local filesystem for Hadoop's `file:` scheme (round-20
  * measurement, VERDICT item #1 root cause).
  *
  * When `libhadoop.so` is absent — as in this image, and commonly in
  * slim containers — Hadoop's `RawLocalFileSystem` falls back from
  * NativeIO to SHELLING OUT for permission work: every `create()` runs
  * `chmod` as a child process (LocalFSFileOutputStream's constructor
  * calls `setPermission` when NativeIO is unavailable) and every
  * `FileStatus.getPermission` on the lazy status class runs `ls -ld`.
  * Forking a multi-GB JVM costs tens of milliseconds per call, so a
  * 20 KB atomic checkpoint write (create tmp + write + close + rename)
  * measured **84 ms on tmpfs** — against ~30 µs for the raw syscalls.
  * Every streaming micro-batch pays it per state store per commit
  * (changelog file), plus offset/commit WAL entries; every parquet
  * write pays it per part-file and per commit rename.
  *
  * These subclasses replace exactly the two forking fallbacks with
  * semantically identical `java.nio.file` calls (same bits applied,
  * same owner/group/permissions reported, same FileNotFound behavior)
  * and change nothing else. Special-permission bits (setuid/setgid/
  * sticky) that POSIX-attribute NIO cannot express fall back to the
  * shipped shell path — Spark scratch never uses them.
  *
  * Wiring (per session, parameterized — NOT baked in): set
  *   `spark.hadoop.fs.file.impl = graft.hadoop.GraftLocalFileSystem`
  *   (FileSystem API: parquet writers, committers, manifest IO) and
  *   `spark.hadoop.fs.AbstractFileSystem.file.impl = graft.hadoop.GraftLocalFs`
  *   (FileContext API: streaming CheckpointFileManager — offsets,
  *   commits, state changelogs).
  * On clusters where `libhadoop.so` IS present the shipped classes
  * never fork and this override is inert in effect (NIO and NativeIO
  * chmod are both direct syscalls).
  */
class GraftRawLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    if ((bits & 0xE00) != 0) {
      // setuid/setgid/sticky: outside PosixFilePermission's model.
      super.setPermission(p, permission)
    } else {
      try {
        Files.setPosixFilePermissions(
          pathToFile(p).toPath, GraftLocalFsUtil.toPosix(bits)): Unit
      } catch {
        case e: NoSuchFileException =>
          throw new FileNotFoundException(e.getMessage)
        case _: UnsupportedOperationException =>
          super.setPermission(p, permission)
      }
    }
  }

  override def getFileStatus(f: Path): FileStatus =
    nioStatus(f, followLinks = true)(super.getFileStatus(f))

  /** The no-NativeIO fallback here execs `stat`+`ls` per call, and
    * `FileContext.rename` (the checkpoint manager's atomic-write commit)
    * calls it for BOTH endpoints of every rename — measured 16 forks /
    * ~40 ms per checkpoint rename before this override.
    */
  override def getFileLinkStatus(f: Path): FileStatus =
    nioStatus(f, followLinks = false)(super.getFileLinkStatus(f))

  private def nioStatus(f: Path, followLinks: Boolean)
                       (fallback: => FileStatus): FileStatus = {
    val file = pathToFile(f)
    try {
      val attrs =
        if (followLinks)
          Files.readAttributes(file.toPath, classOf[PosixFileAttributes])
        else
          Files.readAttributes(file.toPath, classOf[PosixFileAttributes],
            java.nio.file.LinkOption.NOFOLLOW_LINKS)
      if (!followLinks && attrs.isSymbolicLink) {
        // Actual symlinks keep the shipped semantics (symlink target
        // resolution) — never on a Spark scratch path.
        fallback
      } else {
        new FileStatus(
          attrs.size(),
          attrs.isDirectory,
          1,
          getDefaultBlockSize(f),
          attrs.lastModifiedTime().toMillis,
          attrs.lastAccessTime().toMillis,
          new FsPermission(GraftLocalFsUtil.fromPosix(attrs.permissions())),
          attrs.owner().getName,
          attrs.group().getName,
          f.makeQualified(getUri, getWorkingDirectory))
      }
    } catch {
      case _: NoSuchFileException =>
        throw new FileNotFoundException(s"File $f does not exist")
      case _: UnsupportedOperationException =>
        fallback
    }
  }
}

/** `fs.file.impl` registration: the checksummed wrapper every consumer
  * of the FileSystem API gets for `file:` URIs, over the fork-free raw
  * filesystem.
  */
class GraftLocalFileSystem
  extends LocalFileSystem(new GraftRawLocalFileSystem)

/** `fs.AbstractFileSystem.file.impl` registration (the FileContext API
  * used by streaming's CheckpointFileManager). Mirrors the shipped
  * `org.apache.hadoop.fs.local.RawLocalFs`/`LocalFs` pair over the
  * fork-free raw filesystem.
  */
class GraftRawLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(
    uri, new GraftRawLocalFileSystem, conf, "file", false) {
  def this(conf: Configuration) = this(FsConstants.LOCAL_FS_URI, conf)
  override def getUriDefaultPort: Int = -1
  override def getServerDefaults(f: Path): FsServerDefaults =
    LocalConfigKeys.getServerDefaults()
  @deprecated("mirrors the shipped RawLocalFs override", "")
  override def getServerDefaults: FsServerDefaults =
    LocalConfigKeys.getServerDefaults()
  override def isValidName(src: String): Boolean = true
}

class GraftLocalFs(uri: URI, conf: Configuration)
  extends ChecksumFs(new GraftRawLocalFs(uri, conf)) {
  def this(conf: Configuration) = this(FsConstants.LOCAL_FS_URI, conf)
}

private[hadoop] object GraftLocalFsUtil {
  import PosixFilePermission._
  private val order: Array[PosixFilePermission] = Array(
    OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
    GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
    OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)

  def toPosix(bits: Int): java.util.Set[PosixFilePermission] = {
    val s = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    var i = 0
    while (i < 9) {
      if ((bits & (0x100 >> i)) != 0) s.add(order(i)): Unit
      i += 1
    }
    s
  }

  def fromPosix(perms: java.util.Set[PosixFilePermission]): Short = {
    var bits = 0
    var i = 0
    while (i < 9) {
      if (perms.contains(order(i))) bits |= (0x100 >> i)
      i += 1
    }
    bits.toShort
  }
}
