package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Specs for the multimodal decode-stage plumbing (Multimodal.scala).
  * The decodes are documented stubs; what these tests pin is that the
  * per-partition frame loop and the windowed adjacency downstream
  * reproduce the byte-level contract exactly, independent of
  * partitioning.
  */
class MultimodalSpec extends SparkSpec {

  test("q_media_phash equals the hand-rolled dHash with consistent band keys") {
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = texts.map { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      def s(k: Int): Long = {
        val from = k * Multimodal.PhashWindow
        val to = math.min(bytes.length, (k + 1) * Multimodal.PhashWindow)
        if (from >= to) 0L
        else bytes.slice(from, to).map(b => (b & 0xff).toLong).sum
      }
      val h = (0 until Multimodal.PhashBits).foldLeft(0L) { (acc, j) =>
        if (s(j + 1) > s(j)) acc | (1L << j) else acc
      }
      (id, h)
    }.sortBy(_._1)
    val got = Multimodal.qMediaPhash(spark, sfDir).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, (id, h)) =>
      assert(g.getLong(0) == id && g.getLong(1) == h, s"doc $id phash")
      // Band keys reassemble the hash exactly.
      val keys = (0 until Multimodal.PhashBits / Multimodal.PhashBlockBits)
        .map(b => g.getLong(2 + b))
      val rebuilt = keys.zipWithIndex.foldLeft(0L) { case (acc, (k, b)) =>
        acc | (k << (Multimodal.PhashBlockBits * b))
      }
      assert(rebuilt == h, s"doc $id band keys don't reassemble")
    }
    // The hash must discriminate: distinct blobs ⇒ (mostly) distinct hashes.
    assert(got.map(_.getLong(1)).distinct.length > got.length / 2)
  }

  test("q_frame_diff equals the brute-force adjacent-frame deltas") {
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = texts.flatMap { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val sums = (0 until bytes.length / Multimodal.FrameBytes).map { f =>
        bytes.slice(f * Multimodal.FrameBytes, (f + 1) * Multimodal.FrameBytes)
          .map(b => (b & 0xff).toLong).sum
      }
      sums.zipWithIndex.drop(1).map { case (s, f) =>
        val delta = math.abs(s - sums(f - 1))
        (id, f, s, delta, delta > Multimodal.CutThreshold)
      }
    }.sortBy(r => (r._1, r._2))
    val got = Multimodal.qFrameDiff(spark, sfDir).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, (id, f, s, delta, cut)) =>
      assert(g.getLong(0) == id && g.getInt(1) == f && g.getLong(2) == s &&
        g.getLong(3) == delta && g.getBoolean(4) == cut, s"doc $id frame $f")
    }
    assert(got.exists(_.getBoolean(4)) && got.exists(r => !r.getBoolean(4)),
      "both cut classes populated")
  }

  test("q_media_dedup equals brute-force fixed-block segment dedup") {
    import org.apache.spark.sql.functions._
    val fb = graft.operators.Multimodal.FrameBytes
    def sha(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(bytes).map("%02x".format(_)).mkString
    val segs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        (0 until bytes.length / fb).map { f =>
          (r.getLong(0), sha(bytes.slice(f * fb, (f + 1) * fb)))
        }
      }
    val expected = segs.groupBy(_._2).map { case (h, ms) =>
      h -> ((ms.length.toLong, ms.map(_._1).distinct.length.toLong,
        ms.map(_._1).min))
    }.filter(_._2._1 >= 2).toSeq
      .map { case (h, (nc, nd, cn)) => (h, nc, nd, cn) }
      .sortBy { case (h, nc, _, _) => (-nc, h) }.take(20)
    val got = graft.operators.Multimodal.qMediaDedup(spark, sfDir).collect()
    assert(got.length == expected.length && got.nonEmpty,
      "fixture must contain duplicated segments")
    got.zip(expected).foreach { case (g, (h, nc, nd, cn)) =>
      assert(g.getString(0) == h && g.getLong(1) == nc &&
        g.getLong(2) == nd && g.getLong(3) == cn)
      assert(g.getLong(4) == (nc - 1) * fb)
    }
    // Cross-document duplication must be present (shared prefixes of the
    // near-dup families), not just within-document repeats.
    assert(got.exists(_.getLong(2) >= 2))
  }

  test("fixture text is pure ASCII (the byte==char oracle contract)") {
    // The Multimodal oracles segment DuckDB CHARACTERS with BYTE-count
    // bounds; the Spark side segments UTF-8 bytes. Equivalence requires
    // bytes == chars, i.e. pure ASCII — tripwire it so a fixture change
    // fails loudly here instead of as a silent oracle hash mismatch.
    val nonAscii = Tables.documents(spark, sfDir)
      .filter(length(col("text")) =!= length(encode(col("text"), "UTF-8")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain multibyte chars — Multimodal/Corpus " +
        "byte-based oracles are only valid for ASCII fixtures")
  }
}
