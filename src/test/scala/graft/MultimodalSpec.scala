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
}
