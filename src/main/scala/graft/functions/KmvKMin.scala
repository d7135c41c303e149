package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Buffer for [[KmvKMin]]: the k smallest DISTINCT hash values seen so
  * far, sorted ascending (≤ k elements — below k the sketch IS the exact
  * distinct set).
  */
case class KmvBuf(hs: Seq[Long])

/** Output of [[KmvKMin]]: `hk` = the k-th smallest distinct hash (NULL
  * while the domain has fewer than k distinct values — then `n_sketch`
  * is the exact distinct count).
  */
case class KmvOut(hk: Option[Long], n_sketch: Long)

/** The PartialKMV pre-merge `q_kmv_distinct`'s scaladoc documents as the
  * 100 TB lever, made real: a typed `Aggregator` whose buffer is the
  * bounded k-min distinct set, so Spark runs it with MAP-SIDE PARTIAL
  * aggregation — each scan partition reduces its (possibly huge, possibly
  * duplicate-heavy) hash stream to ≤ k longs per group before the
  * shuffle, and the exchange carries ≤ k · partitions · |groups| values
  * no matter the corpus or vocabulary size. Compare the window form
  * (`q_kmv_distinct`): that one distinct-aggregates first (shuffle ~
  * vocabulary-sized) and ranks; this one bounds the shuffle
  * STRUCTURALLY — the theta-sketch merge identity (union = k smallest of
  * the union) executed by the aggregation framework itself.
  *
  * Determinism under any partitioning/merge order: the buffer is a pure
  * function of the SET of values seen (k smallest distinct longs), and
  * both `reduce` and `merge` preserve exactly that — order-free by
  * construction, so the result is hash-exact against a sequential oracle.
  */
class KmvKMin(k: Int) extends Aggregator[Long, KmvBuf, KmvOut] {
  override def zero: KmvBuf = KmvBuf(Vector.empty)

  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    val hs = b.hs
    // Full buffer and h can't displace anything: the overwhelmingly
    // common case once the stream saturates — O(1).
    if (hs.length == k && h >= hs.last) b
    else if (hs.contains(h)) b // distinct semantics: re-seeing a value is a no-op
    else {
      val merged = (hs :+ h).sorted
      KmvBuf(if (merged.length > k) merged.take(k) else merged)
    }
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.hs ++ b.hs).distinct.sorted.take(k))

  override def finish(r: KmvBuf): KmvOut =
    KmvOut(if (r.hs.length == k) Some(r.hs.last) else None, r.hs.length.toLong)

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
}

object KmvKMin {
  /** `kmv_kmin(h)` as an agg Column: struct(hk, n_sketch). */
  def kmvKMin(k: Int)(h: Column): Column =
    udaf(new KmvKMin(k), Encoders.scalaLong)(h)
}
