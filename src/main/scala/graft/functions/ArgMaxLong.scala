package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Buffer for [[ArgMaxLong]]: the best (value, id) seen so far.
  * `set=false` marks the zero/empty buffer.
  */
case class ArgMaxBuf(id: Long, v: Double, set: Boolean)

/** Typed argmax aggregator (SURVEY.md §2e E12): returns the `id` of the row
  * with the highest `v`, ties broken toward the smallest id — the
  * partial-aggregable form of the reference's "sort desc, take first row"
  * insight (/root/reference/app.py:211,217).
  *
  * Being an `Aggregator`, Spark runs it with map-side partial aggregation:
  * each partition reduces to one 17-byte buffer before the shuffle, so at
  * 100 TB only |groups| buffers move, never rows. Deterministic under any
  * merge order: comparisons go through `java.lang.Double.compare`, which is
  * a total order (NaN sorts greatest, matching Spark's `max()` and DuckDB),
  * and null inputs are skipped like SQL aggregates skip NULLs — so the
  * result never depends on partition/merge order even with NaN or null
  * values present.
  */
class ArgMaxLong extends Aggregator[(Long, Option[Double]), ArgMaxBuf, Long] {
  override def zero: ArgMaxBuf = ArgMaxBuf(0L, Double.NegativeInfinity, set = false)

  private def better(a: ArgMaxBuf, b: ArgMaxBuf): ArgMaxBuf =
    if (!a.set) b
    else if (!b.set) a
    else {
      val c = java.lang.Double.compare(a.v, b.v)
      if (c > 0 || (c == 0 && a.id <= b.id)) a else b
    }

  override def reduce(b: ArgMaxBuf, in: (Long, Option[Double])): ArgMaxBuf =
    in._2 match {
      case Some(v) => better(b, ArgMaxBuf(in._1, v, set = true))
      case None    => b // SQL semantics: NULL values never win the argmax
    }

  override def merge(a: ArgMaxBuf, b: ArgMaxBuf): ArgMaxBuf = better(a, b)

  override def finish(r: ArgMaxBuf): Long = r.id

  override def bufferEncoder: Encoder[ArgMaxBuf] = Encoders.product[ArgMaxBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object ArgMaxLong {
  private val fn = udaf(new ArgMaxLong, Encoders.product[(Long, Option[Double])])

  /** `arg_max_long(id, v)` as a Column for use in `groupBy(...).agg(...)`. */
  def argMaxLong(id: Column, v: Column): Column = fn(id, v)
}
