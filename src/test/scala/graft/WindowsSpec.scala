package graft

import graft.operators.Windows
import org.apache.spark.sql.functions.{col, unix_micros}

/** Self-checks for the event-time window operators that need more than
  * the oracle gate: the concurrency sweep is replayed by hand from the
  * raw events (independent sessionization + interval overlap count).
  */
class WindowsSpec extends SparkSpec {

  test("q_concurrency equals the brute-force session-overlap sweep") {
    val gapUs = 30L * 60L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // Hand-rolled 30-min-gap sessionization per user.
    val intervals = ev.groupBy(_._1).values.flatMap { rs =>
      val ts = rs.map(_._2).sorted
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ts.head
      var last = ts.head
      ts.tail.foreach { t =>
        if (t - last >= gapUs) { sessions += ((start, last + gapUs)); start = t }
        last = t
      }
      sessions += ((start, last + gapUs))
      sessions
    }.toSeq
    // Sweep: ends (-1) before starts (+1) at the same instant.
    val sweep = (intervals.map(i => (i._1, 1L)) ++
      intervals.map(i => (i._2, -1L))).sortBy { case (us, d) => (us, d) }
    var level = 0L
    var peak = 0L
    var firstPeakUs = Long.MaxValue
    val levels = sweep.map { case (us, d) => level += d; (us, level) }
    peak = levels.map(_._2).max
    firstPeakUs = levels.filter(_._2 == peak).map(_._1).min
    val got = Windows.qConcurrency(spark, sfDir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == intervals.size.toLong, "n_sessions")
    assert(r.getLong(1) == peak, "peak_concurrent")
    assert(r.getLong(2) == firstPeakUs, "first_peak_us")
    // Non-degenerate: real overlap exists and not everyone overlaps.
    assert(peak >= 2 && peak < intervals.size)
  }
}
