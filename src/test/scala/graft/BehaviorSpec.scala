package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._

/** Tests for the customer-behavior surface — each statistic re-derived
  * brute-force from collected fixture rows (independent of both the Spark
  * plan and the oracle SQL).
  */
class BehaviorSpec extends SparkSpec {

  private def centsOf(v: Double): Long = math.floor(v * 100.0 + 0.5).toLong
  private def dayMs(t: java.sql.Timestamp): Long = {
    val ms = t.getTime
    ms - Math.floorMod(ms, 86400000L)
  }

  test("q_rfm segments partition all purchasers and conserve cents mass") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
    val purch = ev.filter(_._3 == "purchase")
    val purchasers = purch.map(_._1).distinct
    val totalCents = purch.map(p => centsOf(p._4)).sum

    val got = Behavior.qRfm(spark, sfDir).collect()
    assert(got.nonEmpty)
    // Quartile codes are in range and the matrix partitions every purchaser.
    got.foreach { r =>
      (0 to 2).foreach(i => assert(r.getLong(i) >= 1 && r.getLong(i) <= 4))
    }
    assert(got.map(_.getLong(3)).sum == purchasers.length.toLong)
    assert(got.map(_.getLong(4)).sum == totalCents)
    // ntile(4) balance: each quartile of each dimension holds n/4 users
    // (±1, earlier tiles get the extras) — checked on the recency axis.
    val byR = got.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(3)).sum).toMap
    val n = purchasers.length
    (1L to 4L).foreach { qt =>
      val want = n / 4 + (if (qt <= n % 4) 1 else 0)
      assert(byR(qt) == want, s"recency quartile $qt size")
    }
  }

  test("q_ltv matches brute-force cohort accumulation") {
    val os = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("m"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, centsOf(r.getDouble(2))))
    val cohort = os.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    def monthsBetween(a: Long, b: Long): Long = {
      val ca = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
      val cb = ca.clone().asInstanceOf[java.util.Calendar]
      ca.setTimeInMillis(a); cb.setTimeInMillis(b)
      (ca.get(java.util.Calendar.YEAR) - cb.get(java.util.Calendar.YEAR)) * 12L +
        (ca.get(java.util.Calendar.MONTH) - cb.get(java.util.Calendar.MONTH))
    }
    val cells = os.groupBy(o => (cohort(o._1), monthsBetween(o._2, cohort(o._1))))
      .view.mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap

    val got = Behavior.qLtv(spark, sfDir).collect()
    assert(got.nonEmpty)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    // Each row matches the brute-force cell and the running sum is the
    // prefix sum of its cohort's cells in offset order.
    val byCohort = got.groupBy(_.getString(0))
    byCohort.foreach { case (cs, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      var running = 0L
      sorted.foreach { r =>
        val key = (fmt.parse(cs).getTime, r.getLong(1))
        val (n, cents) = cells(key)
        assert(r.getLong(2) == n, s"$cs offset ${r.getLong(1)} n_orders")
        assert(r.getLong(3) == cents, s"$cs offset ${r.getLong(1)} rev_cents")
        running += cents
        assert(r.getLong(4) == running, s"$cs offset ${r.getLong(1)} cum")
      }
    }
    // Completeness: every brute-force cell appears.
    assert(got.length == cells.size)
  }
}
