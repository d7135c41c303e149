package graft

import graft.operators.Series
import org.apache.spark.sql.functions._

/** Tests for the time-series/market-structure surface — each statistic
  * re-derived brute-force from collected fixture rows (independent of both
  * the Spark plan and the oracle SQL).
  */
class SeriesSpec extends SparkSpec {

  private def centsOf(v: Double): Long = math.floor(v * 100.0 + 0.5).toLong

  /** (us, event_id, user_id, event_type, cents) for non-null-value events. */
  private lazy val ev: Array[(Long, Long, Long, String, Long)] =
    Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(unix_micros(col("ts")), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        centsOf(r.getDouble(4))))

  test("q_ohlc bars match brute-force resampling and conserve tick count") {
    val got = Series.qOhlc(spark, sfDir).collect()
    assert(got.map(_.getLong(6)).sum == ev.length.toLong, "Σ n_ticks")
    val byBar = ev.groupBy(e => (e._1 / 21600000000L, e._4))
    assert(got.length == byBar.size)
    got.foreach { r =>
      val rows = byBar((r.getLong(0), r.getString(1)))
        .sortBy(e => (e._1, e._2))
      assert(r.getLong(2) == rows.head._5, "open")
      assert(r.getLong(3) == rows.map(_._5).max, "high")
      assert(r.getLong(4) == rows.map(_._5).min, "low")
      assert(r.getLong(5) == rows.last._5, "close")
      assert(r.getLong(7) == rows.map(_._5).sum, "vol")
    }
  }

  test("q_lag_features lags and rolling sums match the per-user series") {
    val daily = ev.filter(_._4 == "purchase")
      .groupBy(e => (e._3, e._1 / 86400000000L))
      .view.mapValues(_.map(_._5).sum).toMap
    val got = Series.qLagFeatures(spark, sfDir).collect()
    assert(got.length == daily.size)
    val byUser = got.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val series = rows.sortBy(_.getLong(1))
      series.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == daily((u, r.getLong(1))), "cents")
        def lagAt(k: Int): Option[Long] =
          if (i >= k) Some(series(i - k).getLong(2)) else None
        assert(Option(if (r.isNullAt(3)) null else r.getLong(3))
          .map(_.asInstanceOf[Long]) == lagAt(1), "lag1")
        assert(Option(if (r.isNullAt(4)) null else r.getLong(4))
          .map(_.asInstanceOf[Long]) == lagAt(7), "lag7")
        val roll = series.slice(math.max(0, i - 6), i + 1)
          .map(_.getLong(2)).sum
        assert(r.getLong(5) == roll, "roll7")
      }
    }
  }

  test("q_changepoint finds the brute-force argmax split of the daily series") {
    val daily = ev.filter(_._4 == "purchase")
      .groupBy(_._1 / 86400000000L)
      .view.mapValues(_.map(_._5).sum).toSeq.sortBy(_._1)
    val n = daily.length
    val total = daily.map(_._2).sum
    var best: (Double, Long, Long, Double, Double) = null // (diff, dy, t, m1, m2)
    var cum = 0L
    daily.zipWithIndex.dropRight(1).foreach { case ((dy, c), i) =>
      cum += c
      val t = i + 1L
      val m1 = cum.toDouble / t.toDouble
      val m2 = (total - cum).toDouble / (n - t).toDouble
      val d = math.abs(m1 - m2)
      if (best == null || d > best._1) best = (d, dy, t, m1, m2)
    }
    val r = Series.qChangepoint(spark, sfDir).collect().head
    assert(r.getLong(0) == best._2, "split day")
    assert(r.getLong(1) == best._3 && r.getLong(2) == n - best._3, "sizes")
    assert(r.getDouble(3) == best._4 && r.getDouble(4) == best._5, "means")
    assert(r.getDouble(5) == best._1, "abs_diff")
  }

  test("q_hhi is exact fixed-point and bounded by [10^8/n, 10^8]") {
    val got = Series.qHhi(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val n = r.getLong(1)
      val hhi = r.getLong(3)
      // Floored basis points undershoot slightly; the perfect-equality lower
      // bound still holds up to the n*9999-floor slack.
      assert(hhi <= 100000000L, s"${r.getString(0)} hhi upper")
      assert(hhi >= (10000L / n - 1) * (10000L / n - 1) * n / 2,
        s"${r.getString(0)} hhi lower (loose)")
    }
    // Brute-force one region end-to-end.
    val sn = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * (1.0 - r.getDouble(2)) * 100.0 + 0.5).toLong))
    val region0 = got.head.getString(0)
    val revs = li.filter(e => sn(e._1) == region0)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).values.toSeq
    val total = revs.sum
    val hhiBrute = revs.map(r => { val bp = r * 10000L / total; bp * bp }).sum
    assert(got.head.getLong(3) == hhiBrute, "brute-force HHI")
    assert(got.head.getLong(2) == total && got.head.getLong(1) == revs.size)
  }

  test("q_pareto k80 matches the brute-force cumulative cut per segment") {
    val oc = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("c_custkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), centsOf(r.getDouble(2))))
    val got = Series.qPareto(spark, sfDir).collect()
    got.foreach { r =>
      val seg = r.getString(0)
      val perCust = oc.filter(_._1 == seg).groupBy(_._2)
        .view.mapValues(_.map(_._3).sum).toSeq
        .sortBy { case (k, v) => (-v, k) }
      val total = perCust.map(_._2).sum
      assert(r.getLong(1) == perCust.size && r.getLong(2) == total)
      var cum = 0L
      val k80 = perCust.zipWithIndex.collectFirst {
        case ((_, v), i) if { cum += v; cum * 5 >= total * 4 } => i + 1L
      }.get
      assert(r.getLong(3) == k80, s"$seg k80")
      val d = (perCust.size + 9) / 10
      val topDec = perCust.take(d).map(_._2).sum * 10000L / total
      assert(r.getLong(4) == topDec, s"$seg top decile")
    }
  }

  test("q_did equals the four-cell recomputation bit-exactly") {
    val base = ev.filter(e => e._4 == "purchase" || e._4 == "view")
    val mid = (base.map(_._1).min + base.map(_._1).max) / 2
    def mean(t: Boolean, post: Boolean): Double = {
      val cell = base.filter(e =>
        (e._4 == "purchase") == t && (e._1 >= mid) == post)
      cell.map(_._5).sum.toDouble / cell.length.toDouble
    }
    val (mtPre, mtPost, mcPre, mcPost) =
      (mean(t = true, post = false), mean(t = true, post = true),
        mean(t = false, post = false), mean(t = false, post = true))
    val r = Series.qDid(spark, sfDir).collect().head
    assert(r.getDouble(0) == mtPre && r.getDouble(1) == mtPost)
    assert(r.getDouble(2) == mcPre && r.getDouble(3) == mcPost)
    assert(r.getDouble(4) == (mtPost - mtPre) - (mcPost - mcPre))
  }

  test("q_dtw equals the brute-force DP over gap-filled daily count series") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 86400000L))
    val days = ev.map(_._2)
    val (lo, hi) = (days.min, days.max)
    val series: Map[String, Array[Long]] = ev.map(_._1).distinct.sorted.map { t =>
      val byDay = ev.filter(_._1 == t).groupBy(_._2).view.mapValues(_.length.toLong)
      t -> (lo to hi).map(d => byDay.getOrElse(d, 0L)).toArray
    }.toMap

    def dtw(a: Array[Long], b: Array[Long]): Long = {
      val INF = 1000000000000000L
      var prev = Array.fill(b.length + 1)(INF); prev(0) = 0L
      for (ai <- a) {
        val curr = Array.fill(b.length + 1)(INF)
        for (j <- 1 to b.length)
          curr(j) = math.abs(ai - b(j - 1)) +
            math.min(prev(j), math.min(prev(j - 1), curr(j - 1)))
        prev = curr
      }
      prev(b.length)
    }

    val got = Series.qDtw(spark, sfDir).collect()
    val types = series.keys.toSeq.sorted
    assert(got.length == types.combinations(2).length, "one row per type pair")
    got.foreach { r =>
      val want = dtw(series(r.getString(0)), series(r.getString(1)))
      assert(r.getLong(2) == want,
        s"dtw(${r.getString(0)}, ${r.getString(1)})")
      // DTW is bounded above by the Manhattan distance of the alignment-free
      // pairing (the diagonal path is one admissible warping).
      val diag = series(r.getString(0)).zip(series(r.getString(1)))
        .map { case (x, y) => math.abs(x - y) }.sum
      assert(r.getLong(2) <= diag, "warping can only improve on the diagonal")
    }
  }

  test("q_dtw_banded equals the brute-force banded DP; band only ever tightens the warp") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 86400000L))
    val days = ev.map(_._2)
    val (lo, hi) = (days.min, days.max)
    val series: Map[String, Array[Long]] = ev.map(_._1).distinct.sorted.map { t =>
      val byDay = ev.filter(_._1 == t).groupBy(_._2).view.mapValues(_.length.toLong)
      t -> (lo to hi).map(d => byDay.getOrElse(d, 0L)).toArray
    }.toMap

    // Brute-force SAKOE-CHIBA DP over FULL-WIDTH rows (the obviously-
    // correct masked form) — the query's band-relative O(n·w) rows must
    // reproduce it cell-for-cell at the corner.
    def dtwBanded(a: Array[Long], b: Array[Long], w: Int): Long = {
      val INF = 1000000000000000L
      var prev = Array.fill(b.length + 1)(INF); prev(0) = 0L
      for (i <- 1 to a.length) {
        val curr = Array.fill(b.length + 1)(INF)
        for (j <- 1 to b.length if math.abs(i - j) <= w)
          curr(j) = math.abs(a(i - 1) - b(j - 1)) +
            math.min(prev(j), math.min(prev(j - 1), curr(j - 1)))
        prev = curr
      }
      prev(b.length)
    }
    def dtwFull(a: Array[Long], b: Array[Long]): Long =
      dtwBanded(a, b, math.max(a.length, b.length))

    val got = Series.qDtwBanded(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (sa, sb) = (series(r.getString(0)), series(r.getString(1)))
      val want = dtwBanded(sa, sb, Series.DtwBand)
      assert(r.getLong(2) == want,
        s"banded dtw(${r.getString(0)}, ${r.getString(1)})")
      // Banding forbids long warps: banded >= full, always.
      assert(r.getLong(2) >= dtwFull(sa, sb),
        "the band can only restrict the alignment space")
      // And a band at least as wide as the series is the full DP.
      assert(dtwBanded(sa, sb, math.max(sa.length, sb.length)) ==
        dtwFull(sa, sb))
    }
  }

  test("q_seasonal_backtest replays the gap-filled lag errors brute-force") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(date_trunc("day", col("ts")))).collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000L))
    val counts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = rows.map(_._1).distinct.sorted
    val lo = rows.map(_._2).min
    val hi = rows.map(_._2).max
    val got = Series.qSeasonalBacktest(spark, sfDir).collect()
    assert(got.length == types.length)
    got.zip(types).foreach { case (r, t) =>
      val series = (lo to hi).map(dy => counts.getOrElse((t, dy), 0L))
      val eval = (7 until series.length).map { i =>
        (math.abs(series(i) - series(i - 1)), math.abs(series(i) - series(i - 7)))
      }
      val saeN = eval.map(_._1).sum
      val saeS = eval.map(_._2).sum
      assert(r.getString(0) == t)
      assert(r.getLong(1) == eval.length.toLong, s"n_eval for $t")
      assert(r.getLong(2) == saeN, s"sae_naive for $t")
      assert(r.getLong(3) == saeS, s"sae_seasonal for $t")
      assert(r.getDouble(4) == saeN.toDouble / eval.length.toDouble)
      assert(r.getDouble(5) == saeS.toDouble / eval.length.toDouble)
      assert(r.getString(6) == (if (saeN <= saeS) "naive" else "seasonal"))
    }
  }

  test("q_disorder: ingest order is clean, hash-shuffled order replays brute-force") {
    import java.security.MessageDigest
    def h(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Series.qDisorder(spark, sfDir).collect()
    got.foreach { r =>
      val t = r.getString(0)
      val evs = rows.filter(_._1 == t)
      // shuffled replay
      val sh = evs.sortBy(e => (h(e._2), e._2))
      var runMax = Long.MinValue
      var nLate = 0L
      var maxLate = 0L
      sh.foreach { e =>
        runMax = math.max(runMax, e._3)
        val late = runMax - e._3
        if (late > Series.DisorderBoundUs) nLate += 1
        maxLate = math.max(maxLate, late)
      }
      assert(r.getLong(1) == evs.length.toLong)
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
        s"fixture ingest must be in-order for $t")
      assert(r.getLong(4) == nLate, s"shuffled n_late for $t")
      assert(r.getDouble(5) == nLate.toDouble / evs.length.toDouble)
      assert(r.getLong(6) == maxLate, s"shuffled max_late for $t")
      // the adversarial permutation must produce real disorder
      assert(nLate > 0L)
    }
  }
}
