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

  test("q_prop_test matches the brute-force two-proportion z statistic") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val conv = ev.groupBy(_._1).view
      .mapValues(g => if (g.exists(e => e._2 == "purchase" && e._3 >= 150.0)) 1L else 0L)
      .toMap
    // .toSeq before mapping keys through `conv`: a Set.map would dedup
    // the 0/1 flags and break the sums.
    val (v0, v1) = conv.keys.toSeq.partition(_ % 2 == 0)
    val (n0, c0) = (v0.size.toLong, v0.map(conv).sum)
    val (n1, c1) = (v1.size.toLong, v1.map(conv).sum)
    val r = Behavior.qPropTest(spark, sfDir).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
      == ((n0, c0, n1, c1)))
    val p0 = c0.toDouble / n0.toDouble
    val p1 = c1.toDouble / n1.toDouble
    val pp = (c0 + c1).toDouble / (n0 + n1).toDouble
    val z = (p0 - p1) /
      math.sqrt((pp * (1.0 - pp)) * ((1.0 / n0.toDouble) + (1.0 / n1.toDouble)))
    assert(r(0).getDouble(4) == p0 && r(0).getDouble(5) == p1)
    assert(r(0).getDouble(6) == z, "z must be the exact pinned chain")
  }

  test("q_survival matches the brute-force Kaplan-Meier life table") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    // .toSeq before flatMap: flatMapping a Map into (t, obs) pairs would
    // re-collect into a Map keyed by t and collapse same-duration users.
    val durations = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sig = rows.filter(_._3 == "signup").map(_._2.getTime)
      if (sig.isEmpty) None else {
        val t0 = sig.min
        val tp = rows.filter(r => r._3 == "purchase" && r._2.getTime >= t0)
          .map(_._2.getTime)
        val (end, obs) =
          if (tp.nonEmpty) (tp.min, 1L) else (rows.map(_._2.getTime).max, 0L)
        Some(((dayMs(new java.sql.Timestamp(end)) -
          dayMs(new java.sql.Timestamp(t0))) / 86400000L, obs))
      }
    }.toSeq
    val byT = durations.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum, g.size.toLong)).toMap
    val ts = byT.keys.toSeq.sorted
    // Suffix at-risk counts and the sequential log-survival fold, in the
    // same ascending order the window uses.
    val atRisk = ts.map(t => t -> ts.filter(_ >= t).map(byT(_)._2).sum).toMap
    var lnS = 0.0
    var hitZero = false
    val want = ts.map { t =>
      val (d, _) = byT(t); val n = atRisk(t)
      if (d == n) hitZero = true
      else lnS += java.lang.Math.log((n - d).toDouble / n.toDouble)
      // NULL from the exact-zero step on (ln S undefined there).
      (t, n, d, if (hitZero) None else Some(lnS))
    }
    val got = Behavior.qSurvival(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == want, "life table rows must match bit-for-bit")
    // Monotonicity: survival never increases while defined.
    got.map(_._4).collect { case Some(v) => v }
      .sliding(2).foreach { case Seq(a, b) => assert(b <= a); case _ => }
  }

  test("q_rolling_median matches brute-force trailing-7 medians") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => ((r.getString(0), dayMs(r.getTimestamp(1))), centsOf(r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def med(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2).toDouble
      else {
        val (lo, hi) = (s(s.length / 2 - 1), s(s.length / 2))
        lo.toDouble + (hi.toDouble - lo.toDouble) * 0.5
      }
    }
    val want = daily.keys.groupBy(_._1).flatMap { case (tpe, ks) =>
      val days = ks.map(_._2).toSeq.sorted
      days.zipWithIndex.map { case (day, i) =>
        val window = days.slice(math.max(0, i - 6), i + 1).map(d => daily((tpe, d)))
        ((tpe, day), (daily((tpe, day)), med(window)))
      }
    }
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val got = Behavior.qRollingMedian(spark, sfDir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val key = (r.getString(0), fmt.parse(r.getString(1)).getTime)
      val (cents, m) = want(key)
      assert(r.getLong(2) == cents, s"$key day_cents")
      assert(r.getDouble(3) == m, s"$key med7")
    }
  }

  test("q_calibration matches brute-force binning and the rate is coherent") {
    val ev = Tables.events(spark, sfDir)
      .select(col("value"), col("event_type")).collect()
      .map(r => (r.getDouble(0), r.getString(1) == "purchase"))
    val vmin = ev.map(_._1).min; val vmax = ev.map(_._1).max
    def bin(v: Double): Long =
      if (vmax > vmin)
        math.min(math.floor(((v - vmin) / (vmax - vmin)) * 10.0), 9.0).toLong
      else 0L
    val byBin = ev.groupBy(e => bin(e._1))
    val got = Behavior.qCalibration(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet == byBin.keySet)
    got.foreach { r =>
      val g = byBin(r.getLong(0))
      val n = g.length.toLong; val pos = g.count(_._2).toLong
      assert(r.getLong(1) == n && r.getLong(2) == pos)
      assert(r.getDouble(3) == pos.toDouble / n.toDouble)
      // exactSum contract: decimal(38,6)-backed mean, reproduced exactly.
      val dec = g.map(e => java.math.BigDecimal.valueOf(e._1)
        .setScale(6, java.math.RoundingMode.HALF_UP))
        .reduce(_ add _)
      assert(r.getDouble(4) == dec.doubleValue() / n.toDouble)
    }
  }

  test("q_attribution matches brute-force U-shaped credit assignment") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val credit = scala.collection.mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((0L, 0L))
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // Split into journeys, each terminated by a purchase; drop the
      // trailing unconverted touches.
      var journey = List.empty[String]
      ordered.foreach { r =>
        if (r._4 == "purchase") {
          val n = journey.length
          journey.reverse.zipWithIndex.foreach { case (t, i) =>
            val c =
              if (n == 1) 1000000L
              else if (n == 2) 500000L
              else if (i == 0 || i == n - 1) 400000L
              else 200000L / (n - 2)
            val (cnt, sum) = credit(t); credit(t) = (cnt + 1, sum + c)
          }
          journey = Nil
        } else journey ::= r._4
      }
    }
    val got = Behavior.qAttribution(spark, sfDir).collect()
    assert(got.nonEmpty)
    assert(got.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      == credit.toMap)
    // Sanity: purchases never self-credit.
    assert(!got.exists(_.getString(0) == "purchase"))
  }

  test("q_cohort_matrix equals the brute-force weekly retention triangle") {
    val uw = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
      .select(col("user_id"), unix_micros(col("wk")).as("us"),
        graft.Tables.tsSeconds(col("wk")).as("wk_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val cohortOf = uw.groupBy(_._1).view.mapValues(_.minBy(_._2)).toMap
    val cells = uw.groupBy { case (u, us, _) =>
      (cohortOf(u)._3, (us - cohortOf(u)._2) / (7L * 86400L * 1000000L))
    }.view.mapValues(_.length.toLong).toMap
    val sizes = cells.collect { case ((c, 0L), n) => c -> n }.toMap
    val got = Behavior.qCohortMatrix(spark, sfDir).collect()
    assert(got.length == cells.size && got.nonEmpty)
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(cells.contains(key), s"unexpected cell $key")
      assert(r.getLong(2) == cells(key), s"$key n_active")
      assert(r.getLong(3) == sizes(key._1), s"$key n_cohort")
      assert(r.getDouble(4) ==
        cells(key).toDouble / sizes(key._1).toDouble)
    }
    assert(got.exists(_.getDouble(4) < 1.0),
      "the purchase matrix must show real decay")
    assert(got.map(_.getLong(1)).distinct.length > 1,
      "and more than one week offset")
  }

  test("q_k_anonymity equals the brute-force equivalence-class audit") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0),
        (r.getString(1), r.getInt(2), math.floor(r.getDouble(3) / 2500.0).toLong)))
      .toMap
    val prio = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byClass = prio.groupBy { case (ck, _) => cust(ck) }.view.mapValues { os =>
      (os.map(_._1).distinct.length.toLong, os.map(_._2).distinct.length.toLong)
    }.toMap
    val atRisk = byClass.values.filter(_._1 < Behavior.AnonK).map(_._1).sum
    val total = byClass.values.map(_._1).sum
    val got = Behavior.qKAnonymity(spark, sfDir).collect()
    assert(got.length == byClass.size && got.nonEmpty)
    got.foreach { r =>
      val key = (r.getString(0), r.getInt(1), r.getLong(2))
      val (k, l) = byClass(key)
      assert(r.getLong(3) == k && r.getLong(4) == l, s"$key")
      assert(r.getBoolean(5) == (k >= Behavior.AnonK))
      assert(r.getDouble(6) == atRisk.toDouble / total.toDouble)
    }
    assert(got.exists(!_.getBoolean(5)),
      "the banded QI must expose at-risk classes")
  }

  test("q_window_funnel equals the brute-force greedy windowed chain") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val w = Behavior.FunnelWindowUs
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      var t1 = -1L; var t2 = -1L; var t3 = -1L
      rs.sortBy(r => (r._2, r._3)).foreach { case (_, us, _, et) =>
        if (t1 < 0 && et == "view") t1 = us
        else if (t2 < 0 && t1 >= 0 && et == "click" && us > t1 && us <= t1 + w)
          t2 = us
        else if (t3 < 0 && t2 >= 0 && et == "purchase" && us > t2 && us <= t1 + w)
          t3 = us
      }
      if (t3 >= 0) 3L else if (t2 >= 0) 2L else if (t1 >= 0) 1L else 0L
    }.toMap
    val hist = want.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Behavior.qWindowFunnel(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == hist && got.nonEmpty)
    assert(got.keys.exists(_ >= 2L) && got.values.sum == want.size.toLong,
      "the window must admit real multi-step chains and cover every user")
    assert(got.contains(3L) && (got.contains(1L) || got.contains(2L)),
      "the time bound must separate full conversions from stalled chains")
  }

  test("q_cuped equals the brute-force covariate adjustment and reduces nothing vacuously") {
    val pu = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), dayofmonth(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
      .groupBy(_._1).toSeq.map { case (u, rs) =>
        (u % 2, rs.filter(_._2 <= 15).map(_._3).sum,
          rs.filter(_._2 > 15).map(_._3).sum)
      }
    val n = pu.length.toLong
    val (sx, sy) = (pu.map(_._2).sum, pu.map(_._3).sum)
    val sxy = pu.map(r => r._2 * r._3).sum
    val sxx = pu.map(r => r._2 * r._2).sum
    val theta = (sxy.toDouble - sx.toDouble * sy.toDouble / n.toDouble) /
      (sxx.toDouble - sx.toDouble * sx.toDouble / n.toDouble)
    val xbar = sx.toDouble / n.toDouble
    val got = Behavior.qCuped(spark, sfDir).collect()
    assert(got.length == 2)
    got.foreach { r =>
      val vs = pu.filter(_._1 == r.getLong(0))
      val meanY = vs.map(_._3).sum.toDouble / vs.length.toDouble
      val meanX = vs.map(_._2).sum.toDouble / vs.length.toDouble
      assert(r.getLong(1) == vs.length.toLong)
      assert(r.getDouble(2) == meanY)
      assert(r.getDouble(3) == meanY - theta * (meanX - xbar))
      assert(r.getDouble(4) == theta)
    }
    assert(theta != 0.0, "pre-period spend must carry signal")
    assert(got.map(_.getDouble(3)).distinct.length == 2)
  }

  test("q_mde equals the closed-form minimum detectable effect") {
    val conv = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .groupBy(_.getLong(0)).toSeq.map { case (u, rs) =>
        (u % 2, rs.exists(r => r.getString(1) == "purchase" &&
          !r.isNullAt(2) && r.getDouble(2) >= 150.0))
      }
    val n0 = conv.count(_._1 == 0L).toLong
    val n1 = conv.count(_._1 == 1L).toLong
    val cAll = conv.count(_._2).toLong
    val p = cAll.toDouble / (n0 + n1).toDouble
    val mde = (Behavior.ZAlpha + Behavior.ZPower) *
      math.sqrt((p * (1.0 - p)) * ((1.0 / n0.toDouble) + (1.0 / n1.toDouble)))
    val got = Behavior.qMde(spark, sfDir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == n0 && r.getLong(1) == n1 && r.getLong(2) == cAll)
    assert(r.getDouble(3) == p && r.getDouble(4) == mde)
    assert(mde > 0.0 && mde < 1.0, "the effect bound must be a real rate")
  }

  test("q_bitmap_rollup popcounts equal the brute-force distinct user counts") {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), dayMs(r.getTimestamp(1)) / 86400000L))
      .distinct
    val days = ud.map(_._2).distinct.sorted
    val wantDau = days.map(d => d -> ud.count(_._2 == d).toLong).toMap
    val wantWau = days.map(d =>
      d -> ud.filter(p => p._2 >= d - 6 && p._2 <= d).map(_._1).distinct.length.toLong).toMap

    val got = Behavior.qBitmapRollup(spark, sfDir).collect()
    assert(got.length == days.length, "one row per observed day")
    got.foreach { r =>
      val d = java.time.LocalDate.parse(r.getString(0).take(10)).toEpochDay
      assert(r.getLong(1) == wantDau(d), s"dau at day $d")
      assert(r.getLong(2) == wantWau(d), s"wau7 at day $d")
    }
    // The bitmap path must agree with the explode-path q_wau on shared days.
    val wau = operators.Analytics.qWau(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    got.foreach(r => assert(wau(r.getString(0)) == r.getLong(2),
      "bitmap wau7 must equal q_wau's distinct-count wau"))
  }

  test("q_dp_counts noise is bounded, deterministic, and centered on the true cell counts") {
    val want = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), dayMs(r.getTimestamp(1)) / 86400000L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Behavior.qDpCounts(spark, sfDir).collect()
    assert(got.length == want.size, "one row per (type, day) cell")
    // Laplace(b=1) noise from a 60-bit uniform: |noise| = |ln(1-2|u-1/2|)|
    // <= ln(2^60) = 60*ln2 ~ 41.6. Every released count sits inside that
    // bound around its true cell count, and at least one cell is actually
    // perturbed (the mechanism is not the identity).
    var moved = 0
    got.foreach { r =>
      val d = java.time.LocalDate.parse(r.getString(1).take(10)).toEpochDay
      val n = want((r.getString(0), d)).toDouble
      val noise = r.getDouble(2) - n
      assert(math.abs(noise) <= 60.0 * math.log(2.0) + 1e-9,
        s"noise bound at (${r.getString(0)}, $d)")
      if (noise != 0.0) moved += 1
    }
    assert(moved > got.length / 2, "most cells must carry non-zero noise")
    // Derandomized mechanism: a second run releases identical doubles.
    val again = Behavior.qDpCounts(spark, sfDir).collect()
    assert(got.map(_.getDouble(2)).toSeq == again.map(_.getDouble(2)).toSeq)
  }

  test("q_sprt replays the sequential LLR walk and first-crossing decision") {
    val la = math.log(Behavior.SprtP1 / Behavior.SprtP0)
    val lb = math.log((1.0 - Behavior.SprtP1) / (1.0 - Behavior.SprtP0))
    val up = math.log(0.8 / 0.05)
    val dn = math.log(0.2 / 0.95)
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")), col("event_id"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (!r.isNullAt(3) && r.getDouble(3) >= 150.0) 1L else 0L))
    val got = Behavior.qSprt(spark, sfDir).collect()
    val types = rows.map(_._1).distinct.sorted
    assert(got.length == types.length)
    got.zip(types).foreach { case (r, t) =>
      val seq = rows.filter(_._1 == t).sortBy(x => (x._2, x._3)).map(_._4)
      var k = 0L
      var decided: Option[(Int, String, Double)] = None
      var lastLlr = 0.0
      seq.zipWithIndex.foreach { case (x, i) =>
        k += x
        val n = i + 1
        val llr = (k.toDouble * la) + ((n - k).toDouble * lb)
        lastLlr = llr
        if (decided.isEmpty) {
          if (llr >= up) decided = Some((n, "accept_h1", llr))
          else if (llr <= dn) decided = Some((n, "accept_h0", llr))
        }
      }
      assert(r.getString(0) == t)
      assert(r.getInt(1) == seq.length, s"n_obs for $t")
      decided match {
        case Some((n, dir, llr)) =>
          assert(r.getInt(2) == n, s"decision_n for $t")
          assert(r.getString(3) == dir, s"decision for $t")
          // math.log may differ from LnLibm by 1 ulp on rare inputs; the
          // walk itself is integer-driven, so compare to 1e-9
          assert(math.abs(r.getDouble(4) - llr) < 1e-9, s"llr for $t")
        case None =>
          assert(r.isNullAt(2) && r.getString(3) == "continue")
          assert(math.abs(r.getDouble(4) - lastLlr) < 1e-9)
      }
    }
    // at least one type must reach a decision (both decisions occur at
    // sf0.01; the sparse sf0.001 spec fixture still decides h0 early)
    val ds = got.map(_.getString(3)).toSet
    assert(ds.contains("accept_h0") || ds.contains("accept_h1"),
      s"degenerate SPRT outcome set $ds")
  }

  test("q_ucb_replay replays the UCB1 walk day by day") {
    val rows = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("us"), col("event_type"),
        col("value")).collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getString(1),
        if (r.getDouble(2) >= 150.0) 1L else 0L))
    val daily = rows.groupBy(r => (r._1, r._2)).map { case ((dy, a), es) =>
      (dy, a) -> ((es.length.toLong, es.map(_._3).sum))
    }
    val days = rows.map(_._1).distinct.sorted
    val arms = rows.map(_._2).distinct.sorted
    val pulls = scala.collection.mutable.Map(
      arms.map(_ -> (0L, 0L)): _*) // arm -> (n_i, s_i) prior history
    var cumRegret = 0L
    val got = graft.operators.Behavior.qUcbReplay(spark, sfDir).collect()
    assert(got.length == days.length)
    var nonForced = 0
    got.zip(days).foreach { case (r, dy) =>
      val nPrev = pulls.values.map(_._1).sum
      val unexplored = arms.filter(a => pulls(a)._1 == 0L)
      val (chosen, forced, ucb) =
        if (unexplored.nonEmpty) (unexplored.head, true, None)
        else {
          val scoredArms = arms.map { a =>
            val (n, s) = pulls(a)
            a -> (s.toDouble / n.toDouble +
              math.sqrt((2.0 * math.log(nPrev.toDouble)) / n.toDouble))
          }
          val top = scoredArms.minBy { case (a, u) => (-u, a) }
          (top._1, false, Some(top._2))
        }
      val dayStats = arms.map(a => a -> daily.getOrElse((dy, a), (0L, 0L)))
      val best = dayStats.minBy { case (a, (_, s)) => (-s, a) }
      val chosenSucc = dayStats.toMap.apply(chosen)._2
      cumRegret += best._2._2 - chosenSucc
      assert(r.getLong(0) == dy)
      assert(r.getString(1) == chosen, s"day $dy chosen")
      assert(r.getBoolean(2) == forced, s"day $dy forced")
      ucb match {
        case Some(u) => assert(r.getDouble(3) == u, s"day $dy ucb")
        case None    => assert(r.isNullAt(3), s"day $dy ucb null")
      }
      assert(r.getString(4) == best._1, s"day $dy best")
      assert(r.getLong(5) == chosenSucc && r.getLong(6) == best._2._2)
      assert(r.getLong(7) == best._2._2 - chosenSucc)
      assert(r.getLong(8) == cumRegret, s"day $dy cum_regret")
      if (!forced) nonForced += 1
      // every arm updates from the LOGGED day, not just the pull —
      // this is replay over logged feedback, all arms observed daily
      dayStats.foreach { case (a, (t, s)) =>
        val (n0, s0) = pulls(a); pulls(a) = (n0 + t, s0 + s)
      }
    }
    // after |arms| bootstrap days the policy must actually score
    assert(nonForced > 0, "UCB never left forced exploration")
    assert(arms.length >= 2, "bandit needs at least two arms")
  }
}
