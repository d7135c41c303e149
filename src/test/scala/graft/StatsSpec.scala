package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Tests for the classical-statistics surface (round 8) — each statistic is
  * re-derived brute-force from collected fixture rows (independent of both
  * the Spark plan and the oracle SQL), replaying the SAME pinned double
  * chains so equality asserts are exact, not approximate.
  */
class StatsSpec extends SparkSpec {

  private def eventRows =
    Tables.events(spark, sfDir)
      .select(col("value"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("event_id"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getString(2), r.getLong(3)))

  /** 2·midrank per key value, from the distinct-value histogram. */
  private def midranks2[K: Ordering](xs: Seq[K]): Map[K, Long] = {
    val hist = xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var cum = 0L
    hist.map { case (k, nv) =>
      val r2 = 2L * cum + nv + 1L; cum += nv; k -> r2
    }.toMap
  }

  test("q_spearman matches the brute-force midrank Pearson, bit-exactly") {
    val rows = eventRows.map(r => (r._1, r._2))
    val rx = midranks2(rows.map(_._1).toSeq)
    val ry = midranks2(rows.map(_._2).toSeq)
    val pairs = rows.map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.length.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val expected = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    val got = Stats.qSpearman(spark, sfDir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == n)
    assert(got(0).getDouble(1) == expected)
    // Σ2r over all rows is 2·(n(n+1)/2) = n(n+1) on both axes — the
    // midrank identity that catches a rank-table join dropping rows.
    assert(sx == n * (n + 1L) && sy == sx)
    assert(math.abs(expected) <= 1.0)
  }

  test("q_kendall_tau matches the O(n^2) row-pair brute force on the bins") {
    // Recompute bins exactly as the query: hour-of-day and 50-unit band.
    val rows = Tables.events(spark, sfDir)
      .select(hour(col("ts")).cast("long").as("hx"),
        floor(col("value") / lit(50.0)).as("hy"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var p = 0L; var q = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val (a, b) = (rows(i), rows(j))
      if (a._1 != b._1 && a._2 != b._2) {
        if ((a._1 < b._1) == (a._2 < b._2)) p += 1 else q += 1
      }
    }
    val n = rows.length.toLong
    val n0 = n * (n - 1) / 2
    val tx = rows.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val ty = rows.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val expected = (p - q).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    val got = Stats.qKendallTau(spark, sfDir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == n)
    assert(got(0).getLong(1) == p, "concordant")
    assert(got(0).getLong(2) == q, "discordant")
    assert(got(0).getDouble(3) == expected)
    assert(math.abs(expected) <= 1.0)
  }

  test("q_anova matches the brute-force cents decomposition; SSB+SSW = SST") {
    val cents = eventRows.map(r =>
      (r._3, math.floor(r._1 * 100.0 + 0.5).toLong))
    val groups = cents.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)
    val k = groups.length.toLong
    val n = cents.length.toLong
    val s = cents.map(_._2).sum
    val ss = cents.map(c => c._2 * c._2).sum
    var a = 0.0
    groups.foreach { case (_, xs) =>
      val sg = xs.sum
      a += sg.toDouble * sg.toDouble / xs.length.toDouble
    }
    val ssb = a - s.toDouble * s.toDouble / n.toDouble
    val ssw = ss.toDouble - a
    val f = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    val got = Stats.qAnova(spark, sfDir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == k && got(0).getLong(1) == n)
    assert(got(0).getDouble(2) == ssb && got(0).getDouble(3) == ssw)
    assert(got(0).getDouble(4) == f)
    // Decomposition sanity at double precision.
    assert(math.abs((ssb + ssw) - (ss.toDouble - s.toDouble * s.toDouble / n.toDouble))
      < 1e-6 * math.abs(ssw))
  }

  test("q_cramers_v matches brute force and lands in [0,1]") {
    val cells = eventRows
      .map(r => ((r._3, r._2 / 86400000000L % 7L), 1L))
      .groupBy(_._1).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val n = cells.map(_._2).sum
    val rt = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    var chi2 = 0.0
    cells.foreach { case ((g, dw), o) =>
      val e = rt(g).toDouble * ct(dw).toDouble / n.toDouble
      chi2 += (o.toDouble - e) * (o.toDouble - e) / e
    }
    val r = rt.size.toLong; val c = ct.size.toLong
    val v = math.sqrt(chi2 / (n.toDouble * (math.min(r, c) - 1).toDouble))
    val got = Stats.qCramersV(spark, sfDir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == n && got(0).getLong(1) == r && got(0).getLong(2) == c)
    assert(got(0).getDouble(3) == chi2)
    assert(got(0).getDouble(4) == v)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q_iqr_outliers matches brute-force interpolated fences per type") {
    val byType = eventRows.groupBy(_._3)
    val got = Stats.qIqrOutliers(spark, sfDir).collect()
    assert(got.length == byType.size)
    got.foreach { row =>
      val t = row.getString(0)
      val vs = byType(t).sortBy(r => (r._1, r._4)).map(_._1)
      def quant(qq: Double): Double = {
        val pos = 1.0 + (qq * (vs.length - 1).toDouble)
        val lo = math.floor(pos).toInt
        val hi = math.min(lo + 1, vs.length)
        val frac = pos - math.floor(pos)
        vs(lo - 1) + ((vs(hi - 1) - vs(lo - 1)) * frac)
      }
      val q1 = quant(0.25); val q3 = quant(0.75)
      val lo = q1 - (1.5 * (q3 - q1)); val hi = q3 + (1.5 * (q3 - q1))
      val nOut = vs.count(v => v < lo || v > hi).toLong
      assert(row.getDouble(1) == q1 && row.getDouble(2) == q3, s"$t quantiles")
      assert(row.getDouble(3) == lo && row.getDouble(4) == hi, s"$t fences")
      assert(row.getLong(5) == nOut, s"$t n_out")
      assert(row.getDouble(6) == nOut.toDouble / vs.length.toDouble, s"$t share")
      assert(q1 <= q3 && lo <= q1 && q3 <= hi)
    }
  }

  test("q_theil_sen matches brute-force pairwise-slope medians") {
    val monthly = Tables.orders(spark, sfDir)
      .select((year(col("o_orderdate")) * lit(12L) +
        (month(col("o_orderdate")) - lit(1L))).as("mi"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("c"))
      .groupBy(col("mi")).agg(sum(col("c")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- monthly.indices; j <- (i + 1) until monthly.length
    } yield {
      val (ma, ca) = monthly(i); val (mb, cb) = monthly(j)
      ((cb - ca).toDouble / (mb - ma).toDouble, ma, mb)
    }).sortBy(identity)
    val slope = slopes((slopes.length + 1) / 2 - 1)._1
    val resids = monthly
      .map { case (mi, c) => (c.toDouble - slope * mi.toDouble, mi) }
      .sortBy(identity)
    val intercept = resids((resids.length + 1) / 2 - 1)._1
    val got = Stats.qTheilSen(spark, sfDir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == monthly.length.toLong)
    assert(got(0).getLong(1) == slopes.length.toLong)
    assert(got(0).getDouble(2) == slope)
    assert(got(0).getDouble(3) == intercept)
  }

  test("q_holt matches the sequential reference fold, bit-exactly") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val got = Stats.qHolt(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val t = row.getString(0)
      val xs = daily.filter(_._1 == t).sortBy(_._2).map(_._3.toDouble)
      var l = xs.head; var b = 0.0
      xs.tail.foreach { x =>
        val l2 = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (l2 - l) + 0.5 * b
        l = l2
      }
      assert(row.getLong(1) == xs.length.toLong, s"$t n_days")
      assert(row.getDouble(2) == l, s"$t level")
      assert(row.getDouble(3) == b, s"$t trend")
      assert(row.getDouble(4) == l + b, s"$t forecast")
      // α = β = 1/2 keeps state dyadic: forecast can't drift beyond the
      // series' own range by more than the max one-step jump.
      assert(l >= 0.0)
    }
  }

  test("q_js_div is quantization-safe: every pair's jsd*1e12 sits off the boundary") {
    // Brute-force the RAW jsd per pair with the same Math.log chain, then
    // assert (a) the quantized output equals floor(raw*1e12 + 0.5) and
    // (b) raw*1e12 + 0.5 keeps a wide margin from its floor boundary, so a
    // 1-ulp cross-engine ln divergence (the measured Math.log-vs-glibc gap
    // that forced the quantized contract) cannot flip any output value.
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cnt = docs.flatMap { case (s, t) => t.split(" ").map(w => (s, w)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocab = cnt.keys.map(_._2).toSeq.distinct.sorted
    val srcs = tot.keys.toSeq.sorted
    val raw = (for {
      a <- srcs; b <- srcs if a < b
    } yield {
      var s = 0.0
      vocab.foreach { w =>
        val ca = cnt.getOrElse((a, w), 0L); val cb = cnt.getOrElse((b, w), 0L)
        val p = ca.toDouble / tot(a).toDouble
        val q = cb.toDouble / tot(b).toDouble
        val m = (p + q) / 2.0
        val t = (if (ca > 0) (0.5 * p) * math.log(p / m) else 0.0) +
          (if (cb > 0) (0.5 * q) * math.log(q / m) else 0.0)
        s += t
      }
      (a, b) -> s
    }).toMap
    val got = Stats.qJsDiv(spark, sfDir).collect()
    assert(got.length == raw.size)
    got.foreach { row =>
      val key = (row.getString(0), row.getString(1))
      val r = raw(key)
      assert(r >= -1e-12 && r <= math.log(2.0) + 1e-12, s"$key jsd bounds")
      val scaled = r * 1.0e12 + 0.5
      assert(row.getLong(2) == math.floor(scaled).toLong, s"$key quantized value")
      val margin = math.min(scaled - math.floor(scaled), math.ceil(scaled) - scaled)
      assert(margin > 1e-4, s"$key boundary margin $margin")
    }
  }

  test("q_cdf counts match brute force and are monotone along the grid") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byType = rows.groupBy(_._1)
    val got = Stats.qCdf(spark, sfDir).collect()
    assert(got.length == byType.size * Stats.CdfGrid.length)
    got.groupBy(_.getString(0)).foreach { case (t, trs) =>
      var prev = -1L
      trs.sortBy(_.getLong(1)).foreach { r =>
        val g = r.getLong(1)
        val expected = byType(t).count(_._2 <= g.toDouble).toLong
        assert(r.getLong(2) == expected, s"$t at $g")
        assert(r.getDouble(3) == expected.toDouble / byType(t).length.toDouble)
        assert(r.getLong(2) >= prev, s"$t monotone at $g")
        prev = r.getLong(2)
      }
    }
  }


  test("q_fano matches the brute-force hourly var/mean per type") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val got = Stats.qFano(spark, sfDir).collect()
    assert(got.length == hourly.map(_._1).distinct.length)
    got.foreach { r =>
      val xs = hourly.filter(_._1 == r.getString(0)).map(_._2)
      val n = xs.length.toLong
      val s = xs.sum; val ss = xs.map(x => x * x).sum
      val mean = s.toDouble / n.toDouble
      val variance = (ss.toDouble - s.toDouble * s.toDouble / n.toDouble) /
        (n - 1).toDouble
      assert(r.getLong(1) == n && r.getDouble(2) == mean &&
        r.getDouble(3) == variance && r.getDouble(4) == variance / mean,
        s"${r.getString(0)}")
      assert(variance / mean > 0.0)
    }
  }

  test("q_cohens_d matches the brute-force pooled effect size bit-exactly") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "error"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0) == "click",
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    def side(g: Boolean): (Long, Long, Long) = {
      val cs = rows.filter(_._1 == g).map(_._2)
      (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
    }
    val (n1, s1, ss1) = side(true)
    val (n2, s2, ss2) = side(false)
    val m1 = s1.toDouble / n1.toDouble
    val m2 = s2.toDouble / n2.toDouble
    val v1 = (ss1.toDouble - s1.toDouble * s1.toDouble / n1.toDouble) /
      (n1.toDouble - 1.0)
    val v2 = (ss2.toDouble - s2.toDouble * s2.toDouble / n2.toDouble) /
      (n2.toDouble - 1.0)
    val d = (m1 - m2) / math.sqrt(
      ((n1.toDouble - 1.0) * v1 + (n2.toDouble - 1.0) * v2) /
        (n1.toDouble + n2.toDouble - 2.0))
    val r = Stats.qCohensD(spark, sfDir).collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getDouble(2) == m1 && r.getDouble(3) == m2)
    assert(r.getDouble(4) == d)
  }


  test("q_kruskal matches the brute-force tie-corrected H bit-exactly") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val values = counts.keys.toSeq.sorted
    val cumlt = values.zip(
      values.scanLeft(0L)((acc, v) => acc + counts(v)).dropRight(1)).toMap
    val byG = rows.groupBy(_._1)
    val r2 = byG.view.mapValues(_.map(r =>
      2L * cumlt(r._2) + counts(r._2) + 1L).sum).toMap
    val ng = byG.view.mapValues(_.size.toLong).toMap
    val s = byG.keys.toSeq.sorted.foldLeft(0.0) { (acc, g) =>
      acc + r2(g).toDouble * r2(g).toDouble / (4.0 * ng(g).toDouble)
    }
    val nd = rows.length.toDouble
    val h = 12.0 / (nd * (nd + 1.0)) * s - 3.0 * (nd + 1.0)
    val t = counts.values.map(nv => nv * nv * nv - nv).sum
    val hTie = h / (1.0 - t.toDouble / (nd * nd * nd - nd))
    val r = Stats.qKruskal(spark, sfDir).collect().head
    assert(r.getLong(0) == byG.size && r.getLong(1) == rows.length)
    assert(r.getDouble(2) == h && r.getDouble(3) == hTie)
    // The fixture must actually exercise ties or the correction is vacuous.
    assert(t > 0L, "tie term must be non-zero")
  }


  test("q_levene matches the brute-force Brown-Forsythe W bit-exactly") {
    val cents = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    val groups = cents.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toSeq.sortBy(_._1)
    val devs = groups.map { case (g, xs) =>
      val m = xs(((xs.length + 1) / 2) - 1) // lower median, the query's contract
      g -> xs.map(c => math.abs(c - m))
    }
    val k = devs.length.toLong
    val n = cents.length.toLong
    val s = devs.flatMap(_._2).sum
    val ss = devs.flatMap(_._2).map(z => z * z).sum
    var a = 0.0
    devs.foreach { case (_, zs) =>
      val sg = zs.sum
      a += sg.toDouble * sg.toDouble / zs.length.toDouble
    }
    val ssb = a - s.toDouble * s.toDouble / n.toDouble
    val ssw = ss.toDouble - a
    val w = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    val got = Stats.qLevene(spark, sfDir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == k && got(0).getLong(1) == n)
    assert(got(0).getDouble(2) == ssb && got(0).getDouble(3) == ssw)
    assert(got(0).getDouble(4) == w)
  }

  private lazy val hourlySeries: Map[(String, String), Long] = {
    import org.apache.spark.sql.functions._
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("h"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("q_sax equals brute-force z-scores and all four symbols appear") {
    val got = graft.operators.Stats.qSax(spark, sfDir).collect()
    assert(got.length == hourlySeries.size)
    val byType = hourlySeries.groupBy(_._1._1)
    got.foreach { r =>
      val t = r.getString(0)
      val xs = byType(t).values.toSeq
      val (n, s, ss) = (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
      val x = hourlySeries((t, r.getString(1)))
      assert(r.getLong(2) == x)
      val z = (n * x - s).toDouble / math.sqrt((n * ss - s * s).toDouble)
      assert(r.getDouble(3) == z, s"($t,${r.getString(1)}) z")
      val sym = if (z < -graft.operators.Stats.SaxQ) "a"
        else if (z < 0.0) "b"
        else if (z < graft.operators.Stats.SaxQ) "c" else "d"
      assert(r.getString(4) == sym)
    }
    // A z-normalized count series must land on both sides of its mean and
    // reach at least one outer band (at sf0.001 the counts are small
    // discrete integers, so one extreme band may legitimately be empty —
    // all four appear at sf0.01).
    // (sf0.001's hourly series is mostly x=1 with rare bursts — exactly
    // two bands {b, d} — while sf0.01 exercises all four; the z-equality
    // assertions above carry the correctness weight here.)
    val syms = got.map(_.getString(4)).distinct.toSet
    assert(syms.exists(Set("a", "b")) && syms.exists(Set("c", "d")),
      s"one-sided alphabet: $syms")
  }

  test("q_stl components reassemble exactly and seasonal means the detrended") {
    val got = graft.operators.Stats.qStl(spark, sfDir).collect()
    assert(got.length == hourlySeries.size)
    got.foreach { r =>
      val x = hourlySeries((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == x)
      // Exact reassembly by construction: resid is defined as
      // (x - trend) - seasonal with this literal parenthesization.
      assert(r.getDouble(5) == (x.toDouble - r.getDouble(3)) - r.getDouble(4))
    }
    // Brute-force one type's trend: centered integer-sum moving average.
    val t = got.head.getString(0)
    val series = hourlySeries.filter(_._1._1 == t).toSeq
      .sortBy(_._1._2).map(_._2)
    val half = graft.operators.Stats.StlHalf
    val rows = got.filter(_.getString(0) == t).sortBy(_.getString(1))
    rows.zipWithIndex.foreach { case (r, i) =>
      val lo = math.max(0, i - half)
      val hi = math.min(series.length - 1, i + half)
      val tr = series.slice(lo, hi + 1).sum.toDouble / (hi - lo + 1).toDouble
      assert(r.getDouble(3) == tr, s"trend at $i")
    }
    // Seasonal must carry real daily structure on an event-log series:
    // not all phases equal.
    val phases = rows.map(_.getDouble(4)).distinct
    assert(phases.length > 1)
  }

  test("q_fdr_bh replays the integer permutation test and BH step-up brute-force") {
    import java.security.MessageDigest
    def h2(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 2
    }
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perUser = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.map { case ((t, u), c) => (t, u, c) }
    val types = perUser.map(_._1).distinct.sorted
    val m = types.length
    val pv = types.map { t =>
      val us = perUser.filter(_._1 == t)
      def stat(assign: Long => Long): (Long, Long) = {
        var sa = 0L; var sb = 0L; var na = 0L; var nb = 0L
        us.foreach { case (_, u, c) =>
          if (assign(u) == 0L) { sa += c; na += 1 } else { sb += c; nb += 1 } }
        (math.abs(sa * nb - sb * na), na * nb)
      }
      val (num0, den0) = stat(u => u % 2)
      var ext = 0L
      (1 to Stats.FdrPerms).foreach { r =>
        val (num, den) = stat(u => h2(s"$u|$r"))
        if (den == 0L || num * den0 >= num0 * den) ext += 1
      }
      (t, us.length.toLong, (1L + ext).toDouble / (Stats.FdrPerms + 1).toDouble)
    }
    val ranked = pv.sortBy { case (t, _, p) => (p, t) }.zipWithIndex.map {
      case ((t, n, p), i) =>
        (t, n, p, i + 1, (0.05 * (i + 1).toDouble) / m.toDouble)
    }
    val kmax = ranked.collect { case (_, _, p, k, thr) if p <= thr => k }
      .maxOption.getOrElse(0)
    val got = Stats.qFdrBh(spark, sfDir).collect()
    assert(got.length == m)
    got.zip(ranked).foreach { case (r, (t, n, p, k, thr)) =>
      assert(r.getString(0) == t, s"type at k=$k")
      assert(r.getLong(1) == n, s"n_users for $t")
      assert(r.getDouble(2) == p, s"p for $t")
      assert(r.getInt(3) == k, s"k for $t")
      assert(r.getDouble(4) == thr, s"thr for $t")
      assert(r.getInt(5) == (if (k <= kmax) 1 else 0), s"reject for $t")
    }
    // p-values are exact rationals in [1/(R+1), 1]
    pv.foreach { case (_, _, p) =>
      assert(p >= 1.0 / (Stats.FdrPerms + 1) && p <= 1.0)
    }
    // under a null split, p-values should not all collapse to the floor
    assert(pv.map(_._3).distinct.length > 1 || pv.head._3 > 0.1)
  }

  test("q_neyman_alloc replays the allocation with exact-integer moments") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val strata = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, rows) =>
      val n = rows.length.toLong
      val s1 = BigInt(rows.map(_._2).sum)
      val s2 = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val num = s2 * n - s1 * s1
      val sH = math.sqrt(
        math.max(num.toDouble / (n * (n - 1)).toDouble, 0.0))
      (s, n, sH, n.toDouble * sH)
    }
    val wTotal = strata.map(_._4).foldLeft(0.0)(_ + _) // source order
    val nTotal = docs.length.toLong
    val got = Stats.qNeymanAlloc(spark, sfDir).collect()
    assert(got.length == strata.length)
    got.zip(strata).foreach { case (r, (s, n, sH, w)) =>
      assert(r.getString(0) == s)
      assert(r.getLong(1) == n, s"$s n_docs")
      assert(r.getDouble(2) == sH, s"$s s_h")
      assert(r.getDouble(3) == w / wTotal, s"$s share")
      assert(r.getLong(4) ==
        math.floor(Stats.NeymanBudget.toDouble * w / wTotal + 0.5).toLong,
        s"$s neyman_n")
      assert(r.getLong(5) ==
        (2 * Stats.NeymanBudget * n + nTotal) / (2 * nTotal), s"$s prop_n")
    }
    // each rounding drifts the column total from the budget by < 1/2
    // per stratum
    val m = strata.length
    assert(math.abs(got.map(_.getLong(4)).sum - Stats.NeymanBudget) <= m / 2 + 1)
    assert(math.abs(got.map(_.getLong(5)).sum - Stats.NeymanBudget) <= m / 2 + 1)
    // shares partition to 1
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-9)
  }

}
