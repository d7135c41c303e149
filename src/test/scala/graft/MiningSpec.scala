package graft

import graft.operators.Mining
import org.apache.spark.sql.functions._

/** Tests for the pattern-mining/statistics surface — each statistic is
  * re-derived brute-force from collected fixture rows (independent of both
  * the Spark plan and the oracle SQL).
  */
class MiningSpec extends SparkSpec {

  test("q_assoc matches brute-force rule mining and lift is symmetric") {
    val items = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val users = items.map(_._1)
    val byType = items.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val got = Mining.qAssoc(spark, sfDir).collect()
    assert(got.nonEmpty)
    val gotMap = got.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val nab = (byType(a) intersect byType(b)).size.toLong
      assert(r.getLong(2) == nab, s"$a->$b n_ab")
      assert(r.getLong(3) == byType(a).size.toLong)
      assert(r.getLong(4) == byType(b).size.toLong)
      assert(r.getDouble(5) == nab.toDouble / users.size.toDouble, "support")
      assert(r.getDouble(6) == nab.toDouble / byType(a).size.toDouble, "confidence")
      // lift(a→b) == lift(b→a): the statistic is symmetric even though
      // confidence is directional.
      assert(r.getDouble(7) == gotMap((b, a)).getDouble(7), s"lift symmetry $a/$b")
    }
  }

  test("q_autocorr matches the brute-force lagged Pearson r") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
      .sortBy(_._1).toSeq
    val byH = hourly.toMap
    val pairs = hourly.flatMap { case (h, x) =>
      byH.get(h + 3600000L).map(y => (x, y)) }
    val n = pairs.length.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val expected = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
    val got = Mining.qAutocorr(spark, sfDir).collect().head
    assert(got.getLong(0) == n)
    assert(got.getDouble(1) == expected)
    assert(math.abs(got.getDouble(1)) <= 1.0)
  }

  test("q_chisq matches a brute-force 2x2 chi-squared for every returned pair") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).toSet))
    val nDocs = docs.length.toLong
    val got = Mining.qChisq(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (lang, token) = (r.getString(0), r.getString(1))
      val n11 = docs.count(d => d._2 == lang && d._3(token)).toLong
      val nLang = docs.count(_._2 == lang).toLong
      val df = docs.count(_._3(token)).toLong
      val (n10, n01) = (nLang - n11, df - n11)
      val n00 = nDocs - nLang - n01
      assert(Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        Seq(n11, n10, n01, n00), s"cells for ($lang,$token)")
      val det = (n11 * n00 - n10 * n01).toDouble
      val expected = (nDocs.toDouble * (det * det)) /
        (((nLang.toDouble * (nDocs - nLang).toDouble) * df.toDouble) *
          (nDocs - df).toDouble)
      assert(r.getDouble(6) == expected, s"chi2 for ($lang,$token)")
      assert(expected >= 0.0)
    }
  }

  test("q_ewma matches the brute-force sequential recurrence per type") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val got = Mining.qEwma(spark, sfDir).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val series = hourly.filter(_._1 == r.getString(0)).sortBy(_._2).map(_._3)
      assert(r.getLong(1) == series.length.toLong)
      val expected = series.tail.foldLeft(series.head.toDouble)(
        (s, x) => 0.2 * x.toDouble + 0.8 * s)
      assert(r.getDouble(2) == expected, s"${r.getString(0)}")
    }
  }

  test("q_gini matches the brute-force sorted formula with decimal-exact sums") {
    import scala.math.BigDecimal.RoundingMode
    def dec(x: Double): BigDecimal = BigDecimal(x).setScale(6, RoundingMode.HALF_UP)
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = Mining.qGini(spark, sfDir).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val xs = rows.filter(_._1 == r.getString(0)).sortBy(t => (t._2, t._3)).map(_._2)
      val n = xs.length.toLong
      val sX = xs.map(dec).sum.toDouble
      val sRx = xs.zipWithIndex.map { case (x, i) => dec((i + 1).toDouble * x) }.sum.toDouble
      val expected = (2.0 * sRx - (n + 1).toDouble * sX) / (n.toDouble * sX)
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == expected, s"${r.getString(0)}")
      assert(expected >= 0.0 && expected < 1.0)
    }
  }

  test("q_rolling_count matches a brute-force trailing-hour scan per user") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._2)
    val got = Mining.qRollingCount(spark, sfDir).collect()
    assert(got.length == ev.length)
    got.foreach { r =>
      val (id, uid, us, cnt) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val expected = byUser(uid).count(e => e._3 >= us - 3600000000L && e._3 <= us).toLong
      assert(cnt == expected, s"event $id")
    }
    assert(got.exists(_.getLong(3) > 1), "fixture must exercise overlapping frames")
  }

  test("q_mutual_info is non-negative and matches the brute-force ordered fold") {
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = cells.values.sum
    val ct = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ch = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val expected = cells.toSeq.sortBy(_._1)
      .map { case ((t, h), c) =>
        (c.toDouble / n.toDouble) *
          math.log((c.toDouble * n.toDouble) / (ct(t).toDouble * ch(h).toDouble))
      }.foldLeft(0.0)(_ + _)
    val got = Mining.qMutualInfo(spark, sfDir).collect().head
    assert(got.getLong(0) == cells.size.toLong)
    assert(got.getDouble(1) == expected)
    // MI of a genuine joint distribution is >= 0 up to fold rounding.
    assert(got.getDouble(1) > -1e-12)
  }

  test("q_ks_test matches a brute-force CDF comparison over the md5 split") {
    import java.security.MessageDigest
    def isTrain(id: Long): Boolean = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 10 <
        graft.operators.TextOps.TrainBuckets
    }
    val rows = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (tr, te) = rows.partition(r => isTrain(r._1))
    val (na, nb) = (tr.length.toLong, te.length.toLong)
    assert(na > 0 && nb > 0, "fixture split must populate both halves")
    val ksNum = rows.map(_._2).distinct.map { x =>
      val fa = tr.count(_._2 <= x).toLong
      val fb = te.count(_._2 <= x).toLong
      math.abs(fa * nb - fb * na)
    }.max
    val got = Mining.qKsTest(spark, sfDir).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == na && got.head.getLong(1) == nb)
    assert(got.head.getLong(2) == ksNum)
    assert(got.head.getDouble(3) == ksNum.toDouble / (na * nb).toDouble)
    assert(got.head.getDouble(3) >= 0.0 && got.head.getDouble(3) <= 1.0)
  }

  test("q_psi matches the brute-force smoothed-bin fold per language") {
    val rows = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def bin(n: Long): Long = math.min(n / 64, 9L)
    val nn = rows.length.toLong
    val gb = rows.groupBy(r => bin(r._2)).view.mapValues(_.length.toLong).toMap
    val got = Mining.qPsi(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == rows.map(_._1).toSet)
    got.foreach { r =>
      val mine = rows.filter(_._1 == r.getString(0))
      val n = mine.length.toLong
      assert(r.getLong(1) == n)
      val lb = mine.groupBy(m => bin(m._2)).view.mapValues(_.length.toLong).toMap
      val expected = (0L to 9L).foldLeft(0.0) { (acc, b) =>
        val p = (lb.getOrElse(b, 0L) + 1L).toDouble / (n + 10L).toDouble
        val q = (gb.getOrElse(b, 0L) + 1L).toDouble / (nn + 10L).toDouble
        acc + (p - q) * math.log(p / q)
      }
      assert(r.getDouble(2) == expected, r.getString(0))
      // Each (p-q)·ln(p/q) term is >= 0 ((p-q) and ln(p/q) share sign),
      // so PSI is nonnegative exactly, smoothing included.
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("q_bootstrap_ci matches brute-force Poisson-weighted replicate means") {
    import java.security.MessageDigest
    import scala.math.BigDecimal.RoundingMode
    def dec(x: Double): BigDecimal = BigDecimal(x).setScale(6, RoundingMode.HALF_UP)
    def h(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % Mining.BootP
    }
    // Re-derive the LCG constants from their defining formula rather than
    // reading them off the implementation.
    def u(hv: Long, r: Int): Long =
      (((2L * r + 1) * hv + (1000003L * r + 12345L) % Mining.BootP) %
        Mining.BootP) % 1000000L
    def weight(uu: Long): Long =
      Mining.PoissonCdf.collectFirst { case (thr, k) if uu < thr => k.toLong }
        .getOrElse(5L)
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = Mining.qBootstrapCi(spark, sfDir).collect()
    assert(got.length == rows.map(_._1).distinct.length)
    got.foreach { r =>
      val mine = rows.filter(_._1 == r.getString(0))
      assert(r.getLong(1) == mine.length.toLong)
      assert(r.getDouble(2) ==
        mine.map(m => dec(m._3)).sum.toDouble / mine.length.toDouble, "point mean")
      val means = (0 until Mining.BootReplicates).map { rep =>
        val ws = mine.map(m => (weight(u(h(m._2), rep)), m._3))
        val wn = ws.map(_._1).sum
        // Fixed-point micro-unit accumulation, exactly as the query does.
        val fix = ws.map { case (w, x) => math.round(w.toDouble * x * 1000000.0) }.sum
        (fix.toDouble / 1000000.0) / wn.toDouble
      }.sorted
      assert(r.getDouble(3) == means(1), "ci_lo = 2nd order statistic")
      assert(r.getDouble(4) == means(Mining.BootReplicates - 2),
        "ci_hi = 39th order statistic")
      assert(r.getDouble(3) <= r.getDouble(4))
    }
  }

  test("q_welch matches the brute-force Welch t and Satterthwaite df") {
    import scala.math.BigDecimal.RoundingMode
    def dec(x: Double): BigDecimal = BigDecimal(x).setScale(6, RoundingMode.HALF_UP)
    def stats(t: String): (Long, Double, Double) = {
      val xs = Tables.events(spark, sfDir)
        .filter(col("event_type") === t).select(col("value")).collect()
        .map(_.getDouble(0))
      (xs.length.toLong, xs.map(dec).sum.toDouble, xs.map(x => dec(x * x)).sum.toDouble)
    }
    val (n1, sx1, sxx1) = stats("purchase")
    val (n2, sx2, sxx2) = stats("view")
    val (n1d, n2d) = (n1.toDouble, n2.toDouble)
    val (m1, m2) = (sx1 / n1d, sx2 / n2d)
    val v1 = (sxx1 - (sx1 * sx1) / n1d) / (n1d - 1.0)
    val v2 = (sxx2 - (sx2 * sx2) / n2d) / (n2d - 1.0)
    val (se1, se2) = (v1 / n1d, v2 / n2d)
    val t = (m1 - m2) / math.sqrt(se1 + se2)
    val df = ((se1 + se2) * (se1 + se2)) /
      ((se1 * se1) / (n1d - 1.0) + (se2 * se2) / (n2d - 1.0))
    val got = Mining.qWelch(spark, sfDir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getDouble(2) == m1 && r.getDouble(3) == m2)
    assert(r.getDouble(4) == t && r.getDouble(5) == df)
    // Satterthwaite df is bounded by the pooled and the smaller-side dfs.
    assert(df >= math.min(n1d, n2d) - 1.0 && df <= n1d + n2d - 2.0)
  }

  test("q_weighted_sample matches the brute-force Efraimidis-Spirakis top-3 per type") {
    import java.security.MessageDigest
    def key(id: Long, v: Double): Double = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.take(15), 16) % 1000000L
      math.log((u.toDouble + 0.5) / 1000000.0) / (v + 1.0)
    }
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = Mining.qWeightedSample(spark, sfDir).collect()
    val byType = rows.groupBy(_._1)
    assert(got.length == 3 * byType.size)
    got.foreach { r =>
      val (t, rn) = (r.getString(0), r.getInt(1))
      val expected = byType(t)
        .map(e => (e._2, e._3, key(e._2, e._3)))
        .sortBy(e => (-e._3, e._1))(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
        .apply(rn - 1)
      assert(r.getLong(2) == expected._1, s"$t rn=$rn id")
      assert(r.getDouble(3) == expected._2, s"$t rn=$rn value")
      assert(r.getDouble(4) == expected._3, s"$t rn=$rn key")
    }
  }

  test("q_linreg matches the brute-force OLS fit of the hourly count series") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L, r.getLong(2)))
    val got = Mining.qLinreg(spark, sfDir).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val pts = hourly.filter(_._1 == r.getString(0)).map(p => (p._2, p._3))
      val n = pts.length.toLong
      val st = pts.map(_._1).sum; val sc = pts.map(_._2).sum
      val stt = pts.map(p => p._1 * p._1).sum
      val stc = pts.map(p => p._1 * p._2).sum
      val scc = pts.map(p => p._2 * p._2).sum
      val detT = n * stt - st * st; val detC = n * scc - sc * sc
      val cov = n * stc - st * sc
      assert(r.getLong(1) == n)
      assert(detT > 0, "fixture has a multi-hour series per type")
      val slope = cov.toDouble / detT.toDouble
      assert(r.getDouble(2) == slope, s"${r.getString(0)} slope")
      assert(r.getDouble(3) ==
        (sc.toDouble - slope * st.toDouble) / n.toDouble, s"${r.getString(0)} intercept")
      val r2 = (cov.toDouble * cov.toDouble) / (detT.toDouble * detC.toDouble)
      assert(r.getDouble(4) == r2, s"${r.getString(0)} r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("q_moments matches the brute-force central-moment assembly") {
    import scala.math.BigDecimal.RoundingMode
    def dec(x: Double): BigDecimal = BigDecimal(x).setScale(6, RoundingMode.HALF_UP)
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = Mining.qMoments(spark, sfDir).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val vs = rows.filter(_._1 == r.getString(0)).map(_._2)
      val n = vs.length.toDouble
      val s1 = vs.map(dec).sum.toDouble
      val s2 = vs.map(v => dec(v * v)).sum.toDouble
      val s3 = vs.map(v => dec((v * v) * v)).sum.toDouble
      val s4 = vs.map(v =>
        math.floor(((v * v) * v) * v * 100.0 + 0.5).toLong).sum.toDouble / 100.0
      val mean = s1 / n
      val (r2, r3, r4) = (s2 / n, s3 / n, s4 / n)
      val variance = r2 - mean * mean
      val m3 = r3 - (3.0 * mean) * r2 + (2.0 * mean) * (mean * mean)
      val m4 = r4 - (4.0 * mean) * r3 + ((6.0 * mean) * mean) * r2 -
        ((3.0 * mean) * mean) * (mean * mean)
      assert(r.getLong(1) == vs.length.toLong)
      assert(r.getDouble(2) == mean && r.getDouble(3) == variance,
        s"${r.getString(0)} mean/var")
      assert(r.getDouble(4) == m3 / (math.sqrt(variance) * variance),
        s"${r.getString(0)} skew")
      assert(r.getDouble(5) == m4 / (variance * variance) - 3.0,
        s"${r.getString(0)} kurt")
      // a uniform-ish value distribution is platykurtic: sanity-bound
      assert(variance > 0.0 && r.getDouble(5) > -3.0)
    }
  }

  test("q_benford matches the brute-force digit audit and flags the uniform fixture") {
    val values = Tables.events(spark, sfDir)
      .select(col("value")).collect().map(_.getDouble(0))
    val digits = values
      .map(v => math.floor(v * 100.0 + 0.5).toLong.toString.charAt(0) - '0')
      .filter(_ >= 1).map(_.toLong)
    val n = digits.length.toLong
    val counts = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    def p(d: Long) = math.log(1.0 + 1.0 / d.toDouble) / math.log(10.0)
    val chi2 = counts.keys.toSeq.sorted.foldLeft(0.0) { (acc, d) =>
      val nd = counts(d).toDouble
      acc + (nd - n.toDouble * p(d)) * (nd - n.toDouble * p(d)) / (n.toDouble * p(d))
    }
    val got = Mining.qBenford(spark, sfDir).collect()
    assert(got.length == counts.size)
    got.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == counts(d), s"digit $d count")
      assert(r.getDouble(2) == counts(d).toDouble / n.toDouble, s"digit $d obs")
      assert(r.getDouble(3) == p(d), s"digit $d exp")
      assert(r.getDouble(4) == chi2, s"digit $d chi2")
    }
    // Measured finding: the fixture's value magnitudes are
    // Benford-CONSISTENT (chi2 ≈ 8 at 8 df — under the ~20 critical
    // value), i.e. the generator draws exponential-ish magnitudes, not
    // linear-uniform ones. Pin that the audit produces a coherent
    // verdict either way: full digit coverage and a non-degenerate
    // statistic the 8-df test can actually be read against.
    assert(counts.keySet == (1L to 9L).toSet, "all nine digits observed")
    assert(chi2 > 0.0 && chi2 < 20.0,
      s"fixture drifted from its measured Benford-consistency: chi2=$chi2")
  }

  test("q_acf matches per-lag brute force and lag 1 equals q_autocorr") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getTimestamp(0).getTime / 3600000L, r.getLong(1)))
    val byH = hourly.toMap
    val got = Mining.qAcf(spark, sfDir).collect()
    assert(got.length == Mining.AcfMaxLag)
    got.foreach { r =>
      val lag = r.getLong(0)
      val pairs = hourly.flatMap { case (h, x) => byH.get(h + lag).map(y => (x, y)) }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      assert(r.getLong(1) == n, s"lag $lag n")
      val expected = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      assert(r.getDouble(2) == expected, s"lag $lag acf")
      assert(math.abs(expected) <= 1.0)
    }
    // the curve's first point is exactly the single-lag operator
    val a1 = Mining.qAutocorr(spark, sfDir).collect().head.getDouble(1)
    assert(got.head.getDouble(2) == a1, "acf(1) must equal q_autocorr")
  }

  test("q_jaccard_sets matches brute-force set overlap and bounds") {
    val items = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val byType = items.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val got = Mining.qJaccardSets(spark, sfDir).collect()
    val types = byType.keySet.toSeq.sorted
    // every unordered pair with a non-empty intersection appears exactly once
    val expectedPairs = (for {
      a <- types; b <- types if a < b
      if (byType(a) intersect byType(b)).nonEmpty
    } yield (a, b)).toSet
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == expectedPairs)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val inter = (byType(a) intersect byType(b)).size.toLong
      val union = (byType(a) union byType(b)).size.toLong
      assert(r.getLong(2) == inter && r.getLong(3) == byType(a).size.toLong &&
        r.getLong(4) == byType(b).size.toLong, s"$a/$b counts")
      assert(r.getDouble(5) == inter.toDouble / union.toDouble, s"$a/$b jaccard")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("q_copurchase matches brute-force basket pair mining") {
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nOrders = byOrder.size.toLong
    val partCnt = items.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCnt = byOrder.values.toSeq
      .flatMap { parts =>
        val s = parts.toSeq.sorted
        for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2L)
    val want = pairCnt.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(100)
    val got = Mining.qCopurchase(spark, sfDir).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (r, ((a, b), nab)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((a, b, nab)))
      assert(r.getLong(3) == partCnt(a) && r.getLong(4) == partCnt(b))
      assert(r.getDouble(5) ==
        (nab * nOrders).toDouble / (partCnt(a) * partCnt(b)).toDouble)
    }
  }

  test("q_join_size_est replays the key-sampled self-join cardinality brute-force") {
    import java.security.MessageDigest
    def h(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % Mining.JoinEstMod
    }
    val freqs = Tables.events(spark, sfDir).select(col("user_id")).collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = freqs.values.map(f => f * f).sum
    val sampled = freqs.filter { case (u, _) => h(u) == 0L }
    val est = sampled.values.map(f => f * f).sum * Mining.JoinEstMod
    val r = Mining.qJoinSizeEst(spark, sfDir).collect().head
    assert(r.getLong(0) == exact, "exact pair count")
    assert(r.getLong(1) == est, "scaled estimate")
    assert(r.getLong(2) == sampled.size.toLong)
    assert(r.getDouble(3) == (est - exact).toDouble / exact.toDouble)
    // the estimator must be in the right ballpark on the fixture (the
    // per-user frequency distribution is near-uniform)
    assert(math.abs(r.getDouble(3)) < 1.0, s"rel_err ${r.getDouble(3)}")
  }
}
