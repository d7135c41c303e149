package graft

import graft.functions.ArgMaxLong.argMaxLong
import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Tests for the aggregation/join surface: the q_approx_distinct rsd bound
  * (its only verification — HLL sketches have no SQL oracle), ArgMaxLong's
  * NaN/null determinism under arbitrary partitioning, and dedup
  * idempotence.
  */
class AnalyticsSpec extends SparkSpec {

  test("q_approx_distinct is within 3·rsd of the exact distinct count per group") {
    val exact = Analytics.qDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Analytics.qApproxDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    val rsd = 0.02 // the relativeSD passed in Analytics.qApproxDistinct
    exact.foreach { case (flag, nd) =>
      val err = math.abs(approx(flag) - nd).toDouble
      assert(err <= 3 * rsd * nd + 1,
        s"group $flag: approx=${approx(flag)} exact=$nd exceeds 3·rsd bound")
    }
  }

  test("q_hll_merge: per-day sketch union estimates EXACTLY like the direct sketch") {
    val got = Analytics.qHllMerge(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (t, exact) = (r.getString(0), r.getLong(1))
      val (direct, merged) = (r.getLong(2), r.getLong(3))
      // Mergeability is not approximate: an HLL union is a per-register
      // max, order-independent, so the merged registers ARE the direct
      // registers and the estimates must be identical longs.
      assert(merged == direct, s"$t: merged=$merged direct=$direct")
      // lgConfigK=12 default → rsd ≈ 1.04/sqrt(4096) ≈ 1.6%; allow 3σ.
      assert(math.abs(direct - exact).toDouble <= 3 * 0.0163 * exact + 1,
        s"$t: estimate $direct vs exact $exact exceeds the sketch bound")
    }
  }

  test("q_approx_topk: per-day accumulate + combine estimates exactly like the direct sketch") {
    val ev = Tables.events(spark, sfDir)
    val direct = Analytics.qApproxTopk(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // The distributed lifecycle: shard by day, accumulate a sketch per
    // shard, combine the shard sketches, estimate from the combined state.
    val merged = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("approx_top_k_accumulate(event_type)").as("sk"))
      .agg(expr("approx_top_k_combine(sk)").as("msk"))
      .select(explode(expr("approx_top_k_estimate(msk, 5)")).as("e"))
      .select(col("e.item"), col("e.count")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (item, cnt) => (-cnt, item) }
    assert(direct.nonEmpty && direct.toSeq == merged.toSeq,
      s"combined-sketch estimate must equal the direct sketch: ${direct.toSeq} vs ${merged.toSeq}")
    // And at this domain size (5 types ≪ tracking capacity) both are EXACT.
    val exact = ev.groupBy(col("event_type")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (item, cnt) => (-cnt, item) }
    assert(direct.toSeq == exact.toSeq)
  }

  test("q_geo_distance: haversine re-derived brute-force; floor margins are ulp-safe") {
    val got = Analytics.qGeoDistance(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == 10)
    val k = 0.017453292519943295
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def dist(eid: Long, uid: Long): Double = {
      val lat = (((eid * 2654435761L) % 1700000L + 1700000L) % 1700000L)
        .toDouble / 10000.0 - 85.0
      val lon = (((eid * 40503L + uid) % 3600000L + 3600000L) % 3600000L)
        .toDouble / 10000.0 - 180.0
      val s1 = math.sin((lat - 51.5072) * k / 2.0)
      val s2 = math.sin((lon - -0.1276) * k / 2.0)
      val a = s1 * s1 +
        math.cos(51.5072 * k) * math.cos(lat * k) * (s2 * s2)
      2.0 * 6371000.0 * math.asin(math.sqrt(a))
    }
    val all = events.map { case (eid, uid, t) => (eid, t, dist(eid, uid)) }
      .sortBy { case (eid, _, dm) => (math.floor(dm).toLong, eid) }
    // Top-10 identity against the brute force (same JVM trig → exact).
    assert(got.toSeq == all.take(10)
      .map { case (eid, t, dm) => (eid, t, math.floor(dm).toLong) }.toSeq)
    // Margin tripwire: a 1-2 ulp cross-engine trig divergence moves these
    // ~1e6 m values by ~1e-9 m; assert every emitted distance sits far
    // (≥ 1e-6 m) from its floor boundary so the quantized BIGINT cannot
    // flip between Spark and libm. Also no two top-10 rows share dist_m
    // within 1 m, so membership and order are ulp-immune too.
    all.take(10).foreach { case (eid, _, dm) =>
      val frac = dm - math.floor(dm)
      assert(frac > 1e-6 && frac < 1 - 1e-6,
        s"event $eid distance $dm sits on a floor boundary")
    }
    val ds = all.take(11).map(_._3).toSeq
    ds.zip(ds.tail).foreach { case (x, y) =>
      assert(y - x > 1.0, s"top-10 boundary gap too small: $x vs $y") }
  }

  test("q_geo_join: nearest-in-ring re-derived brute-force; candidate floor margins ulp-safe") {
    val k = 0.017453292519943295
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val s1 = math.sin((lat2 - lat1) * k / 2.0)
      val s2 = math.sin((lon2 - lon1) * k / 2.0)
      val a = s1 * s1 + math.cos(lat1 * k) * math.cos(lat2 * k) * (s2 * s2)
      2.0 * 6371000.0 * math.asin(math.sqrt(a))
    }
    val anchors = (0L until 1000L).map { a =>
      (a, ((a * 97) % 1700).toDouble / 10.0 - 85.0 + 0.05,
          ((a * 131) % 3600).toDouble / 10.0 - 180.0 + 0.05)
    }
    val byCell = anchors.groupBy { case (_, alat, alon) =>
      (math.floor(alat).toLong, math.floor(alon).toLong) }
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val best = evs.flatMap { case (eid, uid) =>
      val lat = (((eid * 2654435761L) % 1700000L + 1700000L) % 1700000L)
        .toDouble / 10000.0 - 85.0
      val lon = (((eid * 40503L + uid) % 3600000L + 3600000L) % 3600000L)
        .toDouble / 10000.0 - 180.0
      val cands = for {
        dr <- -1L to 1L; dc <- -1L to 1L
        cr = math.floor(lat).toLong + dr
        cc = ((math.floor(lon).toLong + dc + 180) % 360 + 360) % 360 - 180
        (aid, alat, alon) <- byCell.getOrElse((cr, cc), Seq.empty)
      } yield (aid, hav(lat, lon, alat, alon))
      // Margin tripwire on EVERY candidate this event sees: a 1-2 ulp
      // cross-engine trig divergence must not flip any floor that could
      // decide min_by membership or the final ordering.
      cands.foreach { case (aid, dm) =>
        val frac = dm - math.floor(dm)
        assert(frac > 1e-6 && frac < 1 - 1e-6,
          s"event $eid anchor $aid distance $dm on a floor boundary")
      }
      if (cands.isEmpty) None
      else Some {
        val (aid, dm) = cands.minBy { case (aid2, dm2) =>
          (math.floor(dm2).toLong, aid2) }
        (eid, aid, math.floor(dm).toLong)
      }
    }
    val expected = best.sortBy { case (eid, _, dm) => (dm, eid) }.take(10).toSeq
    val got = Analytics.qGeoJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.nonEmpty)
  }

  test("q_asof_join matches a hand-rolled most-recent-order lookup") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val byCust = orders.groupBy(_._1)
    val got = Analytics.qAsofJoin(spark, sfDir).collect()
    assert(got.nonEmpty)
    var nonNull = 0
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
      .zip(got.sortBy(_.getLong(0)).map(r =>
        (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .foreach { case ((eid, uid, ts), (gid, asof)) =>
        assert(eid == gid)
        val expected = byCust.get(uid).flatMap { os =>
          val qual = os.filter(_._2 <= ts)
          if (qual.isEmpty) None
          else {
            val bestTs = qual.map(_._2).max
            Some(qual.filter(_._2 == bestTs).map(_._3).max)
          }
        }
        assert(asof == expected, s"event $eid user $uid: got $asof want $expected")
        if (expected.nonEmpty) nonNull += 1
      }
    assert(nonNull > 0, "fixture must exercise the matched path")
  }

  test("q_quantiles selects the exact rank-⌈qn⌉ elements per group") {
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    val got = Analytics.qQuantiles(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val vs = byType(r.getString(0)).sortBy(t => (t._2, t._3)).map(_._2)
      val n = vs.length
      assert(r.getDouble(1) == vs((n + 3) / 4 - 1), "p25")
      assert(r.getDouble(2) == vs((n + 1) / 2 - 1), "p50")
      assert(r.getDouble(3) == vs((3 * n + 3) / 4 - 1), "p75")
    }
  }

  test("q_approx_quantiles lands within the GK rank-error bound of the exact quantiles") {
    // accuracy=10000 → rank error ≤ n/10000; translate to a VALUE bound by
    // checking the approx answer lies between the exact values at
    // rank ± ceil(n/10000) ± 1.
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val got = Analytics.qApproxQuantiles(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val vs = byType(r.getString(0))
      val n = vs.length
      val eps = n / 10000 + 1
      for ((q, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
        val v = r.getDouble(i + 1)
        val rank = math.ceil(q * n).toInt
        val lo = vs(math.max(rank - eps - 1, 0))
        val hi = vs(math.min(rank + eps - 1, n - 1))
        assert(v >= lo && v <= hi,
          s"${r.getString(0)} q=$q approx=$v outside [$lo, $hi]")
      }
    }
  }

  test("q_approx_quantiles is EXACT in the GK exact domain (n < accuracy) and partition-invariant") {
    // The driver gate rides this: under the 10^4 accuracy every sample is
    // retained, so the sketch returns the exact rank-⌈p·n⌉ element — the
    // same element q_quantiles selects — for ANY partitioning (merges
    // concatenate below the compress threshold).
    val exact = Analytics.qQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val base = Analytics.qApproxQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(base == exact)
    for (parts <- Seq(1, 4, 32)) {
      val sp = spark
      import org.apache.spark.sql.functions.{percentile_approx, array, lit, col}
      val got = Tables.events(sp, sfDir).repartition(parts)
        .groupBy(col("event_type"))
        .agg(percentile_approx(col("value"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"))
        .select(col("event_type"),
          col("qs").getItem(0).as("p25"),
          col("qs").getItem(1).as("p50"),
          col("qs").getItem(2).as("p75"))
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(got == exact, s"parts=$parts diverged from exact quantiles")
    }
  }

  test("ArgMaxLong: NaN counts as greatest (like max), null never wins, any partitioning") {
    import spark.implicits._
    val rows = Seq(
      ("g1", 1L, 2.0), ("g1", 2L, Double.NaN), ("g1", 3L, 5.0),
      ("g2", 4L, 7.0), ("g2", 5L, 7.0), // tie → smallest id
      ("g3", 6L, 1.0)
    ).toDF("g", "id", "v")
      .union(Seq(("g3", 7L)).toDF("g", "id").withColumn("v", lit(null.asInstanceOf[java.lang.Double])))
    for (parts <- Seq(1, 3, 7)) {
      val got = rows.repartition(parts)
        .groupBy($"g").agg(argMaxLong($"id", $"v").as("best"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("g1" -> 2L, "g2" -> 4L, "g3" -> 6L),
        s"parts=$parts: NaN must win g1, tie → min id in g2, null must not win g3")
    }
  }

  test("q_dedup is idempotent and emits unique keys") {
    val first = Analytics.qDedup(spark, sfDir)
    val rows = first.collect()
    val keys = rows.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.distinct.length == keys.length, "dedup output must be key-unique")
    // Re-applying the same keep-min-id rule to its own output is identity.
    val again = first.groupBy(col("user_id"), col("event_type"))
      .agg(min(col("first_event_id")).as("first_event_id"))
      .orderBy(col("user_id"), col("event_type"))
      .collect()
    assert(again.toSeq == rows.toSeq)
  }

  test("q_ntile buckets are balanced within 1 and ordered by length per language") {
    val rows = Analytics.qNtile(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, bs) =>
      assert(bs.map(_.getInt(1)).sorted.toSeq == (1 to 4), s"$lang must have 4 buckets")
      val ns = bs.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$lang bucket sizes $ns differ by more than 1")
      // Quartile ranges must not overlap: bucket k's max <= bucket k+1's min.
      val ordered = bs.sortBy(_.getInt(1))
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(4) <= b.getLong(3), s"$lang quartile ranges overlap")
      }
    }
  }

  test("q_sample_balanced caps every stratum at BalancedPerStratum and is rerun-stable") {
    val r1 = Analytics.qSampleBalanced(spark, sfDir).collect()
    assert(r1.nonEmpty)
    r1.foreach(r => assert(r.getLong(1) <= Analytics.BalancedPerStratum))
    val r2 = Analytics.qSampleBalanced(spark, sfDir).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
      "hash-ordered sampling must be deterministic across runs")
  }

  test("q_event_seq emits at most SeqLen steps, consistent with each user's count") {
    Analytics.qEventSeq(spark, sfDir).collect().foreach { r =>
      val (n, seq) = (r.getLong(1), r.getString(2))
      val steps = seq.split("\\|").length
      assert(steps == math.min(n, Analytics.SeqLen.toLong),
        s"user ${r.getLong(0)}: $steps steps for $n events")
    }
  }

  test("q_corr values are valid Pearson coefficients and match a driver-side recompute") {
    val got = Analytics.qCorr(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    got.values.foreach(v => assert(v >= -1.0 && v <= 1.0 && !v.isNaN))
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"),
        hour(col("ts")).cast("double").as("h"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (et, xs) =>
      val n = xs.length.toDouble
      // exactSum casts each term to DECIMAL(38,6) (HALF_UP) before summing.
      def s(f: ((String, Double, Double)) => Double) = xs.map(f)
        .map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val (sx, sy) = (s(_._2), s(_._3))
      val (sxx, syy, sxy) = (s(t => t._2 * t._2), s(t => t._3 * t._3), s(t => t._2 * t._3))
      val ref = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(math.abs(got(et) - ref) < 1e-9, s"$et: ${got(et)} vs $ref")
    }
  }

  test("q_scd2 intervals: chained, type-alternating, exactly one open interval per user") {
    val byUser = Analytics.qScd2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), Option(r.getString(3))))
      .groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (uid, rs) =>
      val ordered = rs.sortBy(_._3)
      // Each interval closes where the next opens; only the last is open.
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $uid: interval not chained at ${a._3}")
          assert(a._2 != b._2, s"user $uid: consecutive intervals share a type")
        case _ => ()
      }
      assert(ordered.init.forall(_._4.isDefined) && ordered.last._4.isEmpty,
        s"user $uid must have exactly one open (current) interval")
    }
  }

  test("q_scd2_apply: MERGE of the change day equals the full rebuild; chains stay well-formed") {
    // The merge must reproduce the full-history rebuild row-for-row —
    // closed intervals closed at the right bound, continuations swallowed,
    // new users inserted, untouched users byte-identical.
    val merged = Analytics.qScd2Apply(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), Option(r.getString(3))))
    val rebuilt = Analytics.qScd2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), Option(r.getString(3))))
    assert(merged.toSeq == rebuilt.toSeq && merged.nonEmpty,
      "merge(dim, changes) must equal rebuild(history + changes)")
    // Chain invariants independently (not just equality with q_scd2):
    // per user ascending valid_from, each close = next open, alternating
    // types, exactly one open interval.
    merged.groupBy(_._1).foreach { case (uid, rs) =>
      val ordered = rs.sortBy(_._3)
      assert(ordered.map(_._3).toSeq == ordered.map(_._3).sorted.toSeq)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $uid: merged interval not chained at ${a._3}")
          assert(a._2 != b._2, s"user $uid: merged run not collapsed at ${b._3}")
        case _ => ()
      }
      assert(ordered.init.forall(_._4.isDefined) && ordered.last._4.isEmpty,
        s"user $uid must keep exactly one open interval after the merge")
    }
  }

  test("q_funnel stages are monotonically non-increasing and non-trivial") {
    val r = Analytics.qFunnel(spark, sfDir).collect().head
    val (v, vc, vcp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= vc && vc >= vcp, s"funnel must narrow: $v >= $vc >= $vcp")
    assert(v > 0 && vcp < v, "fixture must exercise both conversion and drop-off")
  }

  test("q_anomaly flags exactly the dense hours violating the exact-integer 3σ test") {
    // Recompute the dense series and the integer predicate driver-side —
    // an oracle-independent replica of the flagging rule.
    val hourMs = 3600000L
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getTimestamp(1).getTime, hourMs)))
      .groupBy(_._1)
    // .iterator: flatMap on the Map would rebuild a Map keyed by type and
    // silently collapse all flagged hours to one per type.
    val want = byType.iterator.flatMap { case (t, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val (lo, hi) = (counts.keys.min, counts.keys.max)
      val dense = (lo to hi).map(h => h -> counts.getOrElse(h, 0L))
      val cnt = dense.size.toLong
      val sx  = dense.map(_._2).sum
      val sxx = dense.map(d => d._2 * d._2).sum
      dense.collect {
        case (h, n) if {
          val num = n * cnt - sx
          num * num > 9L * (cnt * sxx - sx * sx)
        } => (t, h)
      }
    }.toSet
    val got = Analytics.qAnomaly(spark, sfDir).collect().map { r =>
      val inst = java.time.LocalDateTime
        .parse(r.getString(1).replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
      (r.getString(0), inst.toEpochMilli / hourMs)
    }.toSet
    assert(got == want, s"flag sets differ: extra=${got.diff(want)} missing=${want.diff(got)}")
    assert(got.nonEmpty, "fixture must exercise the flagged path")
  }

  test("q_retention conserves user-days and counts full cohorts at offset 0") {
    val rows = Analytics.qRetention(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._2 >= 0), "day offsets must be non-negative")
    val userDays = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    // Every (user, active-day) pair lands in exactly one matrix cell.
    assert(rows.map(_._3).sum == userDays.length)
    // Everyone is active on their own cohort day, so the offset-0 cell
    // of each cohort is the cohort's full size.
    val cohortSize = userDays.groupBy(_._1).values
      .map(_.map(_._2).min).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    rows.filter(_._2 == 0L).foreach { case (c, _, n) =>
      assert(n == cohortSize(fmt.parse(c).getTime),
        s"cohort $c offset-0 count $n != cohort size")
    }
  }

  test("q_join_semi ∪ q_join_anti partitions customer exactly") {
    // Different thresholds in the two queries, so recompute anti at the
    // semi threshold for the partition property.
    val c = Tables.customer(spark, sfDir)
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000).select(col("o_custkey"))
    val semi = c.join(big, c("c_custkey") === big("o_custkey"), "left_semi").count()
    val anti = c.join(big, c("c_custkey") === big("o_custkey"), "left_anti").count()
    assert(semi + anti == c.count())
  }

  test("q_pricing: group counts cover the cutoff rows; measure inequalities hold") {
    val rows = Analytics.qPricing(spark, sfDir).collect()
    val cutoffRows = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
      .count()
    assert(rows.map(_.getLong(9)).sum == cutoffRows && cutoffRows > 0)
    rows.foreach { r =>
      val (sumBase, sumDisc, sumCharge) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // discount ∈ [0,1] and tax ≥ 0 ⇒ disc_price ≤ base, charge ≥ disc_price
      assert(sumDisc <= sumBase && sumCharge >= sumDisc)
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0) // avg_disc
    }
  }

  test("q_zscore: per-group mean ~0, population variance ~1, NULL only on zero variance") {
    val rows = Analytics.qZscore(spark, sfDir).collect()
      .map(r => (r.getString(1), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val zs = grp.flatMap(_._2)
      if (zs.nonEmpty) {
        assert(zs.length == grp.length) // guard fires per whole group
        val mean = zs.sum / zs.length
        val varP = zs.map(z => z * z).sum / zs.length - mean * mean
        assert(math.abs(mean) < 1e-9, s"standardized mean $mean")
        assert(math.abs(varP - 1.0) < 1e-9, s"standardized variance $varP")
      }
    }
  }

  test("q_skyline equals the quadratic dominance scan; frontier is a strict chain") {
    val pu = Tables.events(spark, sfDir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), Tables.exactSum(col("value")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = pu.filter { case (_, n, s) =>
      !pu.exists { case (_, wn, ws) =>
        wn >= n && ws >= s && (wn > n || ws > s) }
    }.map(_._1).toSet
    val rows = Analytics.qSkyline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet == brute && brute.nonEmpty)
    // Frontier staircase: across DISTINCT points in output order (n desc),
    // count strictly decreases while sum strictly increases.
    val pts = rows.map(r => (r._2, r._3)).distinct
    pts.sliding(2).foreach {
      case Array((n1, s1), (n2, s2)) => assert(n1 > n2 && s1 < s2)
      case _ =>
    }
  }

  test("q_revenue_topn: descending revenue, keyed tie-break, within the segment") {
    val rows = Analytics.qRevenueTopn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array((k1, _, r1), (k2, _, r2)) =>
      assert(r1 > r2 || (r1 == r2 && k1 < k2))
    }
    val buildingOrders = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir)
          .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    rows.foreach { case (k, _, rev) =>
      assert(buildingOrders.contains(k) && rev > 0.0)
    }
  }

  test("q_regional_revenue is invariant to join strategy (broadcast vs shuffle)") {
    // The scaladoc claims the broadcast choices are free for the planner
    // to make differently at scale; prove it: force every join to shuffle
    // in a fresh session and the result must be row-identical (decimal
    // sums make the aggregation order-independent).
    val got = Analytics.qRegionalRevenue(spark, sfDir).collect()
    assert(got.length > 0)
    val noBroadcast = spark.newSession()
    noBroadcast.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val forced = Analytics.qRegionalRevenue(noBroadcast, sfDir).collect()
    assert(got.length == forced.length)
    got.zip(forced).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getDouble(1) == b.getDouble(1), s"${a.getString(0)}: revenue")
      assert(a.getLong(2) == b.getLong(2))
    }
    // Same-nation constraint actually bites: fewer items than the
    // unconstrained join would produce.
    assert(got.map(_.getLong(2)).sum > 0)
  }

  test("q_top_supplier returns exactly the argmax suppliers of quarterly revenue") {
    val got = Analytics.qTopSupplier(spark, sfDir).collect()
    assert(got.nonEmpty)
    // Independent recompute of the revenue table (exactSum = the same
    // decimal-sum-then-cast the query outputs).
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >=
          lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("l_suppkey"))
      .agg(Tables.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mx = rev.values.max
    val winners = rev.collect { case (k, v) if v == mx => k }.toSet
    assert(got.map(_.getLong(0)).toSet == winners)
    got.foreach(r => assert(r.getDouble(2) == mx))
    // Ordered by supplier key.
    assert(got.map(_.getLong(0)).toSeq == got.map(_.getLong(0)).toSeq.sorted)
  }

  test("q_promo_share: one row, share in [0,100], consistent with separate recomputes") {
    val got = Analytics.qPromoShare(spark, sfDir).collect()
    assert(got.length == 1)
    val (share, n) = (got.head.getDouble(0), got.head.getLong(1))
    assert(n > 0 && share >= 0.0 && share <= 100.0)
    // Recompute numerator and denominator independently.
    val joined = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >=
          lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-02-01 00:00:00").cast("timestamp_ntz"))
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
    val all = joined.agg(
      Tables.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).head().getDouble(0)
    val promo = joined.filter(col("p_type") === "PROMO").agg(
      Tables.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).head().getDouble(0)
    assert(math.abs(share - promo * 100.0 / all) < 1e-9)
    assert(n == joined.count())
  }

  test("q_markov: rows per prev sum to 1, counts conserve the lagged-event total") {
    val got = Analytics.qMarkov(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, _, n, p) => assert(n > 0 && p > 0.0 && p <= 1.0) }
    // Conditional distributions: probabilities per prev sum to 1.
    got.groupBy(_._1).foreach { case (prev, rows) =>
      val s = rows.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-9, s"P(.|$prev) sums to $s")
    }
    // Every non-first event of every user contributes exactly one transition.
    val nUsersWithEvents = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(got.map(_._3).sum == nEvents - nUsersWithEvents)
  }

  test("q_constraint_check: four constraints, clean fixture passes, counts cover the tables") {
    val got = Analytics.qConstraintCheck(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set("unique_o_orderkey", "fk_lineitem_orders",
      "range_l_discount_0_1", "notnull_c_custkey"))
    // The TPC-H-ish fixture is referentially clean — every check passes
    // with a full denominator.
    got.values.foreach { case (v, _) => assert(v == 0L) }
    assert(got("fk_lineitem_orders")._2 == Tables.lineitem(spark, sfDir).count())
    assert(got("range_l_discount_0_1")._2 == Tables.lineitem(spark, sfDir).count())
    assert(got("notnull_c_custkey")._2 == Tables.customer(spark, sfDir).count())
    assert(got("unique_o_orderkey")._2 ==
      Tables.orders(spark, sfDir).select(col("o_orderkey")).distinct().count())
    // And the checks actually FIRE: a corrupted frame reports violations.
    val dirty = Tables.orders(spark, sfDir).limit(5)
      .unionByName(Tables.orders(spark, sfDir).limit(5))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0)).cast("long"))
      .head().getLong(0)
    assert(dirty == 5L, s"duplicated keys must be counted, got $dirty")
  }

  test("q_incremental_agg: merge of state+delta partials equals the one-pass aggregate") {
    val got = Analytics.qIncrementalAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val full = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Tables.exactSum(col("value")).as("s"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == full.keySet && got.nonEmpty)
    // Bit-equal, not approximately equal: the merge stays decimal-exact.
    got.foreach { case (k, v) => assert(v == full(k), s"type $k: $v != ${full(k)}") }
    // The split is non-trivial: the delta side actually has rows.
    val deltaRows = Tables.events(spark, sfDir)
      .filter(col("ts") >= lit("2024-01-30 00:00:00").cast("timestamp")).count()
    assert(deltaRows > 0 && deltaRows < Tables.events(spark, sfDir).count())
  }

  test("q_incremental_agg merge algebra is associative over a THIRD partial, bit-exactly") {
    // The property that makes the pattern safe as a standing nightly job:
    // yesterday's merged state absorbed into today's delta must equal
    // merging the three raw partials in any association — decimal-exact,
    // rounded to double ONCE at the end (the operator's own contract).
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.DecimalType
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 6))).as("sum_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
    val decZero = lit(0).cast(DecimalType(38, 6))
    def merge(a: DataFrame, b: DataFrame): DataFrame = {
      val l = a.withColumnsRenamed(Map("n" -> "n_s", "sum_v" -> "sum_s",
        "min_v" -> "min_s", "max_v" -> "max_s"))
      val r = b.withColumnsRenamed(Map("n" -> "n_d", "sum_v" -> "sum_d",
        "min_v" -> "min_d", "max_v" -> "max_d"))
      l.join(r, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
          (coalesce(col("sum_s"), decZero) + coalesce(col("sum_d"), decZero)).as("sum_v"),
          least(col("min_s"), col("min_d")).as("min_v"),
          greatest(col("max_s"), col("max_d")).as("max_v"))
    }
    def finish(df: DataFrame): Map[String, (Long, Double, Double, Double)] =
      df.select(col("event_type"), col("n"),
          col("sum_v").cast("double").as("sum_v"), col("min_v"), col("max_v"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
    val ev = Tables.events(spark, sfDir)
    val c1 = lit("2024-01-15 00:00:00").cast("timestamp")
    val c2 = lit("2024-01-30 00:00:00").cast("timestamp")
    val p1 = partials(ev.filter(col("ts") < c1))
    val p2 = partials(ev.filter(col("ts") >= c1 && col("ts") < c2))
    val p3 = partials(ev.filter(col("ts") >= c2))
    // All three slices must be non-trivial or associativity is vacuous.
    Seq(p1, p2, p3).foreach(p => assert(p.count() > 0))
    val leftAssoc = finish(merge(merge(p1, p2), p3))
    val rightAssoc = finish(merge(p1, merge(p2, p3)))
    val onePass = finish(partials(ev))
    assert(leftAssoc == rightAssoc)
    assert(leftAssoc == onePass)
  }

  test("q_first_last: accessors match each user's (ts, event_id)-ordered history") {
    val hist = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq
      }
    val got = Analytics.qFirstLast(spark, sfDir).collect()
    assert(got.length == hist.size, "exactly one row per user")
    got.foreach { r =>
      val seq = hist(r.getLong(0))
      assert(r.getString(1) == seq.head)
      assert(r.getString(2) == seq.last)
      assert(Option(r.getString(3)) == seq.drop(1).headOption)
    }
  }

  test("q_snapshot_diff: changelog equals a brute-force diff of the two window snapshots") {
    import scala.math.BigDecimal.RoundingMode
    def dec(x: Double): BigDecimal = BigDecimal(x).setScale(6, RoundingMode.HALF_UP)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getDefault)
    def snap(from: String, to: String): Map[Long, (Long, Double)] = {
      val (lo, hi) = (fmt.parse(from).getTime, fmt.parse(to).getTime)
      Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("value")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
        .filter(r => r._2 >= lo && r._2 < hi)
        .groupBy(_._1)
        .map { case (u, rs) =>
          u -> (rs.length.toLong, rs.map(r => dec(r._3)).sum.toDouble) }
    }
    val a = snap("2024-01-08 00:00:00", "2024-01-15 00:00:00")
    val b = snap("2024-01-22 00:00:00", "2024-01-29 00:00:00")
    val expected = (a.keySet ++ b.keySet).flatMap { u =>
      (a.get(u), b.get(u)) match {
        case (None, Some((c, t)))    => Some(u -> ("I", None, None, Some(c), Some(t)))
        case (Some((c, t)), None)    => Some(u -> ("D", Some(c), Some(t), None, None))
        case (Some(o), Some(n)) if o != n =>
          Some(u -> ("U", Some(o._1), Some(o._2), Some(n._1), Some(n._2)))
        case _ => None
      }
    }.toMap
    val got = Analytics.qSnapshotDiff(spark, sfDir).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val u = r.getLong(0)
      def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      assert(expected(u) == ((r.getString(1), optL(2), optD(3), optL(4), optD(5))),
        s"user $u")
    }
    // The fixture must exercise the U path at least (stable user bases
    // make I/D rare; U is the load-bearing branch).
    assert(got.exists(_.getString(1) == "U"))
  }

  test("q_cogroup: typed merge equals brute-force per-key aggregation of both inputs") {
    import scala.math.BigDecimal.RoundingMode
    def dec(x: Double): BigDecimal = BigDecimal(x).setScale(6, RoundingMode.HALF_UP)
    def agg(rows: Array[(Long, Double)]): Map[Long, (Long, Double)] =
      rows.groupBy(_._1).map { case (k, vs) =>
        k -> (vs.length.toLong, vs.map(v => dec(v._2)).sum.toDouble) }
    val ev = agg(Tables.events(spark, sfDir)
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))))
    val or = agg(Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))))
    val got = Analytics.qCogroup(spark, sfDir).collect()
    assert(got.length == (ev.keySet ++ or.keySet).size)
    got.foreach { r =>
      val k = r.getLong(0)
      val (ne, sv) = ev.getOrElse(k, (0L, Double.NaN))
      val (no, so) = or.getOrElse(k, (0L, Double.NaN))
      assert(r.getLong(1) == ne && r.getLong(3) == no, s"counts for $k")
      assert((if (r.isNullAt(2)) Double.NaN else r.getDouble(2)).equals(sv), s"sum_v $k")
      assert((if (r.isNullAt(4)) Double.NaN else r.getDouble(4)).equals(so), s"sum_o $k")
    }
    // The fixture must exercise a one-sided key (order customer with no
    // events), or the cogroup's empty-iterator branch goes untested.
    assert(got.exists(r => r.getLong(1) == 0L || r.getLong(3) == 0L))
  }

  test("q_cum_users: first-touch identity equals brute-force cumulative distinct") {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).distinct
    val days = ud.map(_._2).distinct.sorted
    val got = Analytics.qCumUsers(spark, sfDir).collect()
    assert(got.length == days.length)
    got.zip(days).foreach { case (r, day) =>
      val active = ud.filter(_._2 == day).map(_._1).toSet
      // brute-force cumulative distinct: dedup the whole prefix per day —
      // the O(n·days) definition the first-touch identity replaces.
      val cum = ud.filter(_._2 <= day).map(_._1).toSet
      val prev = ud.filter(_._2 < day).map(_._1).toSet
      assert(r.getLong(1) == active.size.toLong, s"dau@$day")
      assert(r.getLong(2) == (cum -- prev).size.toLong, s"new@$day")
      assert(r.getLong(3) == cum.size.toLong, s"cum@$day")
    }
    // monotone non-decreasing cumulative curve ending at total distinct
    assert(got.last.getLong(3) == ud.map(_._1).distinct.length.toLong)
    assert(got.sliding(2).forall(p => p.head.getLong(3) <= p.last.getLong(3)))
  }

  test("q_wau matches the brute-force trailing-7-day distinct scan") {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 86400000L)).distinct
    val days = ud.map(_._2).distinct.sorted
    val got = Analytics.qWau(spark, sfDir).collect()
    assert(got.length == days.length)
    got.zip(days).foreach { case (r, day) =>
      val dau = ud.filter(_._2 == day).map(_._1).toSet
      // brute force: distinct users over the trailing 7-day window
      val wau = ud.filter(u => u._2 <= day && u._2 >= day - 6).map(_._1).toSet
      assert(r.getLong(1) == dau.size.toLong, s"dau@$day")
      assert(r.getLong(2) == wau.size.toLong, s"wau@$day")
      assert(r.getDouble(3) == dau.size.toDouble / wau.size.toDouble)
      assert(dau.subsetOf(wau))
    }
    // after the 7th day the window is saturated: wau must exceed dau
    // somewhere or the window degenerated to a copy of dau
    assert(got.drop(6).exists(r => r.getLong(2) > r.getLong(1)))
  }

  test("q_mad matches the brute-force rank-selected robust statistics") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def lowerMedian[A](xs: Seq[(Double, Long)]): Double =
      xs.sortBy(identity)((Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)))
        .apply((xs.length + 1) / 2 - 1)._1
    val got = Analytics.qMad(spark, sfDir).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val t = r.getString(0)
      val vs = rows.filter(_._1 == t)
      val med = lowerMedian(vs.map(v => (v._2, v._3)).toSeq)
      val devs = vs.map(v => (math.abs(v._2 - med), v._3)).toSeq
      val mad = lowerMedian(devs)
      val out = devs.count(_._1 > (3.0 * 1.4826) * mad).toLong
      assert(r.getLong(1) == vs.length.toLong)
      assert(r.getDouble(2) == med, s"$t median")
      assert(r.getDouble(3) == mad, s"$t mad")
      assert(r.getDouble(4) == 1.4826 * mad, s"$t sigma_hat")
      assert(r.getLong(5) == out, s"$t outliers")
      // robust fence sanity: the fence flags a minority, never everything
      assert(out < vs.length / 2)
    }
  }

  test("q_twap matches the brute-force step-function integral per user") {
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val got = Analytics.qTwap(spark, sfDir).collect()
    val byUser = rows.groupBy(_._1)
    assert(got.length == byUser.count(_._2.length >= 2))
    got.foreach { r =>
      val u = r.getLong(0)
      val evs = byUser(u).sortBy(e => (e._3, e._2))
      val holds = evs.sliding(2).collect { case Array(a, b) =>
        ((b._3 - a._3) / 1000L, math.floor(a._4 * 1000000.0 + 0.5).toLong)
      }.toSeq
      val span = holds.map(_._1).sum
      val swd = holds.map(h => h._2 * h._1).sum
      assert(r.getLong(1) == holds.length.toLong, s"user $u holds")
      assert(r.getLong(2) == span, s"user $u span")
      assert(r.getDouble(3) == swd.toDouble / (1000000.0 * span.toDouble), s"user $u twap")
      // TWAP lives inside the observed value envelope
      val vs = evs.init.map(_._4)
      assert(r.getDouble(3) >= vs.min - 1e-6 && r.getDouble(3) <= vs.max + 1e-6)
    }
  }

  test("q_weighted_median matches the brute-force cumulative-weight selection") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3),
        r.getDouble(4).toLong))
    val got = Analytics.qWeightedMedian(spark, sfDir).collect()
    assert(got.length == rows.map(_._1).distinct.length)
    got.foreach { r =>
      val fs = rows.filter(_._1 == r.getString(0))
        .sortBy(t => (t._2, t._3, t._4))(
          Ordering.Tuple3(Ordering.Double.TotalOrdering, Ordering.Long, Ordering.Int))
      val tot = fs.map(_._5).sum
      var cum = 0L
      val sel = fs.find { t => cum += t._5; cum * 2 >= tot }.get
      assert(r.getDouble(1) == sel._2, s"${r.getString(0)} weighted median")
      assert(r.getLong(2) == tot, s"${r.getString(0)} total qty")
      // at least half the mass sits at or below the selected price
      val below = fs.filter(_._2 <= sel._2).map(_._5).sum
      assert(below * 2 >= tot)
    }
  }

  test("q_interval_join matches the brute-force theta overlap join") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def intervals[K](rows: Seq[(K, Long, Long)], gap: Long): Seq[(K, Long, Long)] =
      rows.groupBy(_._1).toSeq.flatMap { case (k, es) =>
        val sorted = es.map(e => (e._3, e._2)).sorted // (us, event_id)
        val runs = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
          if (e._1 - acc.head.head._1 > gap) List(e) :: acc
          else (e :: acc.head) :: acc.tail
        }
        runs.map(run => (k, run.map(_._1).min, run.map(_._1).max))
      }
    val sessions = intervals(ev.map(e => (e._1, e._3, e._4)).toSeq,
      Analytics.IvSessionGapUs)
    val bursts = intervals(ev.map(e => (e._2, e._3, e._4)).toSeq,
      Analytics.IvBurstGapUs)
    val byType = bursts.groupBy(_._1)
    val got = Analytics.qIntervalJoin(spark, sfDir).collect()
    assert(got.length == byType.size)
    got.foreach { r =>
      val bs = byType(r.getString(0))
      val pairs = for {
        (_, ss, se) <- sessions; (_, b0, b1) <- bs
        if ss <= b1 && b0 <= se
      } yield math.min(se, b1) - math.max(ss, b0)
      assert(r.getLong(1) == pairs.length.toLong, s"${r.getString(0)} pairs")
      assert(r.getLong(2) == pairs.sum, s"${r.getString(0)} overlap")
    }
    // the gaps must actually split: more sessions than users, more
    // bursts than types, or the interval machinery is vacuous here
    assert(sessions.length > ev.map(_._1).distinct.length)
    assert(bursts.length > byType.size)
  }

  test("q_rownum_global: the two-pass zipWithIndex equals the sorted scan, across partitions") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => (id, i + 1L) }.sortBy(_._1)
    val got = Analytics.qRownumGlobal(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
    // AQE may coalesce the tiny fixture's sort to one partition, which
    // would leave the cross-partition offset pass untested — so force an
    // 8-way range layout and prove zipWithIndex still numbers the total
    // order identically (indices depend only on the order, not on where
    // the boundaries land — the property the query's determinism rests on).
    val session = spark
    import session.implicits._
    val forced = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .repartitionByRange(8, col("us"), col("event_id"))
      .sortWithinPartitions(col("us"), col("event_id"))
      .as[(Long, Long)]
    assert(forced.rdd.getNumPartitions == 8)
    val forcedIdx = forced.rdd.zipWithIndex()
      .map { case ((id, _), i) => (id, i + 1L) }.collect().sortBy(_._1)
    assert(forcedIdx.toSeq == want.toSeq)
  }

  test("q_nearest_event matches a brute-force bidirectional nearest scan") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val errsByUser = ev.filter(_._4 == "error").groupBy(_._1)
      .view.mapValues(_.map(_._3).sorted).toMap
    val got = Analytics.qNearestEvent(spark, sfDir).collect()
    val purchases = ev.filter(_._4 == "purchase")
    assert(got.length == purchases.length)
    val gotById = got.map(r => r.getLong(1) -> r).toMap
    purchases.foreach { case (u, id, us, _) =>
      val r = gotById(id)
      errsByUser.get(u) match {
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4), s"purchase $id: no errors")
        case Some(errs) =>
          val before = errs.filter(_ <= us).lastOption
          val after = errs.find(_ >= us)
          val (dt, dir) = (before, after) match {
            case (Some(b), Some(f)) =>
              if (us - b <= f - us) (us - b, "before") else (f - us, "after")
            case (Some(b), None) => (us - b, "before")
            case (None, Some(f)) => (f - us, "after")
            case _ => throw new AssertionError("unreachable")
          }
          assert(r.getLong(3) == dt, s"purchase $id dt")
          assert(r.getString(4) == dir, s"purchase $id direction")
      }
    }
    // both directions must occur or the pick-closer logic is untested
    assert(got.exists(r => !r.isNullAt(4) && r.getString(4) == "before"))
    assert(got.exists(r => !r.isNullAt(4) && r.getString(4) == "after"))
  }

  test("q_cusum matches the brute-force integer argmax of |S_t|") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val got = Analytics.qCusum(spark, sfDir).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val series = hourly.filter(_._1 == r.getString(0)).sortBy(_._2)
      val n = series.length.toLong
      val sx = series.map(_._3).sum
      var cum = 0L
      val ds = series.zipWithIndex.map { case ((_, h, x), i) =>
        cum += x; (h, i + 1L, math.abs(n * cum - (i + 1L) * sx))
      }
      val best = ds.minBy { case (h, _, d) => (-d, h) }
      assert(r.getLong(2) == best._2, s"${r.getString(0)} cp index")
      assert(r.getLong(3) == n)
      assert(r.getDouble(4) == best._3.toDouble / n.toDouble, s"${r.getString(0)} s_max")
      // the last cumulative deviation is identically zero — the argmax
      // can never be the final hour unless the series is constant-zero
      assert(best._2 != n)
    }
  }

  test("q_wow matches the brute-force calendar-shifted pairing") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val byKey = daily.map(d => (d._1, d._2) -> d._3).toMap
    val got = Analytics.qWow(spark, sfDir).collect()
    assert(got.length == daily.length)
    val weekMs = 7L * 86400000L
    // output is (type, day)-ordered and day_s string order == day order,
    // so zipping against the sorted brute-force rows aligns rows exactly
    val sortedDaily = daily.sortBy(d => (d._1, d._2))
    got.zip(sortedDaily).foreach { case (r, (t, day, x)) =>
      assert(r.getString(0) == t)
      assert(r.getLong(2) == x)
      byKey.get((t, day - weekMs)) match {
        case Some(prev) =>
          assert(r.getLong(3) == prev)
          assert(r.getDouble(4) == (x - prev).toDouble / prev.toDouble)
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4), s"$t ${r.getString(1)}")
      }
    }
    // the first week of the fixture has no comparison: NULLs must exist
    assert(got.count(_.isNullAt(4)) >= 5)
  }

  test("q_null_safe_join routes NULL keys to the incident bucket, hash-join shaped") {
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type")).collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Analytics.qNullSafeJoin(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "account" -> byType("signup"),
      "browse" -> (byType("view") + byType("click")),
      "commerce" -> byType("purchase"),
      "incident" -> byType("error")))
    // errors only reach the result THROUGH the null-safe match — and the
    // null semantics must not cost the hash join
    assert(got("incident") > 0)
    val p = Analytics.qNullSafeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"null-safe equality must remain a hash join:\n$p")
  }

  test("q_seasonality: the decomposition reassembles and margins vanish") {
    val got = Analytics.qSeasonality(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val total = Tables.events(spark, sfDir).count()
    assert(got.map(_._3).sum == total, "cell matrix must cover every event")
    // each residual is exactly the pinned chain of the published means
    got.foreach { c =>
      assert(c._7 == c._3.toDouble - c._4 - c._5 + c._6, s"cell ${(c._1, c._2)}")
    }
    // weekday margins: the mean of a weekday's cells equals its effect
    got.groupBy(_._1).foreach { case (dow, cells) =>
      val m = cells.map(_._3).sum.toDouble / cells.length
      assert(math.abs(cells.head._4 - m) < 1e-9, s"dow $dow margin")
    }
    // the GLOBAL residual sum vanishes identically (Σ c − Σ dow̄ − Σ hod̄
    // + Σ grand telescopes to T − T − T + T) even when the cell table is
    // incomplete — per-row sums only vanish for complete balanced tables
    val s = got.map(_._7).sum
    assert(math.abs(s) < 1e-6 * total, s"global residual drift $s")
  }

  test("q_time_to_convert matches the brute-force first-signup/first-purchase scan") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val delays = byUser.toSeq.flatMap { case (u, es) =>
      val signups = es.filter(_._2 == "signup").map(_._3)
      if (signups.isEmpty) None
      else {
        val s = signups.min
        es.filter(e => e._2 == "purchase" && e._3 >= s).map(_._3 - s)
          .minOption.map(d => (u, s, d))
      }
    }
    val cal = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
    def dow(us: Long): Long = {
      cal.setTimeInMillis(us / 1000L); cal.get(java.util.Calendar.DAY_OF_WEEK).toLong
    }
    val byDow = delays.groupBy(d => dow(d._2))
    val got = Analytics.qTimeToConvert(spark, sfDir).collect()
    assert(got.length == byDow.size)
    got.foreach { r =>
      val ds = byDow(r.getLong(0)).sortBy(d => (d._3, d._1))
      assert(r.getLong(1) == ds.length.toLong, s"dow ${r.getLong(0)} n")
      assert(r.getLong(2) == ds((ds.length + 1) / 2 - 1)._3, s"dow ${r.getLong(0)} median")
      assert(r.getLong(3) == ds.map(_._3).max, s"dow ${r.getLong(0)} max")
    }
    // conversion delays must be nonnegative, and the cohort rows must
    // account for every converted user exactly once
    assert(delays.forall(_._3 >= 0))
    assert(got.map(_.getLong(1)).sum == delays.size.toLong)
  }

  test("q_decile_lift matches brute force and the gains curve is well-formed") {
    import scala.math.BigDecimal.RoundingMode
    def dec(x: Double): BigDecimal = BigDecimal(x).setScale(6, RoundingMode.HALF_UP)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.length.toLong,
        es.map(e => dec(if (e._2 == "purchase") e._3 else 0.0)).sum.toDouble)
    }.toSeq
    val ranked = perUser.sortBy(p => (-p._2, p._1))
    val n = ranked.length
    // SQL ntile: earlier tiles take the remainder rows
    val base = n / 10; val extra = n % 10
    val deciles = ranked.zipWithIndex.map { case (p, i) =>
      var acc = 0; var d = 0
      while (d < 10 && { val sz = base + (if (d < extra) 1 else 0); acc + sz <= i } ) {
        acc += base + (if (d < extra) 1 else 0); d += 1 }
      (d + 1, p._3)
    }
    val totRev = perUser.map(p => dec(p._3)).sum.toDouble
    val got = Analytics.qDecileLift(spark, sfDir).collect()
    assert(got.length == 10)
    var cum = 0.0
    got.zipWithIndex.foreach { case (r, i) =>
      val d = i + 1
      val mine = deciles.filter(_._1 == d)
      val revD = mine.map(m => dec(m._2)).sum.toDouble
      assert(r.getLong(0) == d.toLong && r.getLong(1) == mine.length.toLong)
      assert(r.getDouble(2) == revD / totRev, s"decile $d share")
      assert(r.getDouble(3) == (revD / totRev) / 0.1, s"decile $d lift")
      cum += revD / totRev
      assert(r.getDouble(4) == cum, s"decile $d cum")
    }
    // gains curve sanity: ends at ~1 and the curve is monotone
    assert(math.abs(got.last.getDouble(4) - 1.0) < 1e-9)
    assert(got.sliding(2).forall(p => p.head.getDouble(4) <= p.last.getDouble(4)))
  }

  test("q_listagg is the ordered, deduped join of each user's types") {
    val items = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val byUser = items.groupBy(_._1)
    val got = Analytics.qListagg(spark, sfDir).collect()
    assert(got.length == byUser.size)
    got.foreach { r =>
      val types = byUser(r.getLong(0)).map(_._2).sorted
      assert(r.getString(1) == types.mkString(","), s"user ${r.getLong(0)}")
      assert(r.getLong(2) == types.length.toLong)
    }
  }

  test("q_streaks matches a brute-force consecutive-day run scan per user") {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 86400000L)).distinct
    val got = Analytics.qStreaks(spark, sfDir).collect()
    val byUser = ud.groupBy(_._1)
    assert(got.length == byUser.size)
    got.foreach { r =>
      val days = byUser(r.getLong(0)).map(_._2).sorted
      // brute-force island scan: split the sorted day list at gaps > 1
      val runs = days.tail.foldLeft(List(List(days.head))) { (acc, d) =>
        if (d == acc.head.head + 1) (d :: acc.head) :: acc.tail
        else List(d) :: acc
      }
      assert(r.getLong(1) == runs.length.toLong, s"islands for ${r.getLong(0)}")
      assert(r.getLong(2) == days.length.toLong, s"active for ${r.getLong(0)}")
      assert(r.getLong(3) == runs.map(_.length).max.toLong, s"streak for ${r.getLong(0)}")
    }
    // the fixture must exercise a real gap or islands degenerate to 1 run
    assert(got.exists(_.getLong(1) > 1L))
  }

  test("q_lateral equals brute-force per-customer top-2 and decorrelates (no nested loop)") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val want = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      os.sortBy(o => (-o._3, o._2)).take(2).map(o => (ck, o._2, o._3))
    }.sortBy(t => (t._1, -t._3, t._2))
    val df = graft.operators.Analytics.qLateral(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"LIMIT-inside-LATERAL must decorrelate, not re-execute per row:\n$p")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("q_try_cast rejects exactly the injected dirty rows and sums the rest") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2)
    val got = graft.operators.Normalize.qTryCast(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == byType.keySet)
    got.foreach { r =>
      val g = byType(r.getString(0))
      val bad = g.filter(_._1 % 97 == 0)
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == bad.length.toLong)
      assert(r.getLong(3) == g.filterNot(_._1 % 97 == 0)
        .map(e => math.floor(e._3 * 100.0 + 0.5).toLong).sum)
    }
    // The injection must actually hit rows, or try_cast is untested.
    assert(got.map(_.getLong(2)).sum > 0L)
  }

  test("q_variant field extraction matches a brute-force JSON parse") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(col("props"), col("value")).collect()
      .map { r =>
        val k = """"k":\s*(\d+)""".r.findFirstMatchIn(r.getString(0)).get.group(1).toLong
        (k, math.floor(r.getDouble(1) * 100.0 + 0.5).toLong)
      }
    val byDecade = ev.groupBy(_._1 / 10)
    val got = graft.operators.Normalize.qVariant(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet == byDecade.keySet)
    got.foreach { r =>
      val g = byDecade(r.getLong(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.map(_._2).sum)
      assert(r.getLong(3) == g.map(_._1).min && r.getLong(4) == g.map(_._1).max)
    }
  }

  test("q_except_all and q_intersect_all obey the multiset max/min laws") {
    import org.apache.spark.sql.functions._
    val parts = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val a = parts.filter(_._1 % 2 == 0).map(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val b = parts.filter(_._1 % 2 == 1).map(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wantEx = a.map { case (k, m) => k -> math.max(m - b.getOrElse(k, 0L), 0L) }
      .filter(_._2 > 0)
    val wantIn = a.map { case (k, m) => k -> math.min(m, b.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    val gotEx = graft.operators.Analytics.qExceptAll(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotIn = graft.operators.Analytics.qIntersectAll(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotEx == wantEx && gotEx.nonEmpty)
    assert(gotIn == wantIn && gotIn.nonEmpty)
    // Bag identity: |A| = |A\B| + |A∩B| per key and in total.
    a.foreach { case (k, m) =>
      assert(m == gotEx.getOrElse(k, 0L) + gotIn.getOrElse(k, 0L), s"key $k")
    }
  }

  test("q_market_share cells match brute force and shares telescope to 1 per month") {
    import org.apache.spark.sql.functions._
    val sn = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val oMonth = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), date_trunc("month", col("o_orderdate")))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toMap
    val cells = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount")).collect()
      .map { r =>
        val cents = math.floor(
          (r.getDouble(2) * (1.0 - r.getDouble(3))) * 100.0 + 0.5).toLong
        ((oMonth(r.getLong(0)), sn(r.getLong(1))), cents)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val got = graft.operators.Analytics.qMarketShare(spark, sfDir).collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      val key = (fmt.parse(r.getString(0)).getTime, r.getString(1))
      assert(r.getLong(2) == cells(key), s"$key rev_cents")
    }
    // Shares within a month sum to 1 exactly in cents space.
    got.groupBy(_.getString(0)).foreach { case (m, rows) =>
      val tot = cells.filter(_._1._1 == fmt.parse(m).getTime).values.sum
      rows.foreach { r =>
        assert(r.getDouble(3) == r.getLong(2).toDouble / tot.toDouble, s"$m share")
      }
    }
  }

  test("q_big_spenders lists every order of every over-threshold customer, none else") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val totals = orders.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val qualifying = totals.filter(_._2 > graft.operators.Analytics.BigSpenderCents)
    val got = graft.operators.Analytics.qBigSpenders(spark, sfDir).collect()
    assert(got.nonEmpty && qualifying.nonEmpty)
    // Exactly the qualifying customers' orders, with correct totals.
    assert(got.map(_.getLong(1)).toSet == qualifying.keySet)
    assert(got.length == orders.count(o => qualifying.contains(o._1)))
    got.foreach { r =>
      assert(r.getLong(2) == totals(r.getLong(1)), s"cust ${r.getLong(1)} total")
      assert(r.getLong(2) > graft.operators.Analytics.BigSpenderCents)
    }
  }

  test("q_freshness lags are non-negative and exactly the freshest feed reads zero") {
    val got = graft.operators.Analytics.qFreshness(spark, sfDir).collect()
    assert(got.nonEmpty)
    val lags = got.map(_.getLong(2))
    assert(lags.forall(_ >= 0L))
    assert(lags.count(_ == 0L) >= 1)
    val globalUs = got.map(_.getLong(1)).max
    got.foreach { r =>
      assert(r.getLong(2) == (globalUs - r.getLong(1)) / 1000000L,
        s"${r.getString(0)} lag")
    }
  }

  test("q_skew_report is the true top-20 with monotone cumulative share") {
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = counts.map(_._2).sum
    val expected = counts.sortBy(t => (-t._2, t._1)).take(20)
    val got = graft.operators.Analytics.qSkewReport(spark, sfDir).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == expected.toSeq)
    var cum = 0.0
    got.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble / n.toDouble)
      assert(r.getDouble(3) >= cum && r.getDouble(3) <= 1.0 + 1e-12)
      cum = r.getDouble(3)
      assert(r.getDouble(4) == r.getLong(1).toDouble * counts.length.toDouble / n.toDouble)
    }
  }


  test("q_heatmap shares sum to 1 and counts match brute force") {
    val rows = Tables.events(spark, sfDir)
      .select(expr("(unix_micros(ts) div 86400000000) % 7").as("dw"),
        hour(col("ts")).cast("long").as("hr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.Analytics.qHeatmap(spark, sfDir).collect()
    assert(got.length == expected.size)
    var shareSum = 0.0
    got.foreach { r =>
      assert(r.getLong(2) == expected((r.getLong(0), r.getLong(1))))
      shareSum += r.getDouble(3)
    }
    assert(math.abs(shareSum - 1.0) < 1e-9)
  }

  test("q_union_by_name fills the drifted feed's missing column with nulls only there") {
    val got = graft.operators.Analytics.qUnionByName(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = Tables.events(spark, sfDir).count()
    assert(got("feed_a")._1 + got("feed_b")._1 == n)
    assert(got("feed_a")._2 == 0L, "aligned feed must carry no drift nulls")
    assert(got("feed_b")._2 == got("feed_b")._1,
      "every drifted-feed row carries the filled null")
  }

  test("q_seq3 counts match brute-force user-sequence trigrams") {
    val seqs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3)).map(_._4).toSeq).toMap
    val tri = seqs.values.flatMap(_.sliding(3).filter(_.length == 3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.Analytics.qSeq3(spark, sfDir).collect()
    assert(got.length == math.min(20, tri.size))
    val expectedTop = tri.toSeq
      .map { case (k, v) => (k(0), k(1), k(2), v) }
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(20)
    assert(got.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq == expectedTop)
  }

  test("q_tpch_q6 revenue matches the exact fixed-point brute force") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(year(col("l_shipdate")).as("yr"), col("l_discount"),
        col("l_quantity"), col("l_extendedprice"))
      .collect()
    val sel = rows.filter { r =>
      r.getInt(0) == 1995 &&
        r.getDouble(1) >= 0.05 && r.getDouble(1) <= 0.07 && r.getDouble(2) < 24
    }
    val rev = sel.map { r =>
      math.floor(r.getDouble(3) * 100.0 + 0.5).toLong *
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong
    }.sum
    val got = graft.operators.Analytics.qTpchQ6(spark, sfDir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == sel.length.toLong)
    assert(got(0).getLong(1) == rev)
    assert(sel.nonEmpty, "fixture must exercise the Q6 band")
  }

  test("q_tpch_q13 histogram covers every customer including zero-order ones") {
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val hist = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.Analytics.qTpchQ13(spark, sfDir).collect()
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap == hist)
    assert(got.map(_.getLong(1)).sum == custs.length.toLong)
  }


  test("q_yoy matches brute-force month-over-year-ago growth") {
    val monthly = Tables.orders(spark, sfDir)
      .select((year(col("o_orderdate")) * lit(12L) +
        (month(col("o_orderdate")) - lit(1L))).as("mi"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("c"))
      .groupBy(col("mi")).agg(sum(col("c")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = graft.operators.Analytics.qYoy(spark, sfDir).collect()
    val expected = monthly.keys.filter(mi => monthly.contains(mi - 12)).toSeq.sorted
    assert(got.map(_.getLong(0)).toSeq == expected)
    got.foreach { r =>
      val (mi, c) = (r.getLong(0), r.getLong(1))
      val p = monthly(mi - 12)
      assert(c == monthly(mi) && r.getLong(2) == p)
      assert(r.getDouble(3) == (c - p).toDouble / p.toDouble)
    }
  }

  test("q_sole_supplier matches brute force and decorrelates to an anti join") {
    val lines = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val suppsPerOrder = lines.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val soleCounts = lines.filter(l => suppsPerOrder(l._1).size == 1)
      .map(l => (l._2, l._1)).distinct
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val names = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = soleCounts.toSeq.map { case (sk, n) => (sk, names(sk), n) }
      .sortBy(t => (-t._3, t._1)).take(10)
    val df = graft.operators.Analytics.qSoleSupplier(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti") || p.contains("ExistenceJoin"),
      s"NOT EXISTS must decorrelate to an anti/existence join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no nested-loop fallback:\n$p")
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == expected)
    assert(got.nonEmpty)
  }

  test("q_tpch_q3 equals the brute-force shipping-priority top-10") {
    def centsOf(p: Double, disc: Double): Long =
      math.floor(p * (1.0 - disc) * 100.0 + 0.5).toLong
    val cutoff = java.time.LocalDateTime.parse("1998-06-01T00:00:00")
    val custs = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority")).collect()
      .filter(r => custs(r.getLong(1)) &&
        r.getAs[java.time.LocalDateTime](2).isBefore(cutoff))
      .map(r => r.getLong(0) ->
        ((r.getAs[java.time.LocalDateTime](2), r.getString(3)))).toMap
    val rev = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        col("l_shipdate")).collect()
      .filter(r => ords.contains(r.getLong(0)) &&
        r.getAs[java.time.LocalDateTime](3).isAfter(cutoff))
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => centsOf(r.getDouble(1), r.getDouble(2))).sum)
      .toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    val got = Analytics.qTpchQ3(spark, sfDir).collect()
    assert(got.length == rev.length && got.nonEmpty)
    got.zip(rev).foreach { case (g, (ok, cents)) =>
      assert(g.getLong(0) == ok && g.getLong(1) == cents)
      assert(g.getString(3) == ords(ok)._2)
    }
  }

  test("q_tpch_q18 returns exactly the orders above the quantity threshold") {
    val qty = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getDouble(1).toLong).sum)
      .filter(_._2 > 300L).toMap
    val got = Analytics.qTpchQ18(spark, sfDir).collect()
    assert(got.map(_.getLong(2)).toSet == qty.keySet)
    got.foreach(r => assert(r.getLong(5) == qty(r.getLong(2)),
      s"order ${r.getLong(2)} total_qty"))
    // Total cents ordering is strict (desc, orderkey tiebreak).
    val keys = got.map(r => (-r.getLong(4), r.getLong(2))).toSeq
    assert(keys == keys.sorted, "presentation order")
  }


  test("q_tpch_q5 matches the brute-force local-supplier revenue") {
    def cents(p: Double, disc: Double): Long =
      math.floor(p * (1.0 - disc) * 100.0 + 0.5).toLong
    val regions = Tables.region(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val asia = Tables.nation(spark, sfDir).collect()
      .filter(r => regions(r.getInt(2)) == "ASIA")
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val custNation = Tables.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val suppNation = Tables.supplier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val lo = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
    val hi = java.time.LocalDateTime.parse("1997-01-01T00:00:00")
    val ordCust = Tables.orders(spark, sfDir).collect()
      .filter { r =>
        val t = r.getAs[java.time.LocalDateTime](4)
        !t.isBefore(lo) && t.isBefore(hi)
      }.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rev = scala.collection.mutable.Map.empty[String, Long]
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount")).collect()
      .foreach { r =>
        ordCust.get(r.getLong(0)).foreach { ck =>
          val cn = custNation(ck)
          if (asia.contains(cn) && suppNation(r.getLong(1)) == cn)
            rev(asia(cn)) =
              rev.getOrElse(asia(cn), 0L) + cents(r.getDouble(2), r.getDouble(3))
        }
      }
    val want = rev.toSeq.sortBy { case (n, c) => (-c, n) }
    val got = Analytics.qTpchQ5(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("q_tpch_q10 matches the brute-force returned-revenue top-20") {
    def cents(p: Double, disc: Double): Long =
      math.floor(p * (1.0 - disc) * 100.0 + 0.5).toLong
    val lo = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
    val hi = java.time.LocalDateTime.parse("1996-04-01T00:00:00")
    val ordCust = Tables.orders(spark, sfDir).collect()
      .filter { r =>
        val t = r.getAs[java.time.LocalDateTime](4)
        !t.isBefore(lo) && t.isBefore(hi)
      }.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rev = scala.collection.mutable.Map.empty[Long, Long]
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount")).collect()
      .foreach { r =>
        if (r.getString(1) == "R")
          ordCust.get(r.getLong(0)).foreach { ck =>
            rev(ck) = rev.getOrElse(ck, 0L) + cents(r.getDouble(2), r.getDouble(3))
          }
      }
    val cust = Tables.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2),
        math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))).toMap
    val natName = Tables.nation(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val want = rev.toSeq.sortBy { case (ck, c) => (-c, ck) }.take(20)
    val got = Analytics.qTpchQ10(spark, sfDir).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, (ck, c)) =>
      val (nm, nk, bal) = cust(ck)
      assert(g.getLong(0) == ck && g.getString(1) == nm)
      assert(g.getLong(2) == bal && g.getString(3) == natName(nk))
      assert(g.getLong(4) == c)
    }
  }


  test("q_tpch_q19 matches the brute-force disjunctive-channel revenue") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_size")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    var cents = 0L
    var nl = 0L
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount")).collect()
      .foreach { r =>
        val (b, sz) = parts(r.getLong(0))
        val q = r.getDouble(1)
        val hit =
          (b == "Brand#12" && sz >= 1 && sz <= 5 && q >= 1 && q <= 11) ||
          (b == "Brand#23" && sz >= 1 && sz <= 10 && q >= 10 && q <= 20) ||
          (b == "Brand#24" && sz >= 1 && sz <= 15 && q >= 20 && q <= 30)
        if (hit) {
          cents += math.floor(
            r.getDouble(2) * (1.0 - r.getDouble(3)) * 100.0 + 0.5).toLong
          nl += 1
        }
      }
    val got = Analytics.qTpchQ19(spark, sfDir).collect().head
    assert(nl > 0, "fixture must hit at least one channel")
    assert(got.getLong(0) == cents && got.getLong(1) == nl)
  }

  test("q_tpch_q11 returns exactly the parts above the global-fraction cut") {
    val rev = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => math.floor(
        r.getDouble(1) * (1.0 - r.getDouble(2)) * 100.0 + 0.5).toLong).sum)
      .toMap
    val total = rev.values.sum
    val np = rev.size.toLong
    val want = rev.filter { case (_, c) => 2L * c * np > 3L * total }.toSeq
      .sortBy { case (pk, c) => (-c, pk) }
    val got = Analytics.qTpchQ11(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.length < rev.size, "the cut must actually exclude parts")
  }

  test("q_tpch_q4 counts exactly the window's orders with a >60-day-late line") {
    import java.time.LocalDateTime
    val ships = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate")).collect()
      .map(r => (r.getLong(0), r.getAs[LocalDateTime](1)))
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[LocalDateTime](1), r.getString(2)))
    val from = LocalDateTime.parse("1997-01-01T00:00:00")
    val to = LocalDateTime.parse("1998-01-01T00:00:00")
    val byOrder = ships.groupBy(_._1)
    val want = orders
      .filter { case (ok, od, _) =>
        !od.isBefore(from) && od.isBefore(to) &&
          byOrder.getOrElse(ok, Array.empty[(Long, LocalDateTime)])
            .exists(_._2.isAfter(od.plusDays(60)))
      }
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val got = Analytics.qTpchQ4(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.sum <
      orders.count { case (_, od, _) => !od.isBefore(from) && od.isBefore(to) },
      "the EXISTS must actually exclude on-time orders")
  }

  test("q_tpch_q12 splits the ship-year's lines by order priority class") {
    val pri = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val lines = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"),
        year(col("l_shipdate")).as("yr")).collect()
      .filter(_.getInt(2) == 1998)
      .map(r => (r.getString(1),
        Set("1-URGENT", "2-HIGH")(pri(r.getLong(0)))))
    val want = lines.groupBy(_._1).view.mapValues { rs =>
      (rs.count(_._2).toLong, rs.count(!_._2).toLong)
    }.toMap
    val got = Analytics.qTpchQ12(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.exists(v => v._1 > 0 && v._2 > 0),
      "both priority classes must be populated")
  }

  test("q_tpch_q17 equals the brute-force below-fifth-of-average revenue") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong,
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val stats = rows.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.size.toLong)).toMap
    val sel = rows.filter { case (pk, q, _) =>
      val (sq, nq) = stats(pk); 5L * q * nq < sq
    }
    val got = Analytics.qTpchQ17(spark, sfDir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == sel.length.toLong)
    assert(got(0).getLong(1) == sel.map(_._3).sum)
    assert(sel.nonEmpty && sel.length < rows.length,
      "the quantity cut must be selective but non-vacuous")
  }

  test("q_tpch_q22 finds the dormant above-average-balance customers per nation") {
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val pos = cust.map(_._3).filter(_ > 0L)
    val (s, n) = (pos.sum, pos.length.toLong)
    val dormant = cust.filter { case (ck, _, b) =>
      b * n > s && !recent(ck)
    }
    val want = dormant.groupBy(_._2).view
      .mapValues(rs => (rs.size.toLong, rs.map(_._3).sum)).toMap
    val got = Analytics.qTpchQ22(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want && got.nonEmpty,
      "the fixture must contain dormant above-average customers")
  }

  test("q_tpch_q2 picks each small part's cheapest supplier with a total tie-break") {
    val offers = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val smallParts = Tables.part(spark, sfDir)
      .filter(col("p_size") < 10).select(col("p_partkey")).collect()
      .map(_.getLong(0)).toSet
    val winners = offers.toSeq
      .map { case ((pk, sk), c) => (pk, sk, c) }
      .groupBy(_._1).view
      .mapValues(_.minBy(o => (o._3, o._2))).toMap
    val want = winners.values.toSeq
      .filter(w => smallParts(w._1))
      .sortBy(w => (w._3, w._1)).take(100)
      .map(w => (w._1, w._2, w._3))
    val got = Analytics.qTpchQ2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("q_tpch_q7 equals the brute-force bilateral nation-pair revenue") {
    val natOf = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => r.getLong(0) -> natOf(r.getInt(1))).toMap
    val custNat = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> natOf(r.getInt(1))).toMap
    val custOf = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pair = Set("NATION_3", "NATION_8")
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")),
        col("l_extendedprice"), col("l_discount")).collect()
      .flatMap { r =>
        val sn = suppNat(r.getLong(1))
        val cn = custNat(custOf(r.getLong(0)))
        val yr = r.getInt(2)
        if (pair(sn) && pair(cn) && sn != cn && (yr == 1996 || yr == 1997))
          Some(((sn, cn, yr.toLong), math.floor(
            r.getDouble(3) * (1.0 - r.getDouble(4)) * 100.0 + 0.5).toLong))
        else None
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Analytics.qTpchQ7(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got == want && got.nonEmpty)
    assert(got.keys.map(k => (k._1, k._2)).toSet.size == 2,
      "both directions of the pair must appear")
  }

  test("q_tpch_q8 market share equals the brute-force conditional ratio") {
    val asiaN = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSet
    val custAsia = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .filter(r => asiaN(r.getInt(1))).map(_.getLong(0)).toSet
    val ordInfo = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val suppN = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount")).collect()
      .flatMap { r =>
        val (ck, yr) = ordInfo(r.getLong(0))
        if (custAsia(ck)) Some((yr.toLong,
          suppN(r.getLong(1)) == 3,
          math.floor(r.getDouble(2) * (1.0 - r.getDouble(3)) * 100.0 + 0.5)
            .toLong))
        else None
      }
      .groupBy(_._1).view.mapValues { rs =>
        (rs.filter(_._2).map(_._3).sum, rs.map(_._3).sum)
      }.toMap
    val got = Analytics.qTpchQ8(spark, sfDir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (nc, tc) = want(r.getLong(0))
      assert(r.getLong(1) == nc && r.getLong(2) == tc, s"year ${r.getLong(0)}")
      assert(r.getDouble(3) == nc.toDouble / tc.toDouble)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0,
        "the share must be a real fraction")
    }
  }

  test("q_tpch_q9 equals the brute-force widget-family profit") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice")).collect()
      .filter(_.getString(1).contains("widget"))
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(2) * 10.0 + 0.5).toLong).toMap
    val natOf = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => r.getLong(0) -> natOf(r.getInt(1))).toMap
    val ordYear = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), year(col("o_orderdate"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .flatMap { r =>
        parts.get(r.getLong(1)).map { cost =>
          ((suppNat(r.getLong(2)), ordYear(r.getLong(0)).toLong),
            math.floor(r.getDouble(4) * (1.0 - r.getDouble(5)) * 100.0 + 0.5)
              .toLong - r.getDouble(3).toLong * cost)
        }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Analytics.qTpchQ9(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("q_tpch_q16 equals the brute-force reconstructed-partsupp supplier count") {
    val flagged = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
      .collect().map(_.getLong(0)).toSet
    val partAttr = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      .collect()
      .filter(r => r.getString(1) != "Brand#1" && r.getInt(3) < 15)
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3))))
      .toMap
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (pk, sk) => partAttr.contains(pk) && !flagged(sk) }
      .groupBy { case (pk, _) => partAttr(pk) }.view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    val got = Analytics.qTpchQ16(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(got == want && got.nonEmpty)
    assert(!got.keys.exists(_._1 == "Brand#1"))
  }

  test("q_tpch_q20 finds exactly the widget-heavy suppliers") {
    val widgets = Tables.part(spark, sfDir)
      .filter(col("p_name").contains("widget")).select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        year(col("l_shipdate"))).collect()
      .filter(_.getInt(3) == 1997)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2).toLong))
    val tot = li.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val wid = li.filter(r => widgets(r._1))
      .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val gw = wid.keys.map(wid).sum
    val gt = wid.keys.map(tot).sum
    val want = wid.keys.filter(s => 2L * wid(s) * gt > 3L * tot(s) * gw)
      .toSeq.sorted
    val got = Analytics.qTpchQ20(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSeq == want && got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(3) == wid(r.getLong(0)) &&
        r.getLong(4) == tot(r.getLong(0)))
    }
    assert(want.length < wid.size, "the share cut must be selective")
  }

  test("q_range_window equals the brute-force trailing-hour range frame") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))
    val byType = rows.groupBy(_._1)
    val got = graft.operators.Analytics.qRangeWindow(spark, sfDir).collect()
    assert(got.length == rows.length)
    got.foreach { r =>
      val (t, us) = (r.getString(0), r.getLong(2))
      val inFrame = byType(t).filter(e => e._3 >= us - 3600000000L && e._3 <= us)
      assert(r.getLong(3) == inFrame.map(_._4).sum, s"event ${r.getLong(1)} sum")
      assert(r.getLong(4) == inFrame.length.toLong, s"event ${r.getLong(1)} n")
    }
    // The frame must genuinely vary (uneven spacing is the point).
    assert(got.map(_.getLong(4)).distinct.length > 1)
  }

  test("q_locf forward-fills exactly the per-user last non-null value") {
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3) || r.getLong(1) % 5 == 0) None
        else Some(r.getDouble(3))))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      var lastSeen: Option[Double] = None
      rs.sortBy(r => (r._3, r._2)).toSeq.map { case (u, eid, _, v) =>
        if (v.isDefined) lastSeen = v
        (u, eid, v, lastSeen)
      }
    }.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val got = graft.operators.Analytics.qLocf(spark, sfDir).collect()
    assert(got.length == rows.length)
    var filled = 0
    got.foreach { r =>
      val (v, ff) = want((r.getLong(0), r.getLong(1)))
      assert((if (r.isNullAt(2)) None else Some(r.getDouble(2))) == v)
      val gotFf = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      assert(gotFf == ff, s"event ${r.getLong(1)}")
      if (v.isEmpty && gotFf.isDefined) filled += 1
    }
    assert(filled > 0, "the fill must actually replace some nulls")
  }

  test("q_calendar_dim spans the full range with zero-order days explicit") {
    val got = Analytics.qCalendarDim(spark, sfDir).collect()
    val daily = Tables.orders(spark, sfDir)
      .groupBy(graft.Tables.tsSeconds(date_trunc("day", col("o_orderdate")))
        .as("d"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // Continuous spine: one row per day, length = span of the range.
    assert(got.length >= daily.size)
    assert(got.map(_.getLong(1)).distinct.sorted.toSeq == (0L to 6L),
      "all seven weekdays appear")
    got.foreach { r =>
      val (n, c) = daily.getOrElse(r.getString(0), (0L, 0L))
      assert(r.getLong(5) == n && r.getLong(6) == c, r.getString(0))
      assert(r.getBoolean(2) == (r.getLong(1) >= 5L))
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 12L &&
        r.getLong(4) >= 1L && r.getLong(4) <= 4L)
    }
    assert(got.exists(_.getLong(5) == 0L) || got.length == daily.size,
      "zero-order days are explicit when the range has gaps")
  }

  test("q_grouping_id emits all four cube levels with the right masks") {
    val got = Analytics.qGroupingId(spark, sfDir).collect()
    val byGid = got.groupBy(_.getLong(4))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val total = byGid(3L)
    assert(total.length == 1 &&
      total(0).isNullAt(0) && total(0).isNullAt(1))
    val detailN = byGid(0L).map(_.getLong(2)).sum
    assert(detailN == total(0).getLong(2), "detail level sums to the total")
    assert(byGid(1L).forall(r => !r.isNullAt(0) && r.isNullAt(1)))
    assert(byGid(2L).forall(r => r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("q_percentile_disc picks exactly the nearest-rank elements") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      val sorted = rs.sortBy(r => (r._2, r._3)).map(_._2)
      def pick(q: Double) = sorted(math.ceil(q * sorted.length).toInt - 1)
      (pick(0.5), pick(0.9), pick(0.99))
    }.toMap
    val got = Analytics.qPercentileDisc(spark, sfDir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (p50, p90, p99) = want(r.getString(0))
      assert(r.getDouble(1) == p50 && r.getDouble(2) == p90 &&
        r.getDouble(3) == p99, r.getString(0))
      assert(r.getDouble(1) <= r.getDouble(2) &&
        r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("q_rolling_zscore equals the brute-force trailing-100 standardization") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2)).toSeq
      sorted.zipWithIndex.map { case ((t, eid, _, c), i) =>
        val frame = sorted.slice(math.max(0, i - 99), i + 1).map(_._4)
        val n = frame.length.toLong
        val s = frame.sum
        val ss = frame.map(x => x * x).sum
        val z = if (n >= 30 && n * ss > s * s)
          Some((c.toDouble - s.toDouble / n.toDouble) /
            math.sqrt((ss.toDouble - s.toDouble * s.toDouble / n.toDouble) /
              n.toDouble))
        else None
        (t, eid, c, n, z)
      }
    }.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val got = Analytics.qRollingZscore(spark, sfDir).collect()
    assert(got.length == want.size && got.nonEmpty)
    var scored = 0
    got.foreach { r =>
      val (c, n, z) = want((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == c && r.getLong(3) == n, s"event ${r.getLong(1)}")
      val gz = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      assert(gz == z, s"event ${r.getLong(1)} z")
      if (gz.isDefined) scored += 1
    }
    assert(scored > 0 && scored < got.length,
      "warmup must suppress early rows and score mature ones")
  }

  test("q_cume_dist stamps each row with its peer-inclusive CDF position") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val byType = rows.groupBy(_._1)
    val got = Analytics.qCumeDist(spark, sfDir).collect()
    assert(got.length == rows.length)
    got.foreach { r =>
      val peers = byType(r.getString(0))
      val le = peers.count(_._3 <= r.getLong(2)).toLong
      assert(r.getDouble(3) == le.toDouble / peers.length.toDouble,
        s"event ${r.getLong(1)}")
    }
    // Ties share one position (the peer semantics percent_rank lacks).
    val tied = got.groupBy(r => (r.getString(0), r.getLong(2)))
      .values.find(_.length > 1)
    tied.foreach(g => assert(g.map(_.getDouble(3)).distinct.length == 1))
  }

  test("q_target_encode LOO encodings match brute force") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val byG = rows.groupBy(_._2)
    val sG = byG.view.mapValues(_.map(_._3).sum).toMap
    val nG = byG.view.mapValues(_.size.toLong).toMap
    val s = rows.map(_._3).sum
    val n = rows.length.toLong
    val got = Analytics.qTargetEncode(spark, sfDir).collect()
    assert(got.length == rows.length)
    val expect = rows.map { case (id, g, c) =>
      id -> (((sG(g) - c).toDouble + 20.0 * (s.toDouble / n.toDouble)) /
        ((nG(g) - 1).toDouble + 20.0))
    }.toMap
    got.foreach(r =>
      assert(r.getDouble(2) == expect(r.getLong(0)), s"event ${r.getLong(0)}"))
    // Two rows of the same category with different targets must encode
    // differently (the LOO exclusion is real, not a per-category constant).
    val byCat = got.groupBy(_.getString(1)).head._2.map(_.getDouble(2))
    assert(byCat.distinct.length > 1, "LOO must vary within a category")
  }

  test("q_bloom_join: bloom prunes in the plan, result equals the plain join") {
    import org.apache.spark.sql.functions._
    val df = Analytics.qBloomJoin(spark, sfDir)
    // The bloom must actually be in the physical plan — as a
    // might_contain predicate evaluated on the fact side.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom predicate missing from plan")
    val cents = floor((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      * lit(100.0) + lit(0.5)).cast("long")
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"), sum(cents).as("revenue_cents"))
      .orderBy(col("l_returnflag")).collect()
    val got = df.collect()
    assert(got.length == expected.length && got.length > 0)
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getLong(1) == e.getLong(1) && g.getLong(2) == e.getLong(2))
    }
  }

  test("q_hits equals brute-force two-iteration degree convolution") {
    import org.apache.spark.sql.functions._
    val edges = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"))
      .join(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val auth1 = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val hub1 = edges.groupBy(_._1).view
      .mapValues(_.map(e => auth1(e._2)).sum).toMap
    val auth2 = edges.groupBy(_._2).view
      .mapValues(_.map(e => hub1(e._1)).sum).toMap
    val expected = auth2.toSeq.map { case (p, a2) => (p, auth1(p), a2) }
      .sortBy { case (p, _, a2) => (-a2, p) }.take(20)
    val got = Analytics.qHits(spark, sfDir).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (p, a1, a2)) =>
      assert(r.getLong(0) == p, s"rank order: got ${r.getLong(0)} want $p")
      assert(r.getLong(1) == a1 && r.getLong(2) == a2)
    }
    // Mutual reinforcement must actually reorder somewhere: the top-20 by
    // authority2 must differ from the top-20 by raw in-degree, or the
    // second iteration added nothing on this graph.
    val byDeg = auth1.toSeq.sortBy { case (p, a1) => (-a1, p) }
      .take(20).map(_._1)
    assert(got.map(_.getLong(0)).toSeq != byDeg)
  }


  test("q_bloom_fpr replays the 63-bit-word bloom build and probe brute-force") {
    import java.security.MessageDigest
    val m = Analytics.BloomWords * 63
    def h(key: Long, i: Int): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"$key#$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % m
    }
    val keys = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val words = scala.collection.mutable.Map[Long, Long]()
    keys.foreach { k =>
      (1 to Analytics.BloomHashes).foreach { i =>
        val hv = h(k, i)
        words(hv / 63) = words.getOrElse(hv / 63, 0L) | (1L << (hv % 63).toInt)
      }
    }
    val mk = keys.max
    var falsePos = 0L
    ((mk + 1) to (mk + Analytics.BloomProbes)).foreach { k =>
      val allHit = (1 to Analytics.BloomHashes).forall { i =>
        val hv = h(k, i)
        (words.getOrElse(hv / 63, 0L) & (1L << (hv % 63).toInt)) != 0L
      }
      if (allHit) falsePos += 1
    }
    val bitsSet = words.values.map(java.lang.Long.bitCount(_).toLong).sum
    val r = Analytics.qBloomFpr(spark, sfDir).collect().head
    assert(r.getLong(0) == Analytics.BloomProbes.toLong)
    assert(r.getLong(1) == falsePos, "false positive count")
    assert(r.getDouble(2) == falsePos.toDouble / Analytics.BloomProbes.toDouble)
    assert(r.getLong(3) == bitsSet, "bits set")
    assert(r.getDouble(4) == bitsSet.toDouble / m.toDouble)
    // sanity against theory: measured FPR within an order of magnitude of
    // (1 - e^(-kn/m))^k (loose band - small-sample noise dominates)
    val expected = math.pow(1.0 -
      math.exp(-Analytics.BloomHashes.toDouble * keys.length / m), Analytics.BloomHashes)
    assert(r.getDouble(2) <= expected * 20 + 0.002,
      s"measured ${r.getDouble(2)} vs theory $expected")
  }
}
