package graft

import graft.operators.Ranking
import org.apache.spark.sql.functions._

/** Tests for the ranking/retrieval-metric surface. Beyond the driver's
  * DuckDB hash gate, each statistic is re-derived here by an independent
  * brute-force computation on collected fixture rows (tiny at sf0.001), so
  * a bug that happened to be mirrored in the oracle SQL would still be
  * caught.
  */
class RankingSpec extends SparkSpec {

  test("q_auc equals the brute-force tie-aware pair count") {
    val rows = Tables.events(spark, sfDir)
      .select(col("value"), col("event_type")).collect()
      .map(r => (r.getDouble(0), r.getString(1) == "purchase"))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    var u2 = 0L
    for (p <- pos; n <- neg)
      u2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val expected = u2.toDouble / (2.0 * (pos.length.toDouble * neg.length.toDouble))
    val got = Ranking.qAuc(spark, sfDir).collect().head
    assert(got.getLong(0) == pos.length && got.getLong(1) == neg.length)
    assert(got.getLong(2) == u2, s"u2: got ${got.getLong(2)} want $u2")
    assert(got.getDouble(3) == expected)
  }

  test("q_bm25 matches a from-scratch BM25 on the top document") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = Ranking.Bm25Terms
      .map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    def score(toks: Seq[String]): Double = {
      val dl = toks.length.toDouble
      Ranking.Bm25Terms.sorted.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
      }.foldLeft(0.0)(_ + _)
    }
    val got = Ranking.qBm25(spark, sfDir).collect()
    assert(got.length > 1)
    // Engine order must be exactly score-desc over the hand scores.
    val handTop = docs.map { case (id, t) => (id, score(t)) }
      .filter(_._2 > 0.0).sortBy { case (id, s) => (-s, id) }.take(got.length)
    got.zip(handTop).foreach { case (r, (id, s)) =>
      assert(r.getLong(0) == id, s"rank order: got doc ${r.getLong(0)} want $id")
      assert(math.abs(r.getDouble(2) - s) < 1e-12,
        s"doc $id: got ${r.getDouble(2)} want $s")
    }
  }

  test("q_ndcg is in [0,1] with idcg >= dcg, and covers every event_type") {
    val got = Ranking.qNdcg(spark, sfDir).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(idcg >= dcg, s"${r.getString(0)}: idcg $idcg < dcg $dcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"${r.getString(0)}: ndcg $ndcg")
    }
  }

  test("q_rank_fusion: rrf bounded by list membership, ranks are 1-based and dense") {
    val got = Ranking.qRankFusion(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ra = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rb = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(ra.nonEmpty || rb.nonEmpty)
      val expected = ra.map(x => 1.0 / (Ranking.RrfK + x)).getOrElse(0.0) +
        rb.map(x => 1.0 / (Ranking.RrfK + x)).getOrElse(0.0)
      assert(r.getDouble(3) == expected)
      (ra.toSeq ++ rb.toSeq).foreach(x =>
        assert(x >= 1 && x <= Ranking.RrfDepth))
    }
    // Descending fused order.
    got.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) >= b.getDouble(3))
      case _           => ()
    }
  }

  test("q_mrr equals the brute-force first-relevant reciprocal rank") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3)).toLong % 4L >= 2L))
    val want = rows.groupBy(_._1).map { case (t, rs) =>
      val ranked = rs.sortBy(r => (-r._3, -r._2))
        .take(graft.operators.Ranking.MrrK)
      val firstPos = ranked.indexWhere(_._4) match {
        case -1 => None
        case i  => Some(i + 1)
      }
      val hit = ranked.take(graft.operators.Ranking.HitK).exists(_._4)
      t -> ((firstPos, firstPos.map(p => 1.0 / p.toDouble).getOrElse(0.0), hit))
    }
    val got = graft.operators.Ranking.qMrr(spark, sfDir).collect()
    assert(got.nonEmpty && got.length == want.size)
    got.foreach { r =>
      val (fp, rr, hit) = want(r.getString(0))
      val gfp = if (r.isNullAt(1)) None else Some(r.getInt(1))
      assert(gfp == fp, s"${r.getString(0)} first_pos")
      assert(r.getDouble(2) == rr, s"${r.getString(0)} rr")
      assert(r.getBoolean(3) == hit, s"${r.getString(0)} hit_at_k")
    }
    // Non-vacuous: at least one type has an early hit.
    assert(got.exists(r => !r.isNullAt(1)))
  }

  test("q_map equals the brute-force average precision at K") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3)).toLong % 4L >= 2L))
    val want = rows.groupBy(_._1).map { case (t, rs) =>
      val ranked = rs.sortBy(r => (-r._3, -r._2)).take(graft.operators.Ranking.MapK)
      var hits = 0L
      var s = 0.0
      ranked.zipWithIndex.foreach { case ((_, _, _, rel), i) =>
        if (rel) {
          hits += 1
          s += hits.toDouble / (i + 1).toDouble
        }
      }
      t -> ((hits, if (hits > 0) s / hits.toDouble else Double.NaN))
    }
    val got = graft.operators.Ranking.qMap(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nRel, ap) = want(r.getString(0))
      assert(r.getLong(1) == nRel, s"${r.getString(0)} n_rel")
      assert(r.getDouble(2) == ap, s"${r.getString(0)} ap")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("q_rbo replays the ranked-overlap geometric fold brute-force") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_extendedprice"), col("l_discount")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val early = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        col("o_orderdate") < lit("1998-01-01").cast("timestamp")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val rev = scala.collection.mutable.Map[(Boolean, Long), Long]()
    li.foreach { case (ok, pk, p, disc) =>
      early.get(ok).foreach { e =>
        val cents = math.floor(p * (1.0 - disc) * 100.0 + 0.5).toLong
        rev((e, pk)) = rev.getOrElse((e, pk), 0L) + cents
      }
    }
    def top(e: Boolean): Map[Long, Int] =
      rev.collect { case ((s, pk), v) if s == e => (pk, v) }.toSeq
        .sortBy { case (pk, v) => (-v, pk) }.take(Ranking.RboDepth)
        .zipWithIndex.map { case ((pk, _), i) => pk -> (i + 1) }.toMap
    val (ta, tb) = (top(true), top(false))
    val ovk = (1 to Ranking.RboDepth).map { k =>
      k -> ta.count { case (pk, ra) => ra <= k && tb.get(pk).exists(_ <= k) }
        .toLong
    }
    var acc = 0.0
    ovk.foreach { case (k, ov) =>
      acc += (Ranking.RboWeights(k - 1) * ov.toDouble) / k.toDouble
    }
    val rbo = (1.0 - Ranking.RboPhi) * acc
    val got = Ranking.qRbo(spark, sfDir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getDouble(0) == rbo, "rbo fold")
    assert(r.getLong(1) == ovk.last._2, "overlap at depth")
    assert(r.getDouble(2) == ovk.last._2.toDouble / Ranking.RboDepth.toDouble)
    assert(rbo >= 0.0 && rbo <= 1.0)
    // prefix-overlap counts are monotone non-decreasing in k
    ovk.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(a <= b) }
  }

}
