package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Retrieval ranking + ranking-evaluation operators (SURVEY.md §2e
  * extensions): BM25 scoring, reciprocal-rank fusion, NDCG and AUC — the
  * quality/retrieval metrics a training-data curation pipeline computes
  * over its corpus and its event logs. The reference surfaces only a
  * single "latest row" insight (/root/reference/app.py:211); these are the
  * ranking analogs a data engine needs once documents and interaction
  * logs are first-class.
  *
  * Determinism contract (the hash gate): every score is assembled from
  * EXACT integer aggregates (term/document counts, ranks, relevance
  * grades) by ONE literal parenthesization mirrored in the oracle SQL,
  * logs go through the libm-exact [[graft.functions.LnLibm]], and any
  * per-group sum of doubles is an ORDERED fold (`sort_array` +
  * `aggregate` from an explicit 0.0), never a partitioning-dependent
  * `sum(double)`.
  */
object Ranking {

  private def lnLibm(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.LnLibm(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Fixed query-term set for [[qBm25]] — spans the fixture vocabulary's
    * document-frequency range (common / mid / rare) so the IDF spread is
    * exercised.
    */
  val Bm25Terms: Seq[String] = Seq("spark", "stream", "vector")

  /** BM25 k1 (term-frequency saturation) and b (length normalization) —
    * the standard Robertson defaults. k1+1 is pinned as the LITERAL 2.2
    * rather than computed: `1.2 + 1.0` in binary sits a half-ulp from the
    * parsed literal `2.2` the oracle uses, and the hash gate compares
    * bits.
    */
  val Bm25K1 = 1.2
  val Bm25K1Plus1 = 2.2
  val Bm25B  = 0.75
  val Bm25OneMinusB = 0.25

  /** q_bm25 — BM25 relevance of every document against the fixed query
    * [[Bm25Terms]], top-20: the standard lexical-retrieval score, and the
    * usual sparse half of a hybrid (BM25 + embedding) retrieval stack.
    *
    * Plan shape: tokenize/explode with the query-term filter pushed
    * BELOW the (doc, term) aggregation — only matching postings survive
    * the explode, so the tf table is |matches| rows, not |tokens|; df is
    * a second map-side-partial agg over tf (≤ |terms| rows); doc lengths
    * are a per-row `size` off the scan; corpus stats (N, Σdl) are a
    * 1-row broadcast. Top-20 is TakeOrderedAndProject. At 100 TB nothing
    * shuffles more than the matching postings — the inverted-index
    * access pattern, expressed relationally.
    *
    * Determinism: tf/df/dl/N are exact integers; idf =
    * ln(1 + (N − df + 0.5)/(df + 0.5)) via [[lnLibm]]; the per-term
    * scores are summed per doc by an ordered fold keyed on the term.
    */
  def qBm25(spark: SparkSession, d: String): DataFrame = {
    val toks = documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = lnLibm(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val termScore = idf *
      ((col("tf").cast("double") * lit(Bm25K1Plus1)) /
        (col("tf").cast("double") + lit(Bm25K1) *
          (lit(Bm25OneMinusB) + lit(Bm25B) * (col("dl").cast("double") / avgdl))))
    tf.join(df, "term").join(dl, "doc_id").crossJoin(broadcast(stats))
      .select(col("doc_id"), termScore.as("term_score"), col("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sort_array(collect_list(struct(col("term"), col("term_score")))).as("tt"))
      .select(col("doc_id"), col("n_terms"),
        expr("aggregate(tt, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term_score)")
          .as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** RRF constant (Cormack et al.'s 60) and the per-list candidate depth. */
  val RrfK = 60
  val RrfDepth = 100

  /** q_rank_fusion — reciprocal-rank fusion of two document rankings
    * (by `n_chars` and by token count), the standard way a hybrid
    * retrieval stack merges heterogeneous scorers without calibrating
    * their score scales: rrf(d) = Σ_lists 1/(60 + rank_list(d)).
    *
    * Scale shape: each list is cut to its top-[[RrfDepth]] FIRST via
    * TakeOrderedAndProject (k rows cross the wire — never a global
    * sort), and `row_number` then runs over k rows, so the unpartitioned
    * window is O(k) by construction, not O(corpus). The fusion join is
    * k-vs-k. This is exactly how RRF behaves in production: you fuse
    * candidate lists, not entire corpora.
    *
    * Determinism: ranks are exact integers with total-order tie-breaks
    * (metric desc, doc_id), so the reciprocal terms are identical
    * doubles, summed in one fixed order (list-A term + list-B term).
    */
  def qRankFusion(spark: SparkSession, d: String): DataFrame = {
    val docs = documents(spark, d)
    def ranked(metric: Column, rankName: String): DataFrame =
      docs.select(col("doc_id"), metric.as("m"))
        .orderBy(col("m").desc, col("doc_id"))
        .limit(RrfDepth)
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("m").desc, col("doc_id")))
            .cast("long").as(rankName))
    val a = ranked(col("n_chars"), "ra")
    val b = ranked(size(split(col("text"), " ")).cast("long"), "rb")
    def term(r: Column): Column =
      coalesce(lit(1.0) / (lit(RrfK.toLong) + r).cast("double"), lit(0.0))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("ra"), col("rb"),
        (term(col("ra")) + term(col("rb"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** NDCG cutoff. */
  val NdcgK = 10

  /** q_ndcg — ranking evaluation: NDCG@10 per event_type, where the
    * "system ranking" is recency (ts desc) and graded relevance is
    * derived from the row (rel = floor(value) mod 4 ∈ {0..3}) — the
    * offline ranking-quality metric every search/reco pipeline reports.
    * DCG uses the ln-based gain Σ (2^rel − 1)/ln(pos + 1) (a constant
    * rescale of the log2 form, monotone-identical).
    *
    * Plan: both the system and ideal rankings are per-group
    * `row_number` windows PARTITIONED by event_type (parallel across
    * groups — no global sort), cut at k=10, then ordered folds over ≤10
    * position terms. At 100 TB the window cost is a per-group sort the
    * grouping shuffle already pays for; only 2·k rows per group survive.
    *
    * Determinism: relevance grades are exact integers (floor of a double
    * is exact, mod on BIGINT), gains 2^rel − 1 are exact small integers,
    * positions are total-ordered (ts desc, event_id desc — fixture ts
    * are µs-aligned and distinct, so Spark's µs and DuckDB's ns
    * orderings agree), denominators go through [[lnLibm]], and both DCG
    * folds run in position order.
    */
  def qNdcg(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .select(col("event_type"), col("event_id"), col("ts"),
        (floor(col("value")) % lit(4L)).as("rel"))
    def dcgAt(orderCols: Seq[Column], name: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(orderCols: _*)
      ev.withColumn("pos", row_number().over(w))
        .filter(col("pos") <= NdcgK)
        .select(col("event_type"), col("pos"),
          ((pow(lit(2.0), col("rel").cast("double")) - lit(1.0)) /
            lnLibm((col("pos") + lit(1)).cast("double"))).as("term"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("pos"), col("term")))).as("pt"))
        .select(col("event_type"),
          expr("aggregate(pt, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)")
            .as(name))
    }
    val dcg  = dcgAt(Seq(col("ts").desc, col("event_id").desc), "dcg")
    val idcg = dcgAt(Seq(col("rel").desc, col("event_id").asc), "idcg")
    dcg.join(idcg, "event_type")
      .select(col("event_type"), col("dcg"), col("idcg"),
        when(col("idcg") > lit(0.0), col("dcg") / col("idcg")).as("ndcg"))
      .orderBy(col("event_type"))
  }

  /** q_auc — ROC AUC of `value` as a score predicting
    * event_type = 'purchase', via the tie-corrected Mann–Whitney
    * rank-sum — the standard offline metric for a binary relevance /
    * quality classifier, computed exactly and at scale.
    *
    * Plan: aggregate FIRST to a per-distinct-score histogram
    * (map-side-partial groupBy — the only pass over the data), then a
    * prefix-sum window over the histogram. The unpartitioned window runs
    * over |distinct scores| rows, not |events| — at 100 TB the histogram
    * of a bounded-precision score column is orders of magnitude smaller
    * than the log (and if it weren't, the same prefix sum range-partitions
    * into per-range partials + a broadcast of range offsets).
    *
    * Determinism: everything up to the last line is BIGINT — the
    * tie-correction is folded in exactly by counting DOUBLED wins
    * (2·np·cum_nn for strict wins + np·nn for ties), so AUC =
    * u2 / (2·npos·nneg) involves exactly one double division.
    */
  def qAuc(spark: SparkSession, d: String): DataFrame = {
    val h = events(spark, d)
      .select(col("value").as("v"),
        when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)).as("p"))
      .groupBy(col("v"))
      .agg(sum(col("p")).as("np"), sum(lit(1L) - col("p")).as("nn"))
    val cum = h.withColumn("cum_nn",
      coalesce(
        sum(col("nn")).over(
          Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    cum.agg(
        sum(col("np")).cast("long").as("npos"),
        sum(col("nn")).cast("long").as("nneg"),
        sum(lit(2L) * col("np") * col("cum_nn") + col("np") * col("nn"))
          .cast("long").as("u2"))
      .select(col("npos"), col("nneg"), col("u2"),
        when(col("npos") > 0L && col("nneg") > 0L,
          col("u2").cast("double") /
            (lit(2.0) * (col("npos").cast("double") * col("nneg").cast("double"))))
          .as("auc"))
  }

  /** [[qMap]] ranking depth — deeper than [[NdcgK]] so the precision
    * terms mix early and late hits. */
  val MapK = 100

  /** q_map — average precision at [[MapK]] per event type (binary
    * relevance rel ≥ 2 on [[qNdcg]]'s graded scale): the third standard
    * ranking metric next to [[qNdcg]] (graded, position-discounted) and
    * [[qAuc]] (threshold-free pairwise) — AP is what rewards putting ALL
    * relevant items early, the recall-oriented serving metric. AP =
    * (Σ_{k: rel_k} hits_k / k) / |relevant in top K|.
    *
    * Plan: one ranking window + one cumulative-hits window over the SAME
    * per-type partitioning (a single sort pays both), cut to K rows per
    * type, then a type-sized aggregate. Each precision term hits_k/k is
    * a single exact-integer division; the cross-position Σ is a
    * pos-ORDERED fold mirrored by the oracle's list_reduce.
    */
  def qMap(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, d)
      .select(col("event_type"), col("event_id"), col("ts"),
        (floor(col("value")) % lit(4L) >= lit(2L)).as("rel"))
      .withColumn("pos", row_number().over(w))
      .withColumn("hits", sum(when(col("rel"), 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("pos") <= MapK)
      .groupBy(col("event_type"))
      .agg(sum(when(col("rel"), 1L).otherwise(0L)).as("n_rel"),
        sort_array(collect_list(when(col("rel"),
          struct(col("pos"), (col("hits").cast("double") /
            col("pos").cast("double")).as("p"))))).as("terms"))
      .select(col("event_type"), col("n_rel"),
        when(col("n_rel") > 0L,
          expr("aggregate(terms, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.p)")
            / col("n_rel").cast("double")).as("ap"))
      .orderBy(col("event_type"))
  }

  /** [[qMrr]] evaluation depth and the hit-rate cut. */
  val MrrK = 100
  val HitK = 10

  /** q_mrr — mean-reciprocal-rank + hit-rate@[[HitK]] per event type
    * over the recency ranking: the position of the FIRST relevant item
    * (the metric for known-item search / "did the top of the feed have
    * anything good"), completing the ranking-metric battery — nDCG
    * (graded, discounted), AP (all relevant early), AUC (pairwise),
    * MRR (first hit). Same ranking and binary-relevance convention as
    * [[qMap]], so the four metrics are directly comparable per type.
    *
    * Plan: one type-keyed ranking window (the same single sort every
    * metric here pays), cut at [[MrrK]], then a type-sized aggregate —
    * first_pos = MIN over relevant positions, so no second window.
    * rr = 1/first_pos is one exact division; empty types score 0 by
    * the usual MRR convention.
    */
  def qMrr(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, d)
      .select(col("event_type"), col("event_id"), col("ts"),
        (floor(col("value")) % lit(4L) >= lit(2L)).as("rel"))
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= MrrK)
      .groupBy(col("event_type"))
      .agg(min(when(col("rel"), col("pos"))).as("first_pos"),
        sum(when(col("rel") && col("pos") <= HitK, 1L).otherwise(0L))
          .as("n_hits_at_k"))
      .select(col("event_type"), col("first_pos"),
        when(col("first_pos").isNotNull,
          lit(1.0) / col("first_pos").cast("double"))
          .otherwise(lit(0.0)).as("rr"),
        (col("n_hits_at_k") > 0L).as("hit_at_k"))
      .orderBy(col("event_type"))
  }

  /** RBO persistence and evaluation depth for [[qRbo]]. */
  val RboPhi   = 0.9
  val RboDepth = 20

  /** Weight table φ^(k−1), k = 1..[[RboDepth]], built by REPEATED IEEE
    * multiplication (not `pow`, whose last-ulp rounding differs across
    * libms) and shared VERBATIM with the oracle: the Spark side embeds
    * these doubles as literals, the SQL side embeds their shortest
    * round-trip decimal form (`Double.toString`), which every IEEE-754
    * parser recovers bit-exactly.
    */
  val RboWeights: Array[Double] =
    Array.iterate(1.0, RboDepth)(_ * RboPhi)

  /** q_rbo — Rank-Biased Overlap (Webber–Moffat–Zobel 2010) between the
    * part-revenue ranking of the EARLY order-date half (< 1998-01-01)
    * and the LATE half: RBO@d = (1−φ)·Σₖ φ^(k−1)·|A₁..ₖ ∩ B₁..ₖ|/k, the
    * top-weighted rank-stability metric search teams use to compare two
    * rankers — Kendall/Spearman ([[Stats.qKendallTau]]) weight every
    * position equally and need CONJOINT lists; RBO weights the head
    * geometrically and is defined on two different top-k lists, which is
    * what real before/after ranking comparisons have.
    *
    * Determinism: revenues are exact BIGINT cents (`floor(p·(1−d)·100 +
    * 0.5)` at the scan), so both rankings and every prefix-overlap count
    * are integers; the only doubles are the [[RboWeights]] literals and
    * the k-ordered fold Σ (wₖ·ov)/k — ordered `aggregate` ⇔ DuckDB
    * `list_reduce` ORDER BY k, one pinned parenthesization.
    *
    * Plan: lineitem collapses per (half, part) in ONE join+agg pass
    * (broadcast the orders date spine — no, orders is the BIG side's
    * probe: the join is on orderkey, shuffle-colocated); each half's
    * top-[[RboDepth]] is a TakeOrderedAndProject HEAP (never a global
    * sort), and everything after is ≤ 2·depth rows: the depth×pairs
    * overlap grid is 20×40, driver-free and volume-independent. The
    * depth/φ pair is the head-weight knob — deepen d, raise φ for
    * flatter emphasis.
    */
  def qRbo(spark: SparkSession, d: String): DataFrame = {
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      lit(100.0) + lit(0.5)).cast("long")
    val li = lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"),
      cents.as("cents"))
    val od = orders(spark, d).select(col("o_orderkey"),
      (col("o_orderdate") < lit("1998-01-01").cast("timestamp")).as("early"))
    val rev = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("early"), col("l_partkey"))
      .agg(sum(col("cents")).as("rev"))
    def top(side: Boolean, rk: String) = {
      val w = Window.orderBy(col("rev").desc, col("l_partkey"))
      rev.filter(col("early") === side)
        .withColumn(rk, row_number().over(w))
        .filter(col(rk) <= RboDepth)
        .select(col("l_partkey"), col(rk))
    }
    val joined = top(side = true, "ra").join(top(side = false, "rb"),
      Seq("l_partkey"), "full_outer")
    val ov = joined
      .select(col("ra"), col("rb"),
        explode(sequence(lit(1), lit(RboDepth))).as("k"))
      .groupBy(col("k"))
      .agg(sum(when(col("ra") <= col("k") && col("rb") <= col("k"), 1L)
        .otherwise(0L)).as("ov"))
    val wArr = array(RboWeights.map(lit(_)): _*)
    ov.select(col("k"), col("ov"),
        ((element_at(wArr, col("k")) * col("ov").cast("double")) /
          col("k").cast("double")).as("term"))
      .agg(sort_array(collect_list(struct(col("k"), col("term")))).as("ts"),
        max(when(col("k") === RboDepth, col("ov"))).as("ov_at_d"))
      .select(
        (lit(1.0 - RboPhi) *
          expr("aggregate(ts, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"))
          .as("rbo"),
        col("ov_at_d"),
        (col("ov_at_d").cast("double") / lit(RboDepth.toDouble))
          .as("agreement_at_d"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rbo"         -> qRbo _,
    "q_bm25"        -> qBm25 _,
    "q_rank_fusion" -> qRankFusion _,
    "q_ndcg"        -> qNdcg _,
    "q_map"         -> qMap _,
    "q_mrr"         -> qMrr _,
    "q_auc"         -> qAuc _,
  )

  val oracle: Map[String, String] = Map(
    "q_rbo" ->
      s"""WITH li AS (
         |  SELECT l_orderkey, l_partkey,
         |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
         |           + 0.5) AS BIGINT) AS cents
         |  FROM lineitem
         |), rev AS (
         |  SELECT (o_orderdate < TIMESTAMP '1998-01-01') AS early, l_partkey,
         |         CAST(SUM(cents) AS BIGINT) AS rev
         |  FROM li JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY early, l_partkey
         |), ta AS (
         |  SELECT l_partkey, rk AS ra FROM (
         |    SELECT l_partkey,
         |           CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey)
         |             AS INT) AS rk
         |    FROM rev WHERE early) WHERE rk <= $RboDepth
         |), tb AS (
         |  SELECT l_partkey, rk AS rb FROM (
         |    SELECT l_partkey,
         |           CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey)
         |             AS INT) AS rk
         |    FROM rev WHERE NOT early) WHERE rk <= $RboDepth
         |), j AS (
         |  SELECT ra, rb FROM ta FULL JOIN tb USING (l_partkey)
         |), ov AS (
         |  SELECT k, CAST(SUM(CASE WHEN ra <= k AND rb <= k THEN 1 ELSE 0 END)
         |           AS BIGINT) AS ov
         |  FROM (SELECT ra, rb, unnest(generate_series(1, $RboDepth)) AS k
         |        FROM j)
         |  GROUP BY k
         |), terms AS (
         |  SELECT k, ov,
         |         (list_extract([${RboWeights.mkString(", ")}], k)
         |           * CAST(ov AS DOUBLE)) / CAST(k AS DOUBLE) AS term
         |  FROM ov
         |)
         |SELECT ${1.0 - RboPhi} * list_reduce(
         |         list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY k)),
         |         (acc, x) -> acc + x) AS rbo,
         |       MAX(CASE WHEN k = $RboDepth THEN ov END) AS ov_at_d,
         |       CAST(MAX(CASE WHEN k = $RboDepth THEN ov END) AS DOUBLE)
         |         / $RboDepth.0 AS agreement_at_d
         |FROM terms""".stripMargin,
    "q_mrr" ->
      s"""WITH ev AS (
         |  SELECT event_type, event_id, ts,
         |         (CAST(floor(value) AS BIGINT) % 4 >= 2) AS rel
         |  FROM events
         |), ranked AS (
         |  SELECT event_type, rel,
         |         row_number() OVER (PARTITION BY event_type
         |                            ORDER BY ts DESC, event_id DESC) AS pos
         |  FROM ev
         |)
         |SELECT event_type,
         |       MIN(CASE WHEN rel THEN pos END) AS first_pos,
         |       CASE WHEN MIN(CASE WHEN rel THEN pos END) IS NOT NULL
         |            THEN 1.0 / CAST(MIN(CASE WHEN rel THEN pos END)
         |                            AS DOUBLE)
         |            ELSE 0.0 END AS rr,
         |       CAST(SUM(CASE WHEN rel AND pos <= $HitK THEN 1 ELSE 0 END)
         |            AS BIGINT) > 0 AS hit_at_k
         |FROM ranked WHERE pos <= $MrrK
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_map" ->
      s"""WITH ev AS (
         |  SELECT event_type, event_id, ts,
         |         (CAST(floor(value) AS BIGINT) % 4 >= 2) AS rel
         |  FROM events
         |), ranked AS (
         |  SELECT event_type, rel,
         |         row_number() OVER w AS pos,
         |         SUM(CASE WHEN rel THEN 1 ELSE 0 END) OVER
         |           (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hits
         |  FROM ev
         |  WINDOW w AS (PARTITION BY event_type ORDER BY ts DESC, event_id DESC)
         |)
         |SELECT event_type,
         |       CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
         |       CASE WHEN SUM(CASE WHEN rel THEN 1 ELSE 0 END) > 0 THEN
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list(CAST(hits AS DOUBLE) / CAST(pos AS DOUBLE)
         |                ORDER BY pos) FILTER (WHERE rel)),
         |           (acc, x) -> acc + x)
         |           / CAST(CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
         |               AS DOUBLE)
         |       END AS ap
         |FROM ranked WHERE pos <= $MapK
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_bm25" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |dl AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl FROM tok),
         |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
         |tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest(l) AS term FROM tok)
         |  WHERE term IN ('spark', 'stream', 'vector')
         |  GROUP BY doc_id, term
         |), df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |t AS (
         |  SELECT tf.doc_id, tf.term,
         |         ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |                   / (CAST(df AS DOUBLE) + 0.5))
         |         * ((CAST(tf AS DOUBLE) * 2.2)
         |            / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
         |               * (CAST(dl AS DOUBLE)
         |                  / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
         |           AS term_score
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         |)
         |SELECT doc_id, COUNT(*) AS n_terms,
         |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |         list(term_score ORDER BY term)), (acc, x) -> acc + x) AS bm25
         |FROM t GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q_rank_fusion" ->
      s"""WITH a AS (
         |  SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY m DESC, doc_id) AS BIGINT) AS ra
         |  FROM (SELECT doc_id, n_chars AS m FROM documents
         |        ORDER BY m DESC, doc_id LIMIT $RrfDepth)
         |), b AS (
         |  SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY m DESC, doc_id) AS BIGINT) AS rb
         |  FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS m
         |        FROM documents ORDER BY m DESC, doc_id LIMIT $RrfDepth)
         |)
         |SELECT doc_id, ra, rb,
         |       COALESCE(1.0 / CAST($RrfK + ra AS DOUBLE), 0.0)
         |         + COALESCE(1.0 / CAST($RrfK + rb AS DOUBLE), 0.0) AS rrf
         |FROM a FULL OUTER JOIN b USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q_ndcg" ->
      s"""WITH ev AS (
         |  SELECT event_type, event_id, ts,
         |         CAST(floor(value) AS BIGINT) % 4 AS rel
         |  FROM events
         |), sys AS (
         |  SELECT event_type, pos,
         |         (power(2.0, CAST(rel AS DOUBLE)) - 1.0)
         |           / ln(CAST(pos + 1 AS DOUBLE)) AS term
         |  FROM (SELECT event_type, rel,
         |               row_number() OVER (PARTITION BY event_type
         |                                  ORDER BY ts DESC, event_id DESC) AS pos
         |        FROM ev) WHERE pos <= $NdcgK
         |), ideal AS (
         |  SELECT event_type, pos,
         |         (power(2.0, CAST(rel AS DOUBLE)) - 1.0)
         |           / ln(CAST(pos + 1 AS DOUBLE)) AS term
         |  FROM (SELECT event_type, rel,
         |               row_number() OVER (PARTITION BY event_type
         |                                  ORDER BY rel DESC, event_id) AS pos
         |        FROM ev) WHERE pos <= $NdcgK
         |), dcg AS (
         |  SELECT event_type,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list(term ORDER BY pos)), (acc, x) -> acc + x) AS dcg
         |  FROM sys GROUP BY event_type
         |), idcg AS (
         |  SELECT event_type,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list(term ORDER BY pos)), (acc, x) -> acc + x) AS idcg
         |  FROM ideal GROUP BY event_type
         |)
         |SELECT event_type, dcg, idcg,
         |       CASE WHEN idcg > 0.0 THEN dcg / idcg END AS ndcg
         |FROM dcg JOIN idcg USING (event_type) ORDER BY event_type""".stripMargin,
    "q_auc" ->
      """WITH h AS (
        |  SELECT value AS v,
        |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
        |         SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS nn
        |  FROM events GROUP BY value
        |), c AS (
        |  SELECT np, nn,
        |         COALESCE(SUM(nn) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
        |  FROM h
        |), agg AS (
        |  SELECT CAST(SUM(np) AS BIGINT) AS npos, CAST(SUM(nn) AS BIGINT) AS nneg,
        |         CAST(SUM(2 * np * cum_nn + np * nn) AS BIGINT) AS u2
        |  FROM c
        |)
        |SELECT npos, nneg, u2,
        |       CASE WHEN npos > 0 AND nneg > 0
        |            THEN CAST(u2 AS DOUBLE)
        |                 / (2.0 * (CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)))
        |       END AS auc
        |FROM agg""".stripMargin,
  )
}
