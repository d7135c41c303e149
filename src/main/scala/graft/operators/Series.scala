package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling and market-structure analytics (SURVEY.md §2e/§2f
  * extensions): OHLC downsampling, lag-feature materialization, changepoint
  * location, concentration (HHI) and Pareto-coverage statistics, and a
  * difference-in-differences estimate — the quantitative layer an event
  * warehouse adds on top of the reference's per-source count/latest surface
  * (/root/reference/app.py:200-293).
  *
  * Shared determinism contract (same as [[Mining]]/[[Behavior]]): monetary
  * doubles become BIGINT cents at the scan (`floor(v*100 + 0.5)` — identical
  * IEEE ops in both engines), every aggregate/window fold is integer-exact,
  * and doubles appear only in final projections as ONE pinned chain over
  * exact integers, mirrored verbatim by the oracle.
  */
object Series {

  private def cents(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** q_ohlc — tick-to-bar downsampling: the events stream resampled to
    * 6-hour OHLC bars per event type (open/high/low/close in exact cents,
    * plus tick count and volume). Open/close are selected by the TOTAL
    * order (ts, event_id) — `min_by`/`max_by` over a struct ordering key,
    * so ties at the same microsecond are pinned by the unique id, and the
    * whole bar is ONE map-side-combinable aggregate (min_by/max_by carry
    * a single candidate row per partial).
    *
    * Scale: this is the canonical tick-store → bar-table compaction. One
    * shuffle on (bucket, type); no window, no sort until the
    * presentation ORDER BY; at 100 TB the same plan lands as a
    * partial-agg-heavy single exchange whose output is bar-cardinality
    * (|buckets|×|types|), i.e. ~10⁻⁵ of the input.
    */
  def qOhlc(spark: SparkSession, d: String): DataFrame = {
    val e = events(spark, d)
      .filter(col("value").isNotNull)
      .select(
        expr("unix_micros(ts) div 21600000000").as("bucket"),
        col("event_type"),
        struct(unix_micros(col("ts")).as("us"), col("event_id").as("id"))
          .as("ord"),
        cents(col("value")).as("c"))
    e.groupBy(col("bucket"), col("event_type"))
      .agg(
        min_by(col("c"), col("ord")).as("open_cents"),
        max(col("c")).as("high_cents"),
        min(col("c")).as("low_cents"),
        max_by(col("c"), col("ord")).as("close_cents"),
        count(lit(1)).as("n_ticks"),
        sum(col("c")).as("vol_cents"))
      .orderBy(col("bucket"), col("event_type"))
  }

  /** q_lag_features — supervised-learning feature materialization: per
    * (user, active day) spend in cents with lag-1, lag-7 (previous active
    * days, observation-based — documented, not calendar-gap-filled; the
    * calendar variant is [[Analytics.qGapfill]] composed in front) and a
    * trailing 7-observation rolling sum. This is the feature-matrix dump
    * a training pipeline runs nightly before model fit.
    *
    * Scale: one shuffle to the per-(user, day) grain, then ONE window pass
    * partitioned by user — partitions are per-user day counts (≤ days in
    * range), never global. All columns BIGINT; lags at the series head
    * stay NULL (hash-stable in both engines).
    */
  def qLagFeatures(spark: SparkSession, d: String): DataFrame = {
    val daily = events(spark, d)
      .filter(col("value").isNotNull && col("event_type") === "purchase")
      .groupBy(col("user_id"),
        expr("unix_micros(date_trunc('day', ts)) DIV 86400000000").as("dy"))
      .agg(sum(cents(col("value"))).as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("dy"))
    daily
      .select(col("user_id"), col("dy"), col("cents"),
        lag(col("cents"), 1).over(w).as("lag1"),
        lag(col("cents"), 7).over(w).as("lag7"),
        sum(col("cents")).over(w.rowsBetween(-6, 0)).as("roll7"))
      .orderBy(col("user_id"), col("dy"))
  }

  /** q_changepoint — single most-likely level-shift day: over the daily
    * purchase-cents series, the split maximizing |mean(prefix) −
    * mean(suffix)| (the k=1 CUSUM/binary-segmentation step). Both cumulative
    * sums are exact BIGINT window folds; the two means and their difference
    * are ONE pinned double chain per candidate (integer inputs → identical
    * doubles in both engines, so the argmax comparison is bit-identical),
    * tie-broken by earliest day.
    *
    * Scale: the raw events collapse to day grain in the first shuffle;
    * every window after runs on the DAY-cardinality relation (30 rows per
    * month of data — a single task regardless of corpus size). This is
    * the standard "aggregate to the series grain, then scan the series"
    * changepoint shape; at 100 TB only the first aggregate sees the data.
    */
  def qChangepoint(spark: SparkSession, d: String): DataFrame = {
    val daily = events(spark, d)
      .filter(col("value").isNotNull && col("event_type") === "purchase")
      .groupBy(expr("unix_micros(date_trunc('day', ts)) DIV 86400000000")
        .as("dy"))
      .agg(sum(cents(col("value"))).as("c"))
    val w = Window.orderBy(col("dy"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .select(col("dy"), col("c"),
        sum(col("c")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("cum"),
        row_number().over(w).cast("long").as("t"),
        sum(col("c")).over(wAll).as("s"),
        count(lit(1)).over(wAll).as("n"))
      .filter(col("t") < col("n"))
      .select(col("dy"),
        col("t").as("n_before"), (col("n") - col("t")).as("n_after"),
        (col("cum").cast("double") / col("t").cast("double")).as("mean_before"),
        ((col("s") - col("cum")).cast("double") /
          (col("n") - col("t")).cast("double")).as("mean_after"))
      .withColumn("abs_diff", abs(col("mean_before") - col("mean_after")))
      .orderBy(col("abs_diff").desc, col("dy"))
      .limit(1)
  }

  /** q_hhi — supplier-concentration audit: per region, the
    * Herfindahl–Hirschman index of supplier revenue shares, in exact
    * fixed-point (share in basis points, floored per supplier; HHI =
    * Σ share_bp² — the 0..10⁸ scale regulators quote ×10⁴). Revenue is
    * discounted lineitem cents via the broadcast supplier→nation→region
    * dim chain.
    *
    * Scale: fact shuffles ONCE to (region, supplier) grain; the share
    * window runs on supplier-cardinality partitions (the dim side —
    * thousands, not the fact). Integer shares sidestep both double-sum
    * order dependence and the BIGINT overflow a raw Σ cents² would hit
    * (region cents ~10¹¹ squares past 2⁶³).
    */
  def qHhi(spark: SparkSession, d: String): DataFrame = {
    val sn = supplier(spark, d)
      .join(broadcast(nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name"))
    val lineCents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    val perSupp = lineitem(spark, d)
      .select(col("l_suppkey"), lineCents.as("c"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name"), col("s_suppkey"))
      .agg(sum(col("c")).as("rev"))
    val wReg = Window.partitionBy(col("r_name"))
    perSupp
      .withColumn("total", sum(col("rev")).over(wReg))
      .withColumn("share_bp", expr("(rev * 10000) div total"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        max(col("total")).as("total_cents"),
        sum(col("share_bp") * col("share_bp")).as("hhi_bp2"))
      .orderBy(col("r_name"))
  }

  /** q_pareto — revenue-coverage audit (the 80/20 cut): per market
    * segment, how many top customers cover 80% of order revenue, and the
    * top decile's share in basis points. The 80% threshold is the exact
    * integer comparison 5·cum ≥ 4·total — no double enters the decision.
    *
    * Scale: orders collapse to per-(segment, customer) cents in one
    * shuffle; the ranking window is per-segment over CUSTOMER-cardinality
    * partitions (same stance as [[Behavior.qRfm]]'s ntile — fine while a
    * segment's customers fit a task; beyond that, precompute cents
    * quantile boundaries and join back broadcast). Output is
    * segment-cardinality.
    */
  def qPareto(spark: SparkSession, d: String): DataFrame = {
    val perCust = orders(spark, d)
      .join(customer(spark, d).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev"))
    val wSeg = Window.partitionBy(col("c_mktsegment"))
    val wRank = wSeg.orderBy(col("rev").desc, col("c_custkey"))
    perCust
      .select(col("c_mktsegment"), col("rev"),
        row_number().over(wRank).cast("long").as("rn"),
        sum(col("rev")).over(wRank.rowsBetween(Window.unboundedPreceding, 0))
          .as("cum"),
        sum(col("rev")).over(wSeg).as("total"),
        count(lit(1)).over(wSeg).as("n_cust"))
      .groupBy(col("c_mktsegment"))
      .agg(
        max(col("n_cust")).as("n_cust"),
        max(col("total")).as("total_cents"),
        min(when(col("cum") * lit(5L) >= col("total") * lit(4L), col("rn")))
          .as("k80"),
        (sum(when(col("rn") <= expr("(n_cust + 9) div 10"), col("rev"))
          .otherwise(lit(0L))) * lit(10000L)).as("dec_num"),
        max(col("total")).as("t2"))
      .select(col("c_mktsegment"), col("n_cust"), col("total_cents"),
        col("k80"), expr("dec_num div t2").as("top_decile_bp"))
      .orderBy(col("c_mktsegment"))
  }

  /** q_did — difference-in-differences: treated = purchase events, control
    * = view events; periods split at the data-derived midpoint microsecond
    * ((min+max) div 2 over the two cohorts — no wall clock, scale-free).
    * One conditional-aggregate pass folds all four cells' exact cents sums
    * and counts; the four means and the DiD estimate are one pinned double
    * chain. Output is a single row.
    *
    * Scale: two scans (a 1-row bounds aggregate broadcast back, then the
    * cell fold) — both full-pushdown single aggregates with no join
    * shuffle; the bounds crossJoin is a 1-row broadcast, the same stance
    * as [[Behavior.qRfm]]'s anchor.
    */
  def qDid(spark: SparkSession, d: String): DataFrame = {
    val base = events(spark, d)
      .filter(col("value").isNotNull &&
        col("event_type").isin("purchase", "view"))
      .select((col("event_type") === "purchase").as("treated"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("c"))
    val mid = base.agg(
      expr("(min(us) + max(us)) div 2").as("mid_us"))
    def cell(t: Boolean, post: Boolean): Column =
      col("treated") === lit(t) && (if (post) col("us") >= col("mid_us")
                                    else col("us") < col("mid_us"))
    def m(s: Column, n: Column): Column = s.cast("double") / n.cast("double")
    base.crossJoin(broadcast(mid))
      .agg(
        sum(when(cell(t = true, post = false), col("c"))).as("s_t_pre"),
        count(when(cell(t = true, post = false), lit(1))).as("n_t_pre"),
        sum(when(cell(t = true, post = true), col("c"))).as("s_t_post"),
        count(when(cell(t = true, post = true), lit(1))).as("n_t_post"),
        sum(when(cell(t = false, post = false), col("c"))).as("s_c_pre"),
        count(when(cell(t = false, post = false), lit(1))).as("n_c_pre"),
        sum(when(cell(t = false, post = true), col("c"))).as("s_c_post"),
        count(when(cell(t = false, post = true), lit(1))).as("n_c_post"))
      .select(
        m(col("s_t_pre"), col("n_t_pre")).as("mean_t_pre"),
        m(col("s_t_post"), col("n_t_post")).as("mean_t_post"),
        m(col("s_c_pre"), col("n_c_pre")).as("mean_c_pre"),
        m(col("s_c_post"), col("n_c_post")).as("mean_c_post"))
      .withColumn("did",
        (col("mean_t_post") - col("mean_t_pre")) -
          (col("mean_c_post") - col("mean_c_pre")))
  }

  /** q_dtw — Dynamic Time Warping distance between every pair of
    * per-type daily count series (Sakoe/Chiba's classic alignment
    * measure): the similarity metric that matches series which move
    * ALIKE BUT SHIFTED, where Euclidean/correlation ([[qStl]]'s
    * decomposition, q_corr's moment) punish any phase lag. The
    * curation use: cluster sources/feeds whose daily volume curves are
    * time-warped copies (mirrors, re-posters, delayed syndication).
    *
    * Series are gap-filled to the GLOBAL day grid (0 on silent days —
    * same densification stance as E28b) so every pair compares equal-
    * length vectors; costs are |ca − cb| over exact BIGINT counts, so
    * the whole O(n²) DP is INTEGER arithmetic — hash-exact with no
    * float anywhere. The DP is the textbook row-rolling recurrence
    * d[i][j] = cost + min(d[i−1][j], d[i][j−1], d[i−1][j−1]) expressed
    * as a nested `aggregate` fold (outer over series A, inner building
    * each row left-to-right; the 10¹⁵ sentinel plays ∞ and cannot
    * overflow: at most one sentinel enters any sum, costs are ≤ 2⁴⁰).
    *
    * Plan: one hash agg to (type, day) counts, a broadcast grid fill,
    * then a |types|-row broadcast self-join — the DP runs INSIDE each
    * pair row on one executor, no shuffle. Scale: pairs grow with the
    * alphabet² (bounded), series length with the calendar; at years of
    * days swap the full DP for the Sakoe-Chiba band (cap |i−j| ≤ w in
    * the inner fold — same recurrence, O(n·w)).
    */
  /** Gap-filled per-type daily count series, paired (type_a < type_b) —
    * the input relation both DTW forms fold over.
    */
  private def dailySeriesPairs(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('day', ts)) DIV 86400000000").as("dy"))
      .groupBy(col("event_type"), col("dy")).agg(count(lit(1)).as("c"))
    val bounds = ev.agg(min(col("dy")).as("lo"), max(col("dy")).as("hi"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("dy"))
    val ser = grid.join(ev, Seq("event_type", "dy"), "left")
      .select(col("event_type"), col("dy"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("dy"), col("c")))).as("sc"))
      .select(col("event_type"), expr("transform(sc, x -> x.c)").as("s"))
    val a = ser.select(col("event_type").as("type_a"), col("s").as("sa"))
    val b = ser.select(col("event_type").as("type_b"), col("s").as("sb"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
  }

  def qDtw(spark: SparkSession, d: String): DataFrame = {
    val inf = "CAST(1000000000000000 AS BIGINT)"
    dailySeriesPairs(spark, d)
      .select(col("type_a"), col("type_b"),
        expr(
          s"""element_at(
             |  aggregate(
             |    sa,
             |    concat(array(CAST(0 AS BIGINT)), transform(sb, x -> $inf)),
             |    (prev, ai) -> aggregate(
             |      sb,
             |      array($inf),
             |      (curr, bj) -> concat(curr, array(
             |        abs(ai - bj) + least(
             |          element_at(prev, size(curr) + 1),
             |          element_at(prev, size(curr)),
             |          element_at(curr, size(curr))))))),
             |  size(sb) + 1)""".stripMargin).as("dtw"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Sakoe-Chiba band half-width for [[qDtwBanded]]: alignments may lag
    * by at most this many days. Stated identically in the oracle.
    */
  val DtwBand = 7

  /** q_dtw_banded — [[qDtw]]'s documented years-of-days lever SHIPPED:
    * the Sakoe-Chiba band caps |i−j| ≤ [[DtwBand]], and the DP rows are
    * stored BAND-RELATIVE (2w+1 cells centered on the diagonal), so the
    * fold does O(n·w) work and carries O(w) state — not the full O(n²)/
    * O(n) of [[qDtw]] with cells merely masked. Row i's cell k holds
    * d[i][i−w+k]; the recurrence's three neighbors land at prev[k+2]
    * (=d[i−1][j]), prev[k+1] (=d[i−1][j−1]) and curr[k] (=d[i][j−1]),
    * with off-band/off-grid neighbors pinned to the ∞ sentinel (at most
    * one sentinel enters any sum — same overflow headroom argument as
    * [[qDtw]]). Classic banding trade, stated exactly in the oracle:
    * banded DTW ≥ full DTW (it forbids long warps), equal whenever the
    * optimal path stays within the band — SeriesSpec pins both.
    *
    * Same plan shape as [[qDtw]]: one hash agg, broadcast grid fill,
    * |types|²/2 broadcast pair join, DP inside the projection — no
    * shuffle grows with the calendar.
    */
  def qDtwBanded(spark: SparkSession, d: String): DataFrame = {
    val inf = "CAST(1000000000000000 AS BIGINT)"
    val w = DtwBand
    val width = 2 * w
    dailySeriesPairs(spark, d)
      .select(col("type_a"), col("type_b"),
        expr(
          s"""element_at(
             |  aggregate(
             |    sequence(1, size(sa)),
             |    transform(sequence(0, $width),
             |              k -> IF(k = $w, CAST(0 AS BIGINT), $inf)),
             |    (prev, i) -> aggregate(
             |      sequence(0, $width),
             |      CAST(array() AS ARRAY<BIGINT>),
             |      (curr, k) -> concat(curr, array(
             |        CASE WHEN i - $w + k < 1 OR i - $w + k > size(sb)
             |             THEN $inf
             |        ELSE abs(element_at(sa, i) - element_at(sb, i - $w + k))
             |             + least(
             |                 CASE WHEN k + 2 > ${width + 1} THEN $inf
             |                      ELSE element_at(prev, k + 2) END,
             |                 element_at(prev, k + 1),
             |                 CASE WHEN k = 0 THEN $inf
             |                      ELSE element_at(curr, k) END)
             |        END)))),
             |  ${w + 1})""".stripMargin).as("dtw_banded"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** q_seasonal_backtest — forecast-model BACKTEST over the per-type
    * daily count series: score the two zero-parameter baselines every
    * forecasting deployment must beat — naive (ŷₜ = yₜ₋₁) and
    * seasonal-naive (ŷₜ = yₜ₋₇, the weekly cycle) — by their summed
    * absolute error over the evaluable days, and name the winner. The
    * M-competition protocol in miniature: [[qHolt]] and
    * [[Mining.qLinreg]] FIT models; this query answers "against what
    * bar", which is the number that decides whether a fitted model
    * ships.
    *
    * Determinism: counts are exact BIGINT on the gap-filled global day
    * grid ([[qDtw]]'s densification — silent days are real zeros, and
    * lag(7) means 7 CALENDAR days, not 7 observed rows), so both error
    * sums are exact integers; the MAEs are one pinned division each.
    * Eval window: days with a full 7-day history (both lags defined on
    * the grid), identical in both engines by construction.
    *
    * Plan: one hash agg to (type, day), broadcast grid fill, per-type
    * windows over calendar-bounded series, final |types|-row aggregate
    * — nothing after the first agg scales with event volume.
    */
  def qSeasonalBacktest(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('day', ts)) DIV 86400000000").as("dy"))
      .groupBy(col("event_type"), col("dy")).agg(count(lit(1)).as("c"))
    val bounds = ev.agg(min(col("dy")).as("lo"), max(col("dy")).as("hi"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("dy"))
    val filled = grid.join(ev, Seq("event_type", "dy"), "left")
      .select(col("event_type"), col("dy"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("dy"))
    filled
      .withColumn("l1", lag(col("c"), 1).over(w))
      .withColumn("l7", lag(col("c"), 7).over(w))
      .filter(col("l7").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("c") - col("l1"))).as("sae_naive"),
        sum(abs(col("c") - col("l7"))).as("sae_seasonal"))
      .select(col("event_type"), col("n_eval"),
        col("sae_naive"), col("sae_seasonal"),
        (col("sae_naive").cast("double") / col("n_eval").cast("double"))
          .as("mae_naive"),
        (col("sae_seasonal").cast("double") / col("n_eval").cast("double"))
          .as("mae_seasonal"),
        when(col("sae_naive") <= col("sae_seasonal"), lit("naive"))
          .otherwise(lit("seasonal")).as("winner"))
      .orderBy(col("event_type"))
  }

  /** Watermark-equivalent lateness bound for [[qDisorder]], µs. */
  val DisorderBoundUs = 600000000L

  /** q_disorder — event-time DISORDER audit per type, under TWO arrival
    * orders: (1) the OBSERVED ingest order (event_id — the fixture's
    * monotone ingest id), and (2) the adversarial HASH-SHUFFLED
    * permutation (arrival by md5(event_id) — what ingest looks like
    * when ordering guarantees are lost to a partitioned bus). For each
    * order, replay the log and measure how far each event's timestamp
    * lags the running event-time maximum. This is THE number that tunes
    * a watermark: `late_share` at the candidate delay is exactly the
    * fraction a streaming job with that watermark would DROP (the
    * 10-minute bound here is the watermark every streaming query in
    * this engine uses), and the max bounds the delay that loses
    * nothing. The observed row proving 0 disorder is itself the audit
    * finding ("this feed is in-order — the watermark is pure safety
    * margin"); the shuffled row is the contingency bound. Streaming
    * observability reports drops AFTER deployment; this is the a-priori
    * batch audit.
    *
    * Determinism: all-BIGINT µs arithmetic — running maxes,
    * differences, counts; the only double is one pinned share division.
    * The shuffle permutation is the portable 60-bit md5 (ties broken by
    * event_id — a total order in both engines).
    *
    * Plan: two per-type ordered prefix windows on the SAME partitioning
    * (one Exchange, two sorts), then a |types|-row aggregate. For
    * type-skewed logs the documented knob is the day-bucketed two-level
    * max (prefix max of per-day maxes).
    */
  def qDisorder(spark: SparkSession, d: String): DataFrame = {
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("event_id"))
    val wSh = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"), col("event_id"))
    events(spark, d)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        TextOps.md5Long(col("event_id").cast("string"), 15).as("h"))
      .withColumn("late_in", max(col("us")).over(wIn) - col("us"))
      .withColumn("late_sh", max(col("us")).over(wSh) - col("us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("late_in") > DisorderBoundUs, 1L).otherwise(0L))
          .as("n_late_ingest"),
        max(col("late_in")).as("max_late_ingest_us"),
        sum(when(col("late_sh") > DisorderBoundUs, 1L).otherwise(0L))
          .as("n_late_shuffled"),
        max(col("late_sh")).as("max_late_shuffled_us"))
      .select(col("event_type"), col("n"), col("n_late_ingest"),
        col("max_late_ingest_us"), col("n_late_shuffled"),
        (col("n_late_shuffled").cast("double") / col("n").cast("double"))
          .as("late_share_shuffled"),
        col("max_late_shuffled_us"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_disorder"          -> qDisorder _,
    "q_seasonal_backtest" -> qSeasonalBacktest _,
    "q_ohlc" -> qOhlc _,
    "q_lag_features" -> qLagFeatures _,
    "q_changepoint" -> qChangepoint _,
    "q_hhi" -> qHhi _,
    "q_pareto" -> qPareto _,
    "q_did" -> qDid _,
    "q_dtw" -> qDtw _,
    "q_dtw_banded" -> qDtwBanded _,
  )

  val oracle: Map[String, String] = Map(
    "q_disorder" ->
      s"""WITH lagged AS (
         |  SELECT event_type,
         |         MAX(epoch_us(ts)) OVER (PARTITION BY event_type
         |           ORDER BY event_id ROWS UNBOUNDED PRECEDING)
         |           - epoch_us(ts) AS late_in,
         |         MAX(epoch_us(ts)) OVER (PARTITION BY event_type
         |           ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
         |             1, 15))::BIGINT, event_id ROWS UNBOUNDED PRECEDING)
         |           - epoch_us(ts) AS late_sh
         |  FROM events
         |)
         |SELECT event_type, COUNT(*) AS n,
         |       CAST(SUM(CASE WHEN late_in > $DisorderBoundUs
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_ingest,
         |       CAST(MAX(late_in) AS BIGINT) AS max_late_ingest_us,
         |       CAST(SUM(CASE WHEN late_sh > $DisorderBoundUs
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_shuffled,
         |       CAST(SUM(CASE WHEN late_sh > $DisorderBoundUs
         |         THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |         AS late_share_shuffled,
         |       CAST(MAX(late_sh) AS BIGINT) AS max_late_shuffled_us
         |FROM lagged GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_seasonal_backtest" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
        |         COUNT(*) AS c
        |  FROM events GROUP BY event_type, dy
        |), bounds AS (SELECT MIN(dy) AS lo, MAX(dy) AS hi FROM ev),
        |grid AS (
        |  SELECT t.event_type,
        |         unnest(generate_series(bounds.lo, bounds.hi)) AS dy
        |  FROM (SELECT DISTINCT event_type FROM ev) t, bounds
        |), filled AS (
        |  SELECT g.event_type, g.dy, COALESCE(ev.c, 0) AS c
        |  FROM grid g LEFT JOIN ev
        |    ON g.event_type = ev.event_type AND g.dy = ev.dy
        |), lagged AS (
        |  SELECT event_type, c,
        |         lag(c, 1) OVER w AS l1, lag(c, 7) OVER w AS l7
        |  FROM filled WINDOW w AS (PARTITION BY event_type ORDER BY dy)
        |), agg AS (
        |  SELECT event_type, COUNT(*) AS n_eval,
        |         CAST(SUM(abs(c - l1)) AS BIGINT) AS sae_naive,
        |         CAST(SUM(abs(c - l7)) AS BIGINT) AS sae_seasonal
        |  FROM lagged WHERE l7 IS NOT NULL GROUP BY event_type
        |)
        |SELECT event_type, n_eval, sae_naive, sae_seasonal,
        |       CAST(sae_naive AS DOUBLE) / CAST(n_eval AS DOUBLE)
        |         AS mae_naive,
        |       CAST(sae_seasonal AS DOUBLE) / CAST(n_eval AS DOUBLE)
        |         AS mae_seasonal,
        |       CASE WHEN sae_naive <= sae_seasonal THEN 'naive'
        |            ELSE 'seasonal' END AS winner
        |FROM agg ORDER BY event_type""".stripMargin,
    "q_dtw" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
        |         COUNT(*) AS c
        |  FROM events GROUP BY event_type, dy
        |), bounds AS (SELECT MIN(dy) AS lo, MAX(dy) AS hi FROM ev),
        |grid AS (
        |  SELECT t.event_type,
        |         unnest(generate_series(bounds.lo, bounds.hi)) AS dy
        |  FROM (SELECT DISTINCT event_type FROM ev) t, bounds
        |), ser AS (
        |  SELECT g.event_type,
        |         list(COALESCE(ev.c, 0) ORDER BY g.dy) AS s
        |  FROM grid g LEFT JOIN ev
        |    ON g.event_type = ev.event_type AND g.dy = ev.dy
        |  GROUP BY g.event_type
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         a.s AS sa, b.s AS sb
        |  FROM ser a JOIN ser b ON a.event_type < b.event_type
        |)
        |SELECT type_a, type_b,
        |  list_reduce(
        |    list_prepend(
        |      list_concat([CAST(0 AS BIGINT)],
        |        list_transform(sb, x -> CAST(1000000000000000 AS BIGINT))),
        |      list_transform(sa, v -> [v])),
        |    (prev, ae) -> list_reduce(
        |      list_prepend(
        |        [CAST(1000000000000000 AS BIGINT)],
        |        list_transform(sb, w -> [w])),
        |      (curr, be) -> list_concat(curr,
        |        [abs(ae[1] - be[1]) + least(
        |           prev[len(curr) + 1],
        |           prev[len(curr)],
        |           curr[len(curr)])])))[len(sb) + 1] AS dtw
        |FROM pairs ORDER BY type_a, type_b""".stripMargin,
    // Band-relative Sakoe-Chiba rows: row i's cell k (0-based offset from
    // the diagonal's left band edge) holds d[i][i-w+k]; the neighbors sit
    // at prev[k+2], prev[k+1], curr[k] (1-based list indexing after the
    // k=0 cell is appended). Same CTE chain as q_dtw; w stated literally.
    "q_dtw_banded" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |         epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
         |         COUNT(*) AS c
         |  FROM events GROUP BY event_type, dy
         |), bounds AS (SELECT MIN(dy) AS lo, MAX(dy) AS hi FROM ev),
         |grid AS (
         |  SELECT t.event_type,
         |         unnest(generate_series(bounds.lo, bounds.hi)) AS dy
         |  FROM (SELECT DISTINCT event_type FROM ev) t, bounds
         |), ser AS (
         |  SELECT g.event_type,
         |         list(COALESCE(ev.c, 0) ORDER BY g.dy) AS s
         |  FROM grid g LEFT JOIN ev
         |    ON g.event_type = ev.event_type AND g.dy = ev.dy
         |  GROUP BY g.event_type
         |), pairs AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |         a.s AS sa, b.s AS sb
         |  FROM ser a JOIN ser b ON a.event_type < b.event_type
         |)
         |SELECT type_a, type_b,
         |  list_reduce(
         |    list_prepend(
         |      list_transform(generate_series(0, ${2 * DtwBand}),
         |        k -> CASE WHEN k = $DtwBand THEN CAST(0 AS BIGINT)
         |                  ELSE CAST(1000000000000000 AS BIGINT) END),
         |      list_transform(generate_series(1, len(sa)), i -> [i])),
         |    (prev, ie) -> list_reduce(
         |      list_prepend(
         |        CAST([] AS BIGINT[]),
         |        list_transform(generate_series(0, ${2 * DtwBand}), k -> [k])),
         |      (curr, ke) -> list_concat(curr, [
         |        CASE WHEN ie[1] - $DtwBand + ke[1] < 1
         |               OR ie[1] - $DtwBand + ke[1] > len(sb)
         |             THEN CAST(1000000000000000 AS BIGINT)
         |        ELSE abs(sa[ie[1]] - sb[ie[1] - $DtwBand + ke[1]])
         |             + least(
         |                 CASE WHEN ke[1] + 2 > ${2 * DtwBand + 1}
         |                      THEN CAST(1000000000000000 AS BIGINT)
         |                      ELSE prev[ke[1] + 2] END,
         |                 prev[ke[1] + 1],
         |                 CASE WHEN ke[1] = 0
         |                      THEN CAST(1000000000000000 AS BIGINT)
         |                      ELSE curr[ke[1]] END)
         |        END])))[${DtwBand + 1}] AS dtw_banded
         |FROM pairs ORDER BY type_a, type_b""".stripMargin,
    "q_ohlc" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) // 21600000000 AS bucket, event_type,
        |         epoch_us(ts) AS us, event_id,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |), r AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY bucket, event_type
        |                            ORDER BY us, event_id) AS rn_a,
        |         row_number() OVER (PARTITION BY bucket, event_type
        |                            ORDER BY us DESC, event_id DESC) AS rn_d
        |  FROM e
        |)
        |SELECT bucket, event_type,
        |       CAST(MAX(CASE WHEN rn_a = 1 THEN c END) AS BIGINT) AS open_cents,
        |       CAST(MAX(c) AS BIGINT) AS high_cents,
        |       CAST(MIN(c) AS BIGINT) AS low_cents,
        |       CAST(MAX(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS close_cents,
        |       COUNT(*) AS n_ticks,
        |       CAST(SUM(c) AS BIGINT) AS vol_cents
        |FROM r GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,
    "q_lag_features" ->
      """WITH daily AS (
        |  SELECT user_id,
        |         epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
        |         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type = 'purchase'
        |  GROUP BY user_id, dy
        |)
        |SELECT user_id, dy, cents,
        |       CAST(lag(cents, 1) OVER w AS BIGINT) AS lag1,
        |       CAST(lag(cents, 7) OVER w AS BIGINT) AS lag7,
        |       CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY dy
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll7
        |FROM daily
        |WINDOW w AS (PARTITION BY user_id ORDER BY dy)
        |ORDER BY user_id, dy""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
        |         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |           AS c
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type = 'purchase'
        |  GROUP BY dy
        |), cum AS (
        |  SELECT dy,
        |         CAST(SUM(c) OVER (ORDER BY dy
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS cum,
        |         CAST(row_number() OVER (ORDER BY dy) AS BIGINT) AS t,
        |         CAST(SUM(c) OVER () AS BIGINT) AS s,
        |         COUNT(*) OVER () AS n
        |  FROM daily
        |), cand AS (
        |  SELECT dy, t AS n_before, n - t AS n_after,
        |         CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) AS mean_before,
        |         CAST(s - cum AS DOUBLE) / CAST(n - t AS DOUBLE) AS mean_after
        |  FROM cum WHERE t < n
        |)
        |SELECT dy, n_before, n_after, mean_before, mean_after,
        |       abs(mean_before - mean_after) AS abs_diff
        |FROM cand
        |ORDER BY abs_diff DESC, dy LIMIT 1""".stripMargin,
    "q_hhi" ->
      """WITH sn AS (
        |  SELECT s_suppkey, r_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |), per_supp AS (
        |  SELECT r_name, l_suppkey,
        |         CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |           * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem JOIN sn ON l_suppkey = s_suppkey
        |  GROUP BY r_name, l_suppkey
        |), shares AS (
        |  SELECT r_name, rev,
        |         CAST(SUM(rev) OVER (PARTITION BY r_name) AS BIGINT) AS total,
        |         (rev * 10000) // CAST(SUM(rev) OVER (PARTITION BY r_name)
        |           AS BIGINT) AS share_bp
        |  FROM per_supp
        |)
        |SELECT r_name, COUNT(*) AS n_suppliers,
        |       CAST(MAX(total) AS BIGINT) AS total_cents,
        |       CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi_bp2
        |FROM shares GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_pareto" ->
      """WITH per_cust AS (
        |  SELECT c_mktsegment, c_custkey,
        |         CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |           AS BIGINT) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, c_custkey
        |), ranked AS (
        |  SELECT c_mktsegment, rev,
        |         CAST(row_number() OVER w AS BIGINT) AS rn,
        |         CAST(SUM(rev) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND CURRENT ROW) AS BIGINT) AS cum,
        |         CAST(SUM(rev) OVER (PARTITION BY c_mktsegment) AS BIGINT)
        |           AS total,
        |         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_cust
        |  FROM per_cust
        |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY rev DESC, c_custkey)
        |)
        |SELECT c_mktsegment,
        |       CAST(MAX(n_cust) AS BIGINT) AS n_cust,
        |       CAST(MAX(total) AS BIGINT) AS total_cents,
        |       CAST(MIN(CASE WHEN cum * 5 >= total * 4 THEN rn END) AS BIGINT)
        |         AS k80,
        |       CAST((SUM(CASE WHEN rn <= (n_cust + 9) // 10 THEN rev
        |                      ELSE 0 END) * 10000) // MAX(total) AS BIGINT)
        |         AS top_decile_bp
        |FROM ranked GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_did" ->
      """WITH base AS (
        |  SELECT (event_type = 'purchase') AS treated,
        |         epoch_us(ts) AS us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
        |), mid AS (
        |  SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM base
        |), cells AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN treated AND us < mid_us THEN c END) AS BIGINT) AS s_t_pre,
        |    COUNT(CASE WHEN treated AND us < mid_us THEN 1 END) AS n_t_pre,
        |    CAST(SUM(CASE WHEN treated AND us >= mid_us THEN c END) AS BIGINT) AS s_t_post,
        |    COUNT(CASE WHEN treated AND us >= mid_us THEN 1 END) AS n_t_post,
        |    CAST(SUM(CASE WHEN NOT treated AND us < mid_us THEN c END) AS BIGINT) AS s_c_pre,
        |    COUNT(CASE WHEN NOT treated AND us < mid_us THEN 1 END) AS n_c_pre,
        |    CAST(SUM(CASE WHEN NOT treated AND us >= mid_us THEN c END) AS BIGINT) AS s_c_post,
        |    COUNT(CASE WHEN NOT treated AND us >= mid_us THEN 1 END) AS n_c_post
        |  FROM base, mid
        |)
        |SELECT
        |  CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE) AS mean_t_pre,
        |  CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE) AS mean_t_post,
        |  CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE) AS mean_c_pre,
        |  CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE) AS mean_c_post,
        |  ((CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)) -
        |   (CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))) -
        |  ((CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)) -
        |   (CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE))) AS did
        |FROM cells""".stripMargin,
  )
}
