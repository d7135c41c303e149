package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical-statistics operators (SURVEY.md §2e extensions, round 8):
  * rank correlation (Spearman, Kendall τ-b), one-way ANOVA, Cramér's V,
  * IQR outlier fencing, Theil–Sen robust trend, Holt double exponential
  * smoothing, and Jensen–Shannon source drift — the hypothesis-testing /
  * drift-detection layer a data platform runs on top of the dependence
  * diagnostics in [[Mining]]. The reference's analytic surface stops at
  * counts and a latest-row insight (/root/reference/app.py:200-293);
  * these are the inferential-statistics analogs, each reduced to a
  * domain-sized relation before any expensive step.
  *
  * Shared determinism contract (the [[Mining]] one): every statistic is
  * assembled from EXACT BIGINT counts/rank sums/quantized cents; doubles
  * appear only in final projections with ONE literal parenthesization
  * mirrored in the oracle, logs go through the libm-exact
  * [[graft.functions.LnLibm]], and cross-group sums of doubles use
  * ordered folds (`sort_array` + `aggregate` here, `list_reduce` with
  * `ORDER BY` in DuckDB).
  */
object Stats {

  private def lnLibm(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.LnLibm(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** q_spearman — Spearman rank correlation between event `value` and
    * event TIME (epoch µs): "does the metric trend over the capture
    * window" as a distribution-free statistic, the drift probe that is
    * robust to the metric's scale and to outliers (unlike [[Mining]]'s
    * Pearson `q_corr`). Ties are handled exactly via midranks — ρ is
    * Pearson over midranks, and 2·midrank = 2·cum_lt + t + 1 is an
    * INTEGER, so every moment (Σr, Σr², Σrxry) folds as an exact BIGINT
    * in any partitioning; ρ itself is one pinned double chain at the end.
    *
    * Plan: the rank tables are |distinct value| / |distinct ts| relations
    * (domain-sized — the [[Mining.qMannWhitney]] stance) built with one
    * unpartitioned window each over the DISTINCT-value histogram, then
    * rows join their two midranks back by equality (AQE broadcasts the
    * value side; the ts side shuffles on the join key once). The moment
    * fold is one map-side-partial hash aggregate. BIGINT bounds: 2r ≤
    * 2n+1, so Σ(2rx·2ry) ≤ n·(2n+1)² — exact through n ≈ 10⁵·…; past
    * ~10⁶ rows the moments belong in DECIMAL(38,0) on both engines
    * (documented bound, same class as q_mann_whitney's tie term).
    */
  def qSpearman(spark: SparkSession, d: String): DataFrame = {
    val rows = events(spark, d)
      .select(col("value").as("x"), unix_micros(col("ts")).as("y"))
    def midranks(src: DataFrame, key: String, out: String): DataFrame = {
      val w = Window.orderBy(col(key)).rowsBetween(Window.unboundedPreceding, 0)
      src.groupBy(col(key)).agg(count(lit(1)).as("nv"))
        .select(col(key),
          (lit(2L) * (sum(col("nv")).over(w) - col("nv")) +
            col("nv") + lit(1L)).as(out))
    }
    rows
      .join(midranks(rows, "x", "rx2"), "x")
      .join(midranks(rows, "y", "ry2"), "y")
      .agg(count(lit(1)).as("n"),
        sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
        sum(col("rx2") * col("ry2")).as("sxy"),
        sum(col("rx2") * col("rx2")).as("sxx"),
        sum(col("ry2") * col("ry2")).as("syy"))
      .select(col("n"),
        ((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          sqrt((col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            (col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))))
          .as("rho"))
  }

  /** q_kendall_tau — Kendall τ-b between hour-of-capture and the
    * 50-unit `value` band, computed on the CONTINGENCY TABLE: both axes
    * are binned (24 hours × ~10 bands → ≤ a few hundred cells), so
    * concordant/discordant mass comes from a cells×cells join — work is
    * |cells|², a CONSTANT, never the O(n²) row-pair definition. This is
    * how τ is computable at 100 TB at all: bin first (the analyst's
    * resolution choice), then the pair statistic is exact ON THE BINNED
    * marginals, ties handled by the τ-b correction.
    *
    * Determinism: P, Q, tie terms and n(n−1)/2 are exact BIGINTs
    * (bounded by n² /2 — fine through n ≈ 3·10⁹); τ-b is one pinned
    * double chain.
    */
  def qKendallTau(spark: SparkSession, d: String): DataFrame = {
    val cells = graft.Tables.cacheForSelfJoin(
      events(spark, d)
        .select(hour(col("ts")).cast("long").as("hx"),
          floor(col("value") / lit(50.0)).as("hy"))
        .groupBy(col("hx"), col("hy")).agg(count(lit(1)).as("m")))
    val pairs = cells.select(col("hx").as("ax"), col("hy").as("ay"), col("m").as("ma"))
      .join(cells.select(col("hx").as("bx"), col("hy").as("by"), col("m").as("mb")),
        col("ax") < col("bx"))
      .agg(
        sum(when(col("ay") < col("by"), col("ma") * col("mb")).otherwise(0L)).as("p"),
        sum(when(col("ay") > col("by"), col("ma") * col("mb")).otherwise(0L)).as("q"))
    val margins = cells.agg(sum(col("m")).as("n"))
    val tx = cells.groupBy(col("hx")).agg(sum(col("m")).as("nx"))
      .agg(sum(expr("nx * (nx - 1) div 2")).as("tx"))
    val ty = cells.groupBy(col("hy")).agg(sum(col("m")).as("ny"))
      .agg(sum(expr("ny * (ny - 1) div 2")).as("ty"))
    pairs.crossJoin(broadcast(margins))
      .crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .select(col("n"), col("p").as("n_conc"), col("q").as("n_disc"),
        ((col("p") - col("q")).cast("double") /
          sqrt(expr("CAST(n * (n - 1) div 2 - tx AS DOUBLE)") *
            expr("CAST(n * (n - 1) div 2 - ty AS DOUBLE)")))
          .as("tau_b"))
  }

  /** q_anova — one-way ANOVA F-test of `value` across event types: are
    * the five types' means distinguishable, the first question an A/B/n
    * readout answers. Values are quantized to cents
    * (`floor(v·100 + 0.5)` — the [[Mining.qBenford]] fixed-point
    * contract) so per-group n, Σx, Σx² are EXACT BIGINTs; the
    * between/within split uses A = Σ_g S_g²/n_g assembled as an ORDERED
    * double fold over the k ≈ 5 group rows (group-sized, not
    * data-sized), and F is one pinned chain. Bound: Σx² stays exact
    * while cents²·rows < 2⁶³ — ~4·10⁸ rows at this value range;
    * beyond, the moment fold widens to DECIMAL(38,0) on both engines.
    *
    * Plan: ONE map-side-partial hash aggregate to k rows, then
    * constant-sized arithmetic. Nothing else touches the data.
    */
  def qAnova(spark: SparkSession, d: String): DataFrame = {
    val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    events(spark, d)
      .select(col("event_type"), cents.as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_g"), sum(col("c")).as("s_g"),
        sum(col("c") * col("c")).as("ss_g"))
      .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
        sort_array(collect_list(struct(col("event_type").as("g"),
          (col("s_g").cast("double") * col("s_g").cast("double") /
            col("n_g").cast("double")).as("a")))).as("ga"))
      .select(col("k"), col("n"), col("s"), col("ss"),
        expr("aggregate(ga, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.a)")
          .as("a"))
      .select(col("k"), col("n"),
        (col("a") - col("s").cast("double") * col("s").cast("double") /
          col("n").cast("double")).as("ssb"),
        (col("ss").cast("double") - col("a")).as("ssw"))
      .select(col("k"), col("n"), col("ssb"), col("ssw"),
        ((col("ssb") / (col("k") - lit(1L)).cast("double")) /
          (col("ssw") / (col("n") - col("k")).cast("double"))).as("f"))
  }

  /** q_cramers_v — Cramér's V association between event type and the
    * 7-day capture phase (epoch-day mod 7 — a pure integer phase bucket,
    * chosen over named weekdays so both engines share one definition):
    * the normalized-χ² "is behavior day-of-week dependent" check, scale-
    * free in [0,1] where raw χ² grows with n. χ² is an ORDERED fold over
    * the ≤ r·c contingency cells (constant-sized after ONE hash
    * aggregate over the data); V = sqrt(χ² / (n·(min(r,c)−1))) is one
    * pinned chain over exact BIGINT marginals.
    */
  def qCramersV(spark: SparkSession, d: String): DataFrame = {
    val cells = graft.Tables.cacheForSelfJoin(
      events(spark, d)
        .select(col("event_type").as("g"),
          expr("(unix_micros(ts) div 86400000000) % 7").as("dw"))
        .groupBy(col("g"), col("dw")).agg(count(lit(1)).as("o")))
    val rowTot = cells.groupBy(col("g")).agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy(col("dw")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("g")).as("r"), countDistinct(col("dw")).as("c"))
    cells
      .join(broadcast(rowTot), "g").join(broadcast(colTot), "dw")
      .crossJoin(broadcast(n))
      .select(col("n"), col("r"), col("c"), col("g"), col("dw"),
        ((col("o").cast("double") -
          col("rt").cast("double") * col("ct").cast("double") /
            col("n").cast("double")) *
          (col("o").cast("double") -
            col("rt").cast("double") * col("ct").cast("double") /
              col("n").cast("double")) /
          (col("rt").cast("double") * col("ct").cast("double") /
            col("n").cast("double"))).as("t"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(sort_array(collect_list(struct(col("g"), col("dw"), col("t"))))
        .as("cells"))
      .select(col("n"), col("r"), col("c"),
        expr("aggregate(cells, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t)")
          .as("chi2"))
      .select(col("n"), col("r"), col("c"), col("chi2"),
        sqrt(col("chi2") / (col("n").cast("double") *
          (least(col("r"), col("c")) - lit(1L)).cast("double"))).as("v"))
  }

  /** q_iqr_outliers — Tukey-fence outlier audit per event type: q1/q3 by
    * the SQL-standard continuous interpolation (the exact
    * [[Analytics.qPercentileCont]] rank-arithmetic pattern — no sketch),
    * fences at q1 − 1.5·IQR / q3 + 1.5·IQR, and the count + share of
    * rows outside them — the robust screening step before any
    * mean-based statistic ([[qAnova]]) is trusted.
    *
    * Plan: one per-type ranked window (parallel across types, sort
    * amortized by the grouping shuffle) → 5-row fence table → broadcast
    * back onto one more scan for the outside-count. Determinism: rank
    * positions are integer arithmetic; the fence chain q1 − (1.5·(q3−q1))
    * is pinned and replayed verbatim by the oracle, so the double
    * comparisons agree bit-for-bit.
    */
  def qIqrOutliers(spark: SparkSession, d: String): DataFrame = {
    val byValue = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val all = Window.partitionBy(col("event_type"))
    val ranked = events(spark, d)
      .select(col("event_type"), col("value"),
        row_number().over(byValue).as("rn"),
        count(lit(1)).over(all).as("cnt"))
    def pos(q: Double) = lit(1.0) + (lit(q) * (col("cnt") - 1).cast("double"))
    def lo(q: Double)  = floor(pos(q))
    def hi(q: Double)  = least(lo(q) + 1, col("cnt"))
    def pick(q: Double, tag: String) = Seq(
      max(when(col("rn") === lo(q), col("value"))).as(s"v_lo$tag"),
      max(when(col("rn") === hi(q), col("value"))).as(s"v_hi$tag"),
      max(pos(q) - lo(q).cast("double")).as(s"frac$tag"))
    def lerp(tag: String) =
      col(s"v_lo$tag") + ((col(s"v_hi$tag") - col(s"v_lo$tag")) * col(s"frac$tag"))
    val m = pick(0.25, "25") ++ pick(0.75, "75")
    val fences = ranked.groupBy(col("event_type"))
      .agg(m.head, m.tail: _*)
      .select(col("event_type"),
        lerp("25").as("q1"), lerp("75").as("q3"))
      .select(col("event_type"), col("q1"), col("q3"),
        (col("q1") - (lit(1.5) * (col("q3") - col("q1")))).as("lo"),
        (col("q3") + (lit(1.5) * (col("q3") - col("q1")))).as("hi"))
    events(spark, d)
      .join(broadcast(fences), "event_type")
      .groupBy(col("event_type"), col("q1"), col("q3"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
          .otherwise(0L)).as("n_out"))
      .select(col("event_type"), col("q1"), col("q3"), col("lo"), col("hi"),
        col("n_out"),
        (col("n_out").cast("double") / col("n_rows").cast("double"))
          .as("out_share"))
      .orderBy(col("event_type"))
  }

  /** q_theil_sen — Theil–Sen robust trend of monthly order revenue: the
    * median of all pairwise month-to-month slopes (and the median-residual
    * intercept), the estimator that shrugs off the outlier months that
    * wreck OLS ([[Mining.qLinreg]]'s fragile twin). The data collapses to
    * the ~80-row MONTHLY series first (exact cents sums — one hash agg),
    * so the "all pairs" is months², a calendar-bounded constant at any
    * data volume — the same domain-sized-tail stance as every quadratic
    * statistic in this module.
    *
    * Determinism: slopes are double ratios of exact BIGINTs (identical
    * IEEE division both engines); medians are LOWER medians picked by
    * row_number over the total order (slope, ma, mb) / (resid, mi) — no
    * averaging, no float summation anywhere.
    */
  def qTheilSen(spark: SparkSession, d: String): DataFrame = {
    val monthly = graft.Tables.cacheForSelfJoin(
      orders(spark, d)
        .select((year(col("o_orderdate")) * lit(12L) +
          (month(col("o_orderdate")) - lit(1L))).as("mi"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("c"))
        .groupBy(col("mi")).agg(sum(col("c")).as("cents")))
    val slopes = monthly.select(col("mi").as("ma"), col("cents").as("ca"))
      .join(monthly.select(col("mi").as("mb"), col("cents").as("cb")),
        col("ma") < col("mb"))
      .select(col("ma"), col("mb"),
        ((col("cb") - col("ca")).cast("double") /
          (col("mb") - col("ma")).cast("double")).as("slope"))
    val ws = Window.orderBy(col("slope"), col("ma"), col("mb"))
    val slopeMed = slopes
      .select(col("slope"), row_number().over(ws).as("rn"),
        count(lit(1)).over().as("n_pairs"))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("slope"), col("n_pairs"))
    val wr = Window.orderBy(col("resid"), col("mi"))
    monthly.crossJoin(broadcast(slopeMed))
      .select(col("mi"), col("n_pairs"), col("slope"),
        (col("cents").cast("double") - col("slope") * col("mi").cast("double"))
          .as("resid"))
      .select(col("mi"), col("n_pairs"), col("slope"), col("resid"),
        row_number().over(wr).as("rn"), count(lit(1)).over().as("n_months"))
      .filter(col("rn") === expr("(n_months + 1) div 2"))
      .select(col("n_months").cast("long").as("n_months"),
        col("n_pairs").cast("long").as("n_pairs"),
        col("slope"), col("resid").as("intercept"))
  }

  /** q_holt — Holt double exponential smoothing (level + trend) of the
    * per-type DAILY event-count series, α = β = 1/2: the forecasting
    * upgrade of [[Mining.qEwma]] (which tracks level only — a trending
    * series lags it forever). Like q_ewma the recurrence is inherently
    * sequential, so the log collapses to the (type × days) histogram
    * first and the fold runs per type over the calendar-bounded series;
    * α = β = 1/2 keeps every state value a DYADIC rational — the fold is
    * bit-exact in IEEE double on both engines, not just
    * deterministically rounded. Initialization: l₀ = x₀, b₀ = 0 via a
    * −1 sentinel (counts are ≥ 0). Output includes the one-step
    * forecast l + b — the value a monitoring baseline would page on.
    */
  def qHolt(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("x")))).as("dx"))
      .select(col("event_type"), col("n_days"),
        expr("aggregate(dx, named_struct('l', CAST(-1.0 AS DOUBLE), " +
          "'b', CAST(0.0 AS DOUBLE)), (acc, e) -> " +
          "IF(acc.l < CAST(0.0 AS DOUBLE), " +
          "named_struct('l', CAST(e.x AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)), " +
          "named_struct(" +
          "'l', CAST(0.5 AS DOUBLE) * CAST(e.x AS DOUBLE) + " +
          "CAST(0.5 AS DOUBLE) * (acc.l + acc.b), " +
          "'b', CAST(0.5 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * CAST(e.x AS DOUBLE) + " +
          "CAST(0.5 AS DOUBLE) * (acc.l + acc.b)) - acc.l) + " +
          "CAST(0.5 AS DOUBLE) * acc.b)))").as("st"))
      .select(col("event_type"), col("n_days"),
        col("st.l").as("level"), col("st.b").as("trend"),
        (col("st.l") + col("st.b")).as("forecast"))
      .orderBy(col("event_type"))

  /** q_js_div — Jensen–Shannon divergence between every pair of ingest
    * SOURCES' token distributions: the symmetric, bounded (≤ ln 2) drift
    * score a corpus pipeline uses to spot a feed whose content shifted —
    * the pairwise generalization of [[Mining.qPsi]]'s binned PSI.
    * JSD(P,Q) = ½Σ p·ln(p/m) + ½Σ q·ln(q/m), m = (p+q)/2, with absent
    * terms contributing p·ln2 (the 0-handling CASE both engines share).
    *
    * Plan: the corpus collapses to the (source × vocab) count matrix in
    * ONE hash aggregate; pair scoring is (sources choose 2) × |vocab| —
    * both factors are corpus-metadata-sized, so at 100 TB the expensive
    * part remains the single tokenizing scan, like every corpus statistic
    * here. Per-pair term sums are ordered folds (term-sorted), ln through
    * [[graft.functions.LnLibm]].
    *
    * Output is QUANTIZED — jsd_e12 = floor(jsd·10¹² + ½) as BIGINT — the
    * [[Analytics.qGeoDistance]] floor contract, because this query found
    * the first measured input where `Math.log` (HotSpot/fdlibm) and
    * glibc's `log` (DuckDB) disagree by 1 ulp (x = 0.8975352112676056,
    * bits …779: Java …896 vs libm …895), so raw-double ln output cannot
    * hash-match across engines in general. 10⁻¹² granularity dwarfs the
    * ulp-scale divergence; StatsSpec's margin tripwire asserts every
    * pair's jsd·10¹² sits far from its rounding boundary.
    */
  def qJsDiv(spark: SparkSession, d: String): DataFrame = {
    val ct = graft.Tables.cacheForSelfJoin(
      documents(spark, d)
        .select(col("source").as("src"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("src"), col("term")).agg(count(lit(1)).as("c")))
    val tot = ct.groupBy(col("src")).agg(sum(col("c")).as("tot"))
    val vocab = ct.select(col("term")).distinct()
    val srcs = tot.select(col("src"), col("tot"))
    val pairs = srcs.select(col("src").as("src_a"), col("tot").as("tot_a"))
      .join(srcs.select(col("src").as("src_b"), col("tot").as("tot_b")),
        col("src_a") < col("src_b"))
    val p = col("ca").cast("double") / col("tot_a").cast("double")
    val q = col("cb").cast("double") / col("tot_b").cast("double")
    val m = (p + q) / lit(2.0)
    pairs.crossJoin(vocab)
      .join(ct.select(col("src").as("src_a"), col("term"), col("c").as("ca")),
        Seq("src_a", "term"), "left")
      .join(ct.select(col("src").as("src_b"), col("term"), col("c").as("cb")),
        Seq("src_b", "term"), "left")
      .na.fill(0L, Seq("ca", "cb"))
      .select(col("src_a"), col("src_b"), col("term"),
        (when(col("ca") > 0L, (lit(0.5) * p) * lnLibm(p / m)).otherwise(lit(0.0)) +
          when(col("cb") > 0L, (lit(0.5) * q) * lnLibm(q / m)).otherwise(lit(0.0)))
          .as("t"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sort_array(collect_list(struct(col("term"), col("t")))).as("ts"))
      .select(col("src_a"), col("src_b"),
        floor(expr("aggregate(ts, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.t)") *
          lit(1.0e12) + lit(0.5)).cast("long").as("jsd_e12"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Fixed evaluation grid of [[qCdf]] — covers the fixture's value
    * range (0..490) at a 50-unit pitch; at scale the grid is the
    * analyst's resolution choice exactly like [[qKendallTau]]'s bins.
    */
  val CdfGrid: Seq[Int] = (1 to 9).map(_ * 50)

  /** q_cdf — empirical CDF of `value` per event type at the fixed
    * [[CdfGrid]] points: P(X ≤ g) as exact counts — the
    * distribution-drift readout two runs/segments compare pointwise
    * (the fixed-grid form of [[Mining.qKsTest]]'s sup-gap, and the
    * serving shape of a percentile dashboard: grid in, share out).
    *
    * Plan: ONE map-side-partial aggregate computes every grid counter
    * as a conditional sum — a single pass, no grid×data explode — then
    * the |types|-row result unpivots to (type, g) rows in-plan. All
    * counts exact BIGINT; cdf is one pinned division.
    */
  def qCdf(spark: SparkSession, d: String): DataFrame = {
    val counters = CdfGrid.map(g =>
      sum(when(col("value") <= lit(g.toDouble), 1L).otherwise(0L))
        .as(s"c$g")) :+ count(lit(1)).as("n")
    val unpivot = explode(array(CdfGrid.map(g =>
      struct(lit(g.toLong).as("g"), col(s"c$g").as("n_le"))): _*)).as("p")
    events(spark, d)
      .groupBy(col("event_type"))
      .agg(counters.head, counters.tail: _*)
      .select(col("event_type"), col("n"), unpivot)
      .select(col("event_type"), col("p.g").as("g"), col("p.n_le").as("n_le"),
        (col("p.n_le").cast("double") / col("n").cast("double")).as("cdf"))
      .orderBy(col("event_type"), col("g"))
  }

  /** q_fano — burstiness (Fano factor, var/mean) of each event type's
    * HOURLY arrival counts: ≈1 says Poisson-like arrivals, ≫1 says
    * bursts/incidents, ≪1 says rate-limited/metronomic traffic — the
    * one-number arrival-process diagnostic an ops dashboard tracks per
    * feed (and the statistic behind [[Mining.qEwma]]'s threshold
    * tuning). Sample variance via the exact-moment identity.
    *
    * Plan: the log collapses to the (type × hours) histogram in ONE
    * map-side-partial agg (the q_ewma stance), then n/Σx/Σx² — exact
    * BIGINTs per type — assemble var and fano in one pinned double
    * chain. Calendar-bounded everywhere.
    */
  def qFano(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
      .select(col("event_type"), col("n_hours"),
        (col("s").cast("double") / col("n_hours").cast("double")).as("mean"),
        ((col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double") /
            col("n_hours").cast("double")) /
          (col("n_hours") - lit(1L)).cast("double")).as("variance"))
      .select(col("event_type"), col("n_hours"), col("mean"), col("variance"),
        (col("variance") / col("mean")).as("fano"))
      .orderBy(col("event_type"))

  /** q_cohens_d — Cohen's d standardized effect size between the click and
    * error cohorts' values: the "is the difference MEANINGFUL, not just
    * significant" companion to [[Mining.qWelch]]'s t-test (t grows with n;
    * d doesn't). Pooled-variance form d = (m₁−m₂)/s_p with
    * s_p² = ((n₁−1)v₁ + (n₂−1)v₂)/(n₁+n₂−2).
    *
    * Plan: ONE conditional-aggregate pass folds both cohorts' exact cents
    * moments (n, Σc, Σc² — BIGINT, map-side partial); means/variances/d
    * are one pinned double chain over those integers, mirrored verbatim
    * in the oracle. Output is a single row.
    */
  def qCohensD(spark: SparkSession, d: String): DataFrame = {
    val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    events(spark, d)
      .filter(col("value").isNotNull && col("event_type").isin("click", "error"))
      .select((col("event_type") === "click").as("g"), cents.as("c"))
      .agg(
        count(when(col("g"), lit(1))).as("n1"),
        sum(when(col("g"), col("c"))).as("s1"),
        sum(when(col("g"), col("c") * col("c"))).as("ss1"),
        count(when(!col("g"), lit(1))).as("n2"),
        sum(when(!col("g"), col("c"))).as("s2"),
        sum(when(!col("g"), col("c") * col("c"))).as("ss2"))
      .select(col("n1"), col("n2"),
        expr("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)").as("mean_1"),
        expr("CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)").as("mean_2"),
        expr("(CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)" +
          " / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)").as("v1"),
        expr("(CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)" +
          " / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)").as("v2"))
      .select(col("n1"), col("n2"), col("mean_1"), col("mean_2"),
        expr("(mean_1 - mean_2) / sqrt(((CAST(n1 AS DOUBLE) - 1.0) * v1 + " +
          "(CAST(n2 AS DOUBLE) - 1.0) * v2) / " +
          "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0))").as("cohens_d"))
  }

  /** q_kruskal — Kruskal–Wallis H test of `value` across ALL event types:
    * [[qAnova]]'s distribution-free counterpart (and [[Mining.qMannWhitney]]
    * extended from 2 to k groups) — the "do ANY of the feeds differ in
    * level" gate that is robust to the heavy tails production metrics
    * actually have. Midrank ties exactly: 2·midrank = 2·cum_lt + n_v + 1
    * keeps every rank sum BIGINT (no .5 anywhere); H from the standard
    * identity H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1) with the tie
    * correction H' = H / (1 − Σ(t³−t)/(N³−N)).
    *
    * Plan: the log collapses to per-(value, type) counts in ONE map-side-
    * partial aggregate; everything downstream is domain-sized (distinct
    * values), the [[Mining.qMannWhitney]] stance — the single-task rank
    * window runs on the value domain, never the log. (2R_g)² can exceed
    * 2⁶³ (R_g ~ N²), so the per-group square lives in DOUBLE; the
    * cross-group Σ is a g-ordered fold (5 terms) mirrored by the oracle's
    * list_reduce. Tie/cube terms bound: n_v, N < 2²¹ (the documented
    * [[Mining.qMannWhitney]] BIGINT bound — beyond it, widen to
    * DECIMAL(38,0) on both engines).
    */
  def qKruskal(spark: SparkSession, d: String): DataFrame = {
    val pvg = graft.Tables.cacheForSelfJoin(
      events(spark, d)
        .filter(col("value").isNotNull)
        .select(col("value").as("v"), col("event_type").as("g"))
        .groupBy(col("v"), col("g"))
        .agg(count(lit(1)).as("n_gv")))
    val pv = pvg.groupBy(col("v")).agg(sum(col("n_gv")).as("nv"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = pv.select(col("v"), col("nv"),
      (sum(col("nv")).over(w) - col("nv")).as("cumlt"))
    val ties = pv.agg(
      sum(col("nv") * col("nv") * col("nv") - col("nv")).as("t"))
    pvg.join(cum, "v")
      .groupBy(col("g"))
      .agg(
        sum(col("n_gv") * (lit(2L) * col("cumlt") + col("nv") + lit(1L)))
          .as("r2"),
        sum(col("n_gv")).as("ng"))
      .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sort_array(collect_list(struct(col("g"),
          (col("r2").cast("double") * col("r2").cast("double") /
            (lit(4.0) * col("ng").cast("double"))).as("s")))).as("gs"))
      .crossJoin(broadcast(ties))
      .select(col("k"), col("n"), col("t"),
        expr("aggregate(gs, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.s)")
          .as("s"))
      .select(col("k"), col("n"), col("t"),
        expr("12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * s" +
          " - 3.0 * (CAST(n AS DOUBLE) + 1.0)").as("h"))
      .select(col("k"), col("n"), col("h"),
        expr("h / (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE)" +
          " * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))")
          .as("h_tie"))
  }

  /** q_levene — Brown–Forsythe (median-based Levene) test of variance
    * homogeneity across event types: [[qAnova]]'s own PRECONDITION check
    * (classic ANOVA assumes equal group variances; this is the robust
    * test that decides whether to trust it or fall back to Welch). W is
    * the one-way ANOVA F computed on absolute deviations from each
    * group's median — the median (not mean) choice is what makes it
    * robust to the heavy tails production metrics have.
    *
    * Plan: the log collapses to per-(type, cents) counts in ONE map-side
    * aggregate and NEVER reappears — group medians come from a cumsum
    * window over the domain-sized count relation (the [[Mining
    * .qMannWhitney]] stance; picks the lower-median row where the cumsum
    * first crosses (n+1) DIV 2), deviations are |c − m| per DISTINCT
    * value weighted by its count, and the F chain is [[qAnova]]'s pinned
    * chain verbatim. Lower-median convention (exact integer, no .5)
    * documented rather than interpolated — the statistic's robustness
    * properties are unchanged. All moments BIGINT → only the final
    * chain is double.
    */
  def qLevene(spark: SparkSession, d: String): DataFrame = {
    val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    val counts = graft.Tables.cacheForSelfJoin(
      events(spark, d)
        .filter(col("value").isNotNull)
        .select(col("event_type").as("g"), cents.as("c"))
        .groupBy(col("g"), col("c"))
        .agg(count(lit(1)).as("n_c")))
    val wcum = Window.partitionBy(col("g")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wall = Window.partitionBy(col("g"))
    val med = counts
      .select(col("g"), col("c"), col("n_c"),
        sum(col("n_c")).over(wcum).as("cum"),
        sum(col("n_c")).over(wall).as("n_g"))
      .filter(col("cum") >= expr("(n_g + 1) DIV 2") &&
        (col("cum") - col("n_c")) < expr("(n_g + 1) DIV 2"))
      .select(col("g"), col("c").as("m"))
    counts.join(broadcast(med), "g")
      .select(col("g"), col("n_c"), abs(col("c") - col("m")).as("z"))
      .groupBy(col("g"))
      .agg(sum(col("n_c")).as("n_g"),
        sum(col("n_c") * col("z")).as("s_g"),
        sum(col("n_c") * col("z") * col("z")).as("ss_g"))
      .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
        sort_array(collect_list(struct(col("g"),
          (col("s_g").cast("double") * col("s_g").cast("double") /
            col("n_g").cast("double")).as("a")))).as("ga"))
      .select(col("k"), col("n"), col("s"), col("ss"),
        expr("aggregate(ga, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.a)")
          .as("a"))
      .select(col("k"), col("n"),
        (col("a") - col("s").cast("double") * col("s").cast("double") /
          col("n").cast("double")).as("ssb"),
        (col("ss").cast("double") - col("a")).as("ssw"))
      .select(col("k"), col("n"), col("ssb"), col("ssw"),
        ((col("ssb") / (col("k") - lit(1L)).cast("double")) /
          (col("ssw") / (col("n") - col("k")).cast("double"))).as("w"))
  }

  /** SAX breakpoints for alphabet size 4: the standard N(0,1) quartile
    * cuts (Lin et al. 2003). The quartile of the normal is an irrational;
    * 0.6745 is the conventional 4-digit literal, and BOTH engines parse
    * the same literal — the comparison is bit-deterministic because z
    * itself is exact-integer-derived.
    */
  val SaxQ = 0.6745

  /** q_sax — SAX symbolic discretization (Lin et al. 2003) of each event
    * type's hourly-count series: z-normalize per type, cut at the N(0,1)
    * quartiles, emit one symbol a–d per hour. SAX is the front door to
    * whole families of cheap sequence analytics (motif discovery,
    * discord/anomaly search, sequence indexing) because downstream work
    * runs on a tiny alphabet instead of doubles — the discretization a
    * monitoring pipeline stores next to the raw series.
    *
    * Determinism: the usual z = (x−μ)/σ chain would put TWO divisions
    * and a subtraction between engines; instead z is algebraically
    * rearranged to (n·x − Σx)/√(n·Σx² − (Σx)²) — numerator and radicand
    * are EXACT BIGINTs, so the whole statistic is one integer→double
    * cast, one IEEE sqrt and ONE division: bit-identical cross-engine,
    * and the a–d cut points compare against the same parsed literal.
    *
    * Plan: the log collapses to the (type × hour) histogram in one
    * map-side-partial agg (the [[qFano]] stance); per-type moments are a
    * type-sized second agg broadcast back; the symbol projection is
    * per-row codegen. Nothing is ever wider than the histogram.
    */
  def qSax(spark: SparkSession, d: String): DataFrame = {
    val hourly = events(spark, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val mom = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
    hourly.join(broadcast(mom), "event_type")
      .select(col("event_type"), graft.Tables.tsSeconds(col("h")).as("h_s"),
        col("x"),
        ((col("n") * col("x") - col("s")).cast("double") /
          sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double")))
          .as("z"))
      .select(col("event_type"), col("h_s"), col("x"), col("z"),
        when(col("z") < -SaxQ, "a")
          .when(col("z") < 0.0, "b")
          .when(col("z") < SaxQ, "c")
          .otherwise("d").as("symbol"))
      .orderBy(col("event_type"), col("h_s"))
  }

  /** Half-width of [[qStl]]'s centered moving-average trend window
    * (25 hours total — one full day plus the centering hour, the
    * classic hourly-series choice).
    */
  val StlHalf = 12

  /** q_stl — additive seasonal-trend decomposition of each event type's
    * hourly-count series (the STL shape: trend by centered moving
    * average, seasonal by per-phase mean of the detrended series,
    * remainder as what's left): x = trend + seasonal + resid, seasonal
    * phase = hour-of-day. The decomposition behind every "is this spike
    * load growth, daily rhythm, or an incident?" triage — [[qFano]] and
    * [[Mining.qSeasonality]]-style profiles read the components; this
    * materializes them per hour.
    *
    * Determinism: the trend window aggregates INTEGER sum+count (a
    * sliding double-sum's addition order differs between engines —
    * Spark re-folds each frame, DuckDB segment-trees it; integer sums
    * are order-free), so trend = one division per row. The seasonal
    * means fold the detrended doubles in pinned h_s order (per-phase
    * groups are days-count-sized — bounded state; the [[Similarity]]
    * chunked-fold upgrade applies past ~10⁵ days). resid = the same
    * (x − trend) − seasonal chain in both engines.
    *
    * Plan: histogram agg → two windows over it (type-partitioned, tiny)
    * → a phase-grain agg joined back. The corpus is touched once.
    */
  def qStl(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-StlHalf, StlHalf)
    val det = events(spark, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .select(col("event_type"), col("h"), col("x"),
        (sum(col("x")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("trend"))
      .select(col("event_type"), graft.Tables.tsSeconds(col("h")).as("h_s"),
        hour(col("h")).as("hod"), col("x"), col("trend"),
        (col("x").cast("double") - col("trend")).as("det"))
    val seasonal = det.groupBy(col("event_type"), col("hod"))
      .agg(sort_array(collect_list(struct(col("h_s"), col("det")))).as("ds"),
        count(lit(1)).as("np"))
      .select(col("event_type"), col("hod"),
        (expr("aggregate(ds, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.det)") /
          col("np").cast("double")).as("seasonal"))
    det.join(seasonal, Seq("event_type", "hod"))
      .select(col("event_type"), col("h_s"), col("x"), col("trend"),
        col("seasonal"),
        ((col("x").cast("double") - col("trend")) - col("seasonal"))
          .as("resid"))
      .orderBy(col("event_type"), col("h_s"))
  }

  /** Permutation count for [[qFdrBh]] — p-value resolution 1/(R+1). */
  val FdrPerms = 200

  /** q_fdr_bh — Benjamini–Hochberg FDR control over a FAMILY of per-type
    * hypothesis tests: each event type gets a permutation test of "do
    * the two halves of the deterministic A/B split (`user_id % 2`)
    * differ in events-per-user", and the five resulting p-values go
    * through the BH step-up (reject the k smallest with p₍ₖ₎ ≤ αk/m).
    * The multiple-comparisons layer every experiment dashboard needs on
    * top of the single-test operators ([[Mining.qWelch]],
    * [[Mining.qMannWhitney]], [[Behavior]]'s q_prop_test) — without it,
    * a 20-metric scorecard at α=0.05 false-alarms once per refresh.
    *
    * The per-test p-value is a PERMUTATION p-value, and every step is
    * EXACT INTEGER arithmetic — no normal/t CDF (whose erf/tgamma would
    * diverge across libms): the test statistic is the difference in
    * per-side mean event counts, compared CROSS-MULTIPLIED (|Sᴬnᴮ −
    * Sᴮnᴬ|·d₀ vs |num₀|·d with d = nᴬnᴮ — all BIGINT, no division), and
    * the permuted assignment for replicate r is the portable 60-bit md5
    * of `user_id|r` mod 2 (the [[TextOps.md5Long]] split idiom — a
    * seeded permutation both engines replay bit-identically). p =
    * (1 + #extreme) / (R+1) is an exact rational; the only doubles are
    * that final division and the αk/m threshold, each ONE pinned
    * expression. Degenerate permutations (an empty side) count as
    * extreme — the conservative convention.
    *
    * Plan: the log collapses to (type, user) counts FIRST (the one
    * corpus-sized pass, map-side partial); the ×(R+1) replicate fan-out
    * is over that bounded relation, so work is |types|·|users|·R —
    * independent of event volume; R is the resolution/cost knob. The BH
    * step-up runs in an unpartitioned window over m = |types| rows
    * (the q_auc bounded-window stance). At 10⁹ users the cross-products
    * approach 2⁶³ — the documented widening knob is DECIMAL(38,0) for
    * the two |num|·d products.
    */
  def qFdrBh(spark: SparkSession, d: String): DataFrame = {
    val perUser = events(spark, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val fan = perUser
      .select(col("event_type"), col("user_id"), col("c"),
        explode(sequence(lit(0), lit(FdrPerms))).as("r"))
      .select(col("event_type"), col("c"), col("r"),
        when(col("r") === 0, col("user_id") % 2L)
          .otherwise(TextOps.md5Long(
            concat(col("user_id").cast("string"), lit("|"),
              col("r").cast("string")), 15) % 2L).as("side"))
    val stat = fan.groupBy(col("event_type"), col("r"))
      .agg(sum(when(col("side") === 0L, col("c"))).as("sa"),
        sum(when(col("side") === 0L, 1L).otherwise(0L)).as("na"),
        sum(when(col("side") === 1L, col("c"))).as("sb"),
        sum(when(col("side") === 1L, 1L).otherwise(0L)).as("nb"))
      .select(col("event_type"), col("r"), col("na"), col("nb"),
        abs(coalesce(col("sa"), lit(0L)) * col("nb") -
          coalesce(col("sb"), lit(0L)) * col("na")).as("num"),
        (col("na") * col("nb")).as("den"))
    val obs = stat.filter(col("r") === 0)
      .select(col("event_type"), (col("na") + col("nb")).as("n_users"),
        col("num").as("num0"), col("den").as("den0"))
    val p = stat.filter(col("r") >= 1)
      .join(obs, "event_type")
      .groupBy(col("event_type"), col("n_users"))
      .agg(sum(when(col("den") === 0L ||
          col("num") * col("den0") >= col("num0") * col("den"), 1L)
        .otherwise(0L)).as("n_extreme"))
      .select(col("event_type"), col("n_users"),
        ((lit(1L) + col("n_extreme")).cast("double") /
          lit((FdrPerms + 1).toDouble)).as("p_perm"))
    val byP = Window.orderBy(col("p_perm"), col("event_type"))
    p.withColumn("k", row_number().over(byP))
      .withColumn("m", count(lit(1)).over(byP.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("event_type"), col("n_users"), col("p_perm"), col("k"),
        ((lit(0.05) * col("k").cast("double")) / col("m").cast("double"))
          .as("bh_thr"))
      .withColumn("kmax",
        max(when(col("p_perm") <= col("bh_thr"), col("k"))).over(
          Window.orderBy(col("k")).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("event_type"), col("n_users"), col("p_perm"), col("k"),
        col("bh_thr"),
        when(col("k") <= coalesce(col("kmax"), lit(0)), 1).otherwise(0)
          .as("reject"))
      .orderBy(col("k"))
  }

  /** Total sample budget allocated by [[qNeymanAlloc]]. */
  val NeymanBudget = 1000L

  /** q_neyman_alloc — Neyman-optimal stratified-sampling allocation of a
    * [[NeymanBudget]]-document sample across sources, next to the naive
    * proportional split: stratum h gets n·N_h·S_h / Σ N_h·S_h (Neyman
    * 1934) — the variance-minimizing design under a fixed budget, and
    * the number a 100 TB curation pipeline needs BEFORE sampling (a
    * high-variance source deserves more than its row share; a uniform
    * boilerplate feed needs almost none). The readout is the per-source
    * plan: size, stddev of n_chars, Neyman share, allocated n, and the
    * proportional n it replaces.
    *
    * Determinism: the three stratum moments (count, Σx, Σx²) are exact
    * BIGINTs from ONE map-side-partial aggregate; the variance numerator
    * n·Σx²−(Σx)² is assembled in DECIMAL(38,0) (exact — BIGINT would
    * overflow near ~10⁶ rows × 10⁴ chars) and becomes a double in ONE
    * pinned division; S_h = sqrt (IEEE-correctly-rounded, engine-exact);
    * the cross-stratum Σ N_h·S_h folds in source order (`sort_array` +
    * `aggregate` ⇔ `list_reduce` with ORDER BY — the module's ordered
    * double-fold contract); allocations are floor(x+0.5) over those
    * pinned doubles, and the proportional column stays all-integer
    * ((2n·N_h+N) DIV 2N — round-half-up without ever leaving BIGINT).
    *
    * Plan: one hash aggregate over documents (map-side partial), then
    * everything is |sources|-sized: the fold is a 1-row broadcast
    * attached by crossJoin — nothing after the first agg scales with
    * corpus volume.
    */
  def qNeymanAlloc(spark: SparkSession, d: String): DataFrame = {
    val moments = documents(spark, d)
      .select(col("source"), col("n_chars").cast("long").as("x"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_h"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
    // The |sources|-row stratum relation feeds BOTH the per-stratum rows
    // and the 1-row fold; the duplicated subtree sits under the identical
    // (source) agg exchange, so ReuseExchange computes the corpus pass
    // once at runtime — no cache needed (measured equal-or-faster).
    val perStratum = moments.select(col("source"), col("n_h"),
      sqrt(greatest(
        ((col("s2").cast("decimal(38,0)") * col("n_h") -
          col("s1").cast("decimal(38,0)") * col("s1")).cast("double")) /
          (col("n_h") * (col("n_h") - lit(1L))).cast("double"),
        lit(0.0))).as("s_h"))
      .select(col("source"), col("n_h"), col("s_h"),
        (col("n_h").cast("double") * col("s_h")).as("w_h"))
    val totals = perStratum
      .agg(sum(col("n_h")).as("n_total"),
        sort_array(collect_list(struct(col("source"), col("w_h"))))
          .as("ws"))
      .select(col("n_total"),
        expr("aggregate(ws, 0.0D, (acc, e) -> acc + e.w_h)").as("w_total"))
    perStratum.crossJoin(broadcast(totals))
      .select(col("source"), col("n_h").as("n_docs"), col("s_h"),
        (col("w_h") / col("w_total")).as("neyman_share"),
        floor(lit(NeymanBudget.toDouble) * col("w_h") / col("w_total") +
          lit(0.5)).cast("long").as("neyman_n"),
        expr(s"(${2L * NeymanBudget} * n_h + n_total) DIV (2 * n_total)")
          .as("prop_n"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_neyman_alloc" -> qNeymanAlloc _,
    "q_sax"          -> qSax _,
    "q_stl"          -> qStl _,
    "q_cohens_d"     -> qCohensD _,
    "q_kruskal"      -> qKruskal _,
    "q_levene"       -> qLevene _,
    "q_cdf"          -> qCdf _,
    "q_fano"         -> qFano _,
    "q_spearman"     -> qSpearman _,
    "q_kendall_tau"  -> qKendallTau _,
    "q_anova"        -> qAnova _,
    "q_cramers_v"    -> qCramersV _,
    "q_iqr_outliers" -> qIqrOutliers _,
    "q_theil_sen"    -> qTheilSen _,
    "q_holt"         -> qHolt _,
    "q_js_div"       -> qJsDiv _,
    "q_fdr_bh"       -> qFdrBh _,
  )

  val oracle: Map[String, String] = Map(
    "q_neyman_alloc" ->
      s"""WITH m AS (
         |  SELECT source, COUNT(*) AS n_h,
         |         CAST(SUM(n_chars) AS BIGINT) AS s1,
         |         CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
         |  FROM documents GROUP BY source
         |), w AS (
         |  SELECT source, n_h,
         |         sqrt(greatest(
         |           CAST(CAST(s2 AS HUGEINT) * n_h
         |              - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
         |           / CAST(n_h * (n_h - 1) AS DOUBLE), 0.0)) AS s_h
         |  FROM m
         |), ww AS (
         |  SELECT source, n_h, s_h, CAST(n_h AS DOUBLE) * s_h AS w_h FROM w
         |), tot AS (
         |  SELECT CAST(SUM(n_h) AS BIGINT) AS n_total,
         |         list_reduce(list_prepend(0.0, list(w_h ORDER BY source)),
         |                     (a, b) -> a + b) AS w_total
         |  FROM ww
         |)
         |SELECT ww.source, ww.n_h AS n_docs, ww.s_h,
         |       ww.w_h / t.w_total AS neyman_share,
         |       CAST(floor($NeymanBudget.0 * ww.w_h / t.w_total + 0.5)
         |         AS BIGINT) AS neyman_n,
         |       (${2 * NeymanBudget} * ww.n_h + t.n_total)
         |         // (2 * t.n_total) AS prop_n
         |FROM ww CROSS JOIN tot t
         |ORDER BY source""".stripMargin,
    "q_fdr_bh" ->
      s"""WITH pu AS (
         |  SELECT event_type, user_id, COUNT(*) AS c
         |  FROM events GROUP BY event_type, user_id
         |), fan AS (
         |  SELECT event_type, c, r,
         |         CASE WHEN r = 0 THEN user_id % 2
         |              ELSE ('0x' || substr(md5(CAST(user_id AS VARCHAR)
         |                || '|' || CAST(r AS VARCHAR)), 1, 15))::BIGINT % 2
         |         END AS side
         |  FROM (SELECT event_type, user_id, c,
         |               unnest(generate_series(0, $FdrPerms)) AS r
         |        FROM pu)
         |), agg AS (
         |  SELECT event_type, r,
         |         CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |         CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |         CAST(COALESCE(SUM(CASE WHEN side = 0 THEN c END), 0) AS BIGINT) AS sa,
         |         CAST(COALESCE(SUM(CASE WHEN side = 1 THEN c END), 0) AS BIGINT) AS sb
         |  FROM fan GROUP BY event_type, r
         |), stat AS (
         |  SELECT event_type, r, na, nb,
         |         abs(sa * nb - sb * na) AS num, na * nb AS den
         |  FROM agg
         |), obs AS (
         |  SELECT event_type, na + nb AS n_users, num AS num0, den AS den0
         |  FROM stat WHERE r = 0
         |), pv AS (
         |  SELECT s.event_type, o.n_users,
         |         CAST(1 + SUM(CASE WHEN s.den = 0
         |             OR s.num * o.den0 >= o.num0 * s.den
         |           THEN 1 ELSE 0 END) AS DOUBLE) / ${FdrPerms + 1}.0 AS p_perm
         |  FROM stat s JOIN obs o ON s.event_type = o.event_type
         |  WHERE s.r >= 1
         |  GROUP BY s.event_type, o.n_users
         |), ranked AS (
         |  SELECT event_type, n_users, p_perm,
         |         CAST(ROW_NUMBER() OVER (ORDER BY p_perm, event_type) AS INT) AS k,
         |         COUNT(*) OVER () AS m
         |  FROM pv
         |), thr AS (
         |  SELECT event_type, n_users, p_perm, k,
         |         (0.05 * CAST(k AS DOUBLE)) / CAST(m AS DOUBLE) AS bh_thr
         |  FROM ranked
         |)
         |SELECT event_type, n_users, p_perm, k, bh_thr,
         |       CASE WHEN k <= COALESCE(
         |           MAX(CASE WHEN p_perm <= bh_thr THEN k END) OVER (), 0)
         |         THEN 1 ELSE 0 END AS reject
         |FROM thr ORDER BY k""".stripMargin,
    "q_sax" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS h,
         |         CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY event_type, h
         |), mom AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(x) AS BIGINT) AS s,
         |         CAST(SUM(x * x) AS BIGINT) AS ss
         |  FROM hourly GROUP BY event_type
         |), z AS (
         |  SELECT hourly.event_type,
         |         strftime(h, '%Y-%m-%d %H:%M:%S') AS h_s, x,
         |         CAST(n * x - s AS DOUBLE)
         |           / sqrt(CAST(n * ss - s * s AS DOUBLE)) AS z
         |  FROM hourly JOIN mom USING (event_type)
         |)
         |SELECT event_type, h_s, x, z,
         |       CASE WHEN z < -$SaxQ THEN 'a'
         |            WHEN z < 0.0 THEN 'b'
         |            WHEN z < $SaxQ THEN 'c'
         |            ELSE 'd' END AS symbol
         |FROM z ORDER BY event_type, h_s""".stripMargin,
    "q_stl" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS h,
         |         CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY event_type, h
         |), det AS (
         |  SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS h_s,
         |         CAST(hour(h) AS INTEGER) AS hod, x,
         |         CAST(SUM(x) OVER w AS DOUBLE)
         |           / CAST(COUNT(*) OVER w AS DOUBLE) AS trend,
         |         CAST(x AS DOUBLE) - (CAST(SUM(x) OVER w AS DOUBLE)
         |           / CAST(COUNT(*) OVER w AS DOUBLE)) AS det
         |  FROM hourly
         |  WINDOW w AS (PARTITION BY event_type ORDER BY h
         |               ROWS BETWEEN $StlHalf PRECEDING
         |               AND $StlHalf FOLLOWING)
         |), seasonal AS (
         |  SELECT event_type, hod,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list(det ORDER BY h_s)), (acc, e) -> acc + e)
         |           / CAST(COUNT(*) AS DOUBLE) AS seasonal
         |  FROM det GROUP BY event_type, hod
         |)
         |SELECT d.event_type, d.h_s, d.x, d.trend, s.seasonal,
         |       (CAST(d.x AS DOUBLE) - d.trend) - s.seasonal AS resid
         |FROM det d JOIN seasonal s
         |  ON d.event_type = s.event_type AND d.hod = s.hod
         |ORDER BY d.event_type, d.h_s""".stripMargin,
    "q_levene" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |), counts AS (
        |  SELECT g, c, COUNT(*) AS n_c FROM b GROUP BY g, c
        |), cm AS (
        |  SELECT g, c, n_c,
        |         SUM(n_c) OVER (PARTITION BY g ORDER BY c
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(n_c) OVER (PARTITION BY g) AS n_all
        |  FROM counts
        |), med AS (
        |  SELECT g, c AS m FROM cm
        |  WHERE cum >= (n_all + 1) // 2 AND cum - n_c < (n_all + 1) // 2
        |), z AS (
        |  SELECT counts.g, n_c, abs(c - m) AS z
        |  FROM counts JOIN med ON counts.g = med.g
        |), gm AS (
        |  SELECT g, CAST(SUM(n_c) AS BIGINT) AS n_g,
        |         CAST(SUM(n_c * z) AS BIGINT) AS s_g,
        |         CAST(SUM(n_c * z * z) AS BIGINT) AS ss_g
        |  FROM z GROUP BY g
        |), s AS (
        |  SELECT COUNT(*) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
        |         CAST(SUM(s_g) AS BIGINT) AS s, CAST(SUM(ss_g) AS BIGINT) AS ss,
        |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
        |                / CAST(n_g AS DOUBLE) ORDER BY g)),
        |           (acc, x) -> acc + x) AS a
        |  FROM gm
        |), parts AS (
        |  SELECT k, n,
        |         a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
        |         CAST(ss AS DOUBLE) - a AS ssw
        |  FROM s
        |)
        |SELECT k, n, ssb, ssw,
        |       (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)) AS w
        |FROM parts""".stripMargin,
    "q_kruskal" ->
      """WITH b AS (
        |  SELECT value AS v, event_type AS g FROM events
        |  WHERE value IS NOT NULL
        |), pvg AS (
        |  SELECT v, g, COUNT(*) AS n_gv FROM b GROUP BY v, g
        |), pv AS (
        |  SELECT v, CAST(SUM(n_gv) AS BIGINT) AS nv FROM pvg GROUP BY v
        |), c AS (
        |  SELECT v, nv,
        |         CAST(SUM(nv) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nv
        |           AS BIGINT) AS cumlt
        |  FROM pv
        |), rg AS (
        |  SELECT g,
        |         CAST(SUM(n_gv * (2 * cumlt + nv + 1)) AS BIGINT) AS r2,
        |         CAST(SUM(n_gv) AS BIGINT) AS ng
        |  FROM pvg JOIN c USING (v) GROUP BY g
        |), tt AS (
        |  SELECT CAST(SUM(nv * nv * nv - nv) AS BIGINT) AS t FROM pv
        |), agg AS (
        |  SELECT COUNT(*) AS k, CAST(SUM(ng) AS BIGINT) AS n,
        |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
        |             / (4.0 * CAST(ng AS DOUBLE)) ORDER BY g)),
        |           (acc, x) -> acc + x) AS s
        |  FROM rg
        |), hh AS (
        |  SELECT k, n, t,
        |         12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * s
        |           - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h
        |  FROM agg CROSS JOIN tt
        |)
        |SELECT k, n, h,
        |       h / (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE)
        |         * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
        |         AS h_tie
        |FROM hh""".stripMargin,
    "q_cohens_d" ->
      """WITH b AS (
        |  SELECT (event_type = 'click') AS g,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'error')
        |), m AS (
        |  SELECT
        |    COUNT(CASE WHEN g THEN 1 END) AS n1,
        |    CAST(SUM(CASE WHEN g THEN c END) AS BIGINT) AS s1,
        |    CAST(SUM(CASE WHEN g THEN c * c END) AS BIGINT) AS ss1,
        |    COUNT(CASE WHEN NOT g THEN 1 END) AS n2,
        |    CAST(SUM(CASE WHEN NOT g THEN c END) AS BIGINT) AS s2,
        |    CAST(SUM(CASE WHEN NOT g THEN c * c END) AS BIGINT) AS ss2
        |  FROM b
        |), v AS (
        |  SELECT n1, n2,
        |         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_1,
        |         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean_2,
        |         (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |            / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
        |         (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |            / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) AS v2
        |  FROM m
        |)
        |SELECT n1, n2, mean_1, mean_2,
        |       (mean_1 - mean_2) / sqrt(((CAST(n1 AS DOUBLE) - 1.0) * v1 +
        |         (CAST(n2 AS DOUBLE) - 1.0) * v2) /
        |         (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)) AS cohens_d
        |FROM v""".stripMargin,
    "q_cdf" ->
      """WITH grid AS (SELECT unnest(generate_series(1, 9)) * 50 AS g),
        |c AS (
        |  SELECT event_type, g,
        |         CAST(SUM(CASE WHEN value <= CAST(g AS DOUBLE)
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_le,
        |         COUNT(*) AS n
        |  FROM events CROSS JOIN grid GROUP BY event_type, g
        |)
        |SELECT event_type, CAST(g AS BIGINT) AS g, n_le,
        |       CAST(n_le AS DOUBLE) / CAST(n AS DOUBLE) AS cdf
        |FROM c ORDER BY event_type, g""".stripMargin,
    "q_fano" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, COUNT(*) AS n_hours,
        |         CAST(SUM(x) AS BIGINT) AS s,
        |         CAST(SUM(x * x) AS BIGINT) AS ss
        |  FROM hourly GROUP BY event_type
        |), v AS (
        |  SELECT event_type, n_hours,
        |         CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE) AS mean,
        |         (CAST(ss AS DOUBLE)
        |            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |              / CAST(n_hours AS DOUBLE))
        |         / CAST(n_hours - 1 AS DOUBLE) AS variance
        |  FROM m
        |)
        |SELECT event_type, n_hours, mean, variance,
        |       variance / mean AS fano
        |FROM v ORDER BY event_type""".stripMargin,
    "q_spearman" ->
      """WITH r AS (SELECT value AS x, epoch_us(ts) AS y FROM events),
        |xr AS (
        |  SELECT x, COUNT(*) AS nv,
        |         SUM(COUNT(*)) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
        |           - COUNT(*) AS cumlt
        |  FROM r GROUP BY x
        |), xr2 AS (SELECT x, 2 * cumlt + nv + 1 AS rx2 FROM xr),
        |yr AS (
        |  SELECT y, COUNT(*) AS nv,
        |         SUM(COUNT(*)) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
        |           - COUNT(*) AS cumlt
        |  FROM r GROUP BY y
        |), yr2 AS (SELECT y, 2 * cumlt + nv + 1 AS ry2 FROM yr),
        |s AS (
        |  SELECT COUNT(*) AS n,
        |         CAST(SUM(rx2) AS BIGINT) AS sx,
        |         CAST(SUM(ry2) AS BIGINT) AS sy,
        |         CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy,
        |         CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
        |         CAST(SUM(ry2 * ry2) AS BIGINT) AS syy
        |  FROM r JOIN xr2 USING (x) JOIN yr2 USING (y)
        |)
        |SELECT n,
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho
        |FROM s""".stripMargin,
    "q_kendall_tau" ->
      """WITH cells AS (
        |  SELECT CAST(hour(ts) AS BIGINT) AS hx,
        |         CAST(floor(value / 50.0) AS BIGINT) AS hy,
        |         COUNT(*) AS m
        |  FROM events GROUP BY 1, 2
        |), pq AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN a.hy < b.hy THEN a.m * b.m ELSE 0 END) AS BIGINT) AS p,
        |    CAST(SUM(CASE WHEN a.hy > b.hy THEN a.m * b.m ELSE 0 END) AS BIGINT) AS q
        |  FROM cells a JOIN cells b ON a.hx < b.hx
        |), marg AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM cells),
        |tx AS (
        |  SELECT CAST(SUM(nx * (nx - 1) // 2) AS BIGINT) AS tx
        |  FROM (SELECT CAST(SUM(m) AS BIGINT) AS nx FROM cells GROUP BY hx)
        |), ty AS (
        |  SELECT CAST(SUM(ny * (ny - 1) // 2) AS BIGINT) AS ty
        |  FROM (SELECT CAST(SUM(m) AS BIGINT) AS ny FROM cells GROUP BY hy)
        |)
        |SELECT n, p AS n_conc, q AS n_disc,
        |       CAST(p - q AS DOUBLE)
        |       / sqrt(CAST(n * (n - 1) // 2 - tx AS DOUBLE)
        |              * CAST(n * (n - 1) // 2 - ty AS DOUBLE)) AS tau_b
        |FROM pq, marg, tx, ty""".stripMargin,
    "q_anova" ->
      """WITH g AS (
        |  SELECT event_type, COUNT(*) AS n_g,
        |         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_g,
        |         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |                  * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS ss_g
        |  FROM events GROUP BY event_type
        |), s AS (
        |  SELECT COUNT(*) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
        |         CAST(SUM(s_g) AS BIGINT) AS s, CAST(SUM(ss_g) AS BIGINT) AS ss,
        |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
        |                / CAST(n_g AS DOUBLE) ORDER BY event_type)),
        |           (acc, x) -> acc + x) AS a
        |  FROM g
        |), parts AS (
        |  SELECT k, n,
        |         a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
        |         CAST(ss AS DOUBLE) - a AS ssw
        |  FROM s
        |)
        |SELECT k, n, ssb, ssw,
        |       (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)) AS f
        |FROM parts""".stripMargin,
    "q_cramers_v" ->
      """WITH cells AS (
        |  SELECT event_type AS g, (epoch_us(ts) // 86400000000) % 7 AS dw,
        |         COUNT(*) AS o
        |  FROM events GROUP BY 1, 2
        |), rt AS (SELECT g, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY g),
        |ct AS (SELECT dw, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY dw),
        |n AS (
        |  SELECT CAST(SUM(o) AS BIGINT) AS n,
        |         CAST(COUNT(DISTINCT g) AS BIGINT) AS r,
        |         CAST(COUNT(DISTINCT dw) AS BIGINT) AS c
        |  FROM cells
        |), terms AS (
        |  SELECT n.n, n.r, n.c, cells.g, cells.dw,
        |         (CAST(o AS DOUBLE)
        |            - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
        |              / CAST(n.n AS DOUBLE))
        |         * (CAST(o AS DOUBLE)
        |            - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
        |              / CAST(n.n AS DOUBLE))
        |         / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
        |            / CAST(n.n AS DOUBLE)) AS t
        |  FROM cells JOIN rt USING (g) JOIN ct USING (dw) CROSS JOIN n
        |), chi AS (
        |  SELECT n, r, c,
        |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(t ORDER BY g, dw)), (acc, x) -> acc + x) AS chi2
        |  FROM terms GROUP BY n, r, c
        |)
        |SELECT n, r, c, chi2,
        |       sqrt(chi2 / (CAST(n AS DOUBLE)
        |                    * CAST(least(r, c) - 1 AS DOUBLE))) AS v
        |FROM chi""".stripMargin,
    "q_iqr_outliers" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events
        |), q AS (
        |  SELECT event_type,
        |    MAX(CASE WHEN rn = CAST(floor(1.0 + (0.25 * CAST(cnt - 1 AS DOUBLE))) AS BIGINT)
        |             THEN value END) AS v_lo25,
        |    MAX(CASE WHEN rn = least(CAST(floor(1.0 + (0.25 * CAST(cnt - 1 AS DOUBLE))) AS BIGINT) + 1, cnt)
        |             THEN value END) AS v_hi25,
        |    MAX((1.0 + (0.25 * CAST(cnt - 1 AS DOUBLE)))
        |        - floor(1.0 + (0.25 * CAST(cnt - 1 AS DOUBLE)))) AS frac25,
        |    MAX(CASE WHEN rn = CAST(floor(1.0 + (0.75 * CAST(cnt - 1 AS DOUBLE))) AS BIGINT)
        |             THEN value END) AS v_lo75,
        |    MAX(CASE WHEN rn = least(CAST(floor(1.0 + (0.75 * CAST(cnt - 1 AS DOUBLE))) AS BIGINT) + 1, cnt)
        |             THEN value END) AS v_hi75,
        |    MAX((1.0 + (0.75 * CAST(cnt - 1 AS DOUBLE)))
        |        - floor(1.0 + (0.75 * CAST(cnt - 1 AS DOUBLE)))) AS frac75
        |  FROM ranked GROUP BY event_type
        |), fences AS (
        |  SELECT event_type,
        |         v_lo25 + ((v_hi25 - v_lo25) * frac25) AS q1,
        |         v_lo75 + ((v_hi75 - v_lo75) * frac75) AS q3
        |  FROM q
        |), f2 AS (
        |  SELECT event_type, q1, q3,
        |         q1 - (1.5 * (q3 - q1)) AS lo,
        |         q3 + (1.5 * (q3 - q1)) AS hi
        |  FROM fences
        |)
        |SELECT e.event_type, q1, q3, lo, hi,
        |       CAST(SUM(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_out,
        |       CAST(SUM(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)
        |            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS out_share
        |FROM events e JOIN f2 ON e.event_type = f2.event_type
        |GROUP BY e.event_type, q1, q3, lo, hi
        |ORDER BY e.event_type""".stripMargin,
    "q_theil_sen" ->
      """WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS BIGINT) AS mi,
        |         CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |), slopes AS (
        |  SELECT a.mi AS ma, b.mi AS mb,
        |         CAST(b.cents - a.cents AS DOUBLE)
        |           / CAST(b.mi - a.mi AS DOUBLE) AS slope
        |  FROM monthly a JOIN monthly b ON a.mi < b.mi
        |), sm AS (
        |  SELECT slope, n_pairs FROM (
        |    SELECT slope,
        |           ROW_NUMBER() OVER (ORDER BY slope, ma, mb) AS rn,
        |           COUNT(*) OVER () AS n_pairs
        |    FROM slopes)
        |  WHERE rn = (n_pairs + 1) // 2
        |), resid AS (
        |  SELECT mi, n_pairs, slope,
        |         CAST(cents AS DOUBLE) - slope * CAST(mi AS DOUBLE) AS resid
        |  FROM monthly CROSS JOIN sm
        |)
        |SELECT CAST(n_months AS BIGINT) AS n_months,
        |       CAST(n_pairs AS BIGINT) AS n_pairs, slope, resid AS intercept
        |FROM (
        |  SELECT n_pairs, slope, resid,
        |         ROW_NUMBER() OVER (ORDER BY resid, mi) AS rn,
        |         COUNT(*) OVER () AS n_months
        |  FROM resid)
        |WHERE rn = (n_months + 1) // 2""".stripMargin,
    "q_holt" ->
      // State rides a LIST [l, b], not a STRUCT: DuckDB's list_reduce
      // assembles a struct accumulator FIELD-BY-FIELD against the
      // accumulator storage, so a struct state's second field would see
      // the first field already overwritten (measured: b' computed with
      // acc.l = l'); list_value materializes the whole new state from the
      // old one, matching Spark's functional named_struct semantics.
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2
        |), folded AS (
        |  SELECT event_type, COUNT(*) AS n_days,
        |         list_reduce(list_prepend(
        |           [CAST(-1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
        |           list([CAST(x AS DOUBLE)] ORDER BY day)),
        |           (acc, e) -> CASE WHEN acc[1] < CAST(0.0 AS DOUBLE)
        |             THEN [e[1], CAST(0.0 AS DOUBLE)]
        |             ELSE [CAST(0.5 AS DOUBLE) * e[1]
        |                     + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
        |                   CAST(0.5 AS DOUBLE)
        |                     * ((CAST(0.5 AS DOUBLE) * e[1]
        |                         + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]))
        |                        - acc[1])
        |                     + CAST(0.5 AS DOUBLE) * acc[2]] END) AS st
        |  FROM daily GROUP BY event_type
        |)
        |SELECT event_type, n_days, st[1] AS level, st[2] AS trend,
        |       st[1] + st[2] AS forecast
        |FROM folded ORDER BY event_type""".stripMargin,
    "q_js_div" ->
      """WITH ct AS (
        |  SELECT source AS src, unnest(string_split(text, ' ')) AS term
        |  FROM documents
        |), cnt AS (
        |  SELECT src, term, COUNT(*) AS c FROM ct GROUP BY src, term
        |), tot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY src),
        |vocab AS (SELECT DISTINCT term FROM cnt),
        |pairs AS (
        |  SELECT a.src AS src_a, a.tot AS tot_a, b.src AS src_b, b.tot AS tot_b
        |  FROM tot a JOIN tot b ON a.src < b.src
        |), terms AS (
        |  SELECT src_a, src_b, v.term,
        |         COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb,
        |         tot_a, tot_b
        |  FROM pairs CROSS JOIN vocab v
        |  LEFT JOIN cnt ca ON ca.src = src_a AND ca.term = v.term
        |  LEFT JOIN cnt cb ON cb.src = src_b AND cb.term = v.term
        |), scored AS (
        |  SELECT src_a, src_b, term,
        |    (CASE WHEN ca > 0 THEN
        |       (0.5 * (CAST(ca AS DOUBLE) / CAST(tot_a AS DOUBLE)))
        |       * ln((CAST(ca AS DOUBLE) / CAST(tot_a AS DOUBLE))
        |            / ((CAST(ca AS DOUBLE) / CAST(tot_a AS DOUBLE)
        |                + CAST(cb AS DOUBLE) / CAST(tot_b AS DOUBLE)) / 2.0))
        |     ELSE CAST(0.0 AS DOUBLE) END)
        |    + (CASE WHEN cb > 0 THEN
        |       (0.5 * (CAST(cb AS DOUBLE) / CAST(tot_b AS DOUBLE)))
        |       * ln((CAST(cb AS DOUBLE) / CAST(tot_b AS DOUBLE))
        |            / ((CAST(ca AS DOUBLE) / CAST(tot_a AS DOUBLE)
        |                + CAST(cb AS DOUBLE) / CAST(tot_b AS DOUBLE)) / 2.0))
        |     ELSE CAST(0.0 AS DOUBLE) END) AS t
        |  FROM terms
        |)
        |SELECT src_a, src_b,
        |       CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         list(t ORDER BY term)), (acc, x) -> acc + x)
        |         * 1.0e12 + 0.5) AS BIGINT) AS jsd_e12
        |FROM scored GROUP BY src_a, src_b
        |ORDER BY src_a, src_b""".stripMargin,
  )
}
