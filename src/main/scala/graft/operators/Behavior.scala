package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-behavior analytics (SURVEY.md §2e/§2f extensions): RFM
  * segmentation, cohort lifetime value, calibration/testing statistics —
  * the marketing-science layer a behavioral event warehouse runs on top
  * of the reference's raw per-source insight surface
  * (/root/reference/app.py:200-293, which stops at counts and a latest
  * row).
  *
  * Shared determinism contract (same as [[Mining]]): monetary values
  * become BIGINT cents at the scan (`floor(v*100 + 0.5)` — identical
  * IEEE ops in both engines), every aggregate is integer-exact, and
  * doubles appear only in final projections with one pinned
  * parenthesization mirrored in the oracle.
  */
object Behavior {

  /** Monetary double → exact BIGINT cents. The fixture's `value` /
    * `o_totalprice` carry 2 decimal digits; `v*100` is the same IEEE
    * multiply in Spark and DuckDB and `floor(+0.5)` the same rounding,
    * so both engines land on the identical integer.
    */
  private def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** q_rfm — RFM (recency / frequency / monetary) quartile segmentation
    * of purchasers: the classic behavioral-cohort cut. Per user, ONE
    * pass over the purchase rows folds all three facts (last purchase
    * day, purchase count, cents sum); recency is measured against the
    * fixture-wide latest event day (a 1-row broadcast — deterministic
    * from data, no wall clock). Each metric is quartiled with `ntile(4)`
    * under a TOTAL order (metric, then user_id), so tie placement is
    * pinned; the output is the 4×4×4 segment matrix with user counts
    * and exact cents mass.
    *
    * Scale: the raw events shuffle ONCE (the per-user fold); everything
    * after is user-sized or smaller. The three ntile windows are global
    * (single-partition) sorts of the per-user aggregate — fine while
    * |purchasers| fits one task (same stance as q_decile_lift); at 10⁹
    * users swap ntile for precomputed quartile boundaries joined back
    * broadcast. All counts/cents BIGINT → hash-exact.
    */
  def qRfm(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
    val anchor = ev.agg(max(date_trunc("day", col("ts"))).as("anchor"))
    val perUser = ev
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(date_trunc("day", col("ts"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(cents(col("value"))).as("cents"))
      .crossJoin(broadcast(anchor))
      .select(col("user_id"), col("freq"), col("cents"),
        datediff(col("anchor"), col("last_day")).cast("long").as("recency"))
    val rq = Window.orderBy(col("recency"), col("user_id"))
    val fq = Window.orderBy(col("freq").desc, col("user_id"))
    val mq = Window.orderBy(col("cents").desc, col("user_id"))
    perUser
      .select(col("user_id"), col("cents"),
        ntile(4).over(rq).cast("long").as("r_q"),
        ntile(4).over(fq).cast("long").as("f_q"),
        ntile(4).over(mq).cast("long").as("m_q"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("seg_cents"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  /** q_ltv — cohort lifetime-value curve: customers cohorted by first
    * order month, revenue accumulated per month offset. Like
    * [[Analytics.qRetention]], the textbook two-shuffle formulation
    * (per-customer first-month aggregate joined back to raw orders) is
    * folded into ONE per-customer pass: `min(month)` and the order list
    * (`collect_list`, bounded by per-customer order count) come out of
    * a single shuffle, the explode + month arithmetic and the cohort
    * matrix are aggregate-sized, and the cumulative sum runs per cohort
    * over a handful of offsets. Every value is BIGINT cents → exact.
    */
  def qLtv(spark: SparkSession, d: String): DataFrame = {
    val cum = Window.partitionBy(col("cohort_s")).orderBy(col("month_offset"))
      .rowsBetween(Window.unboundedPreceding, 0)
    orders(spark, d)
      .select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).as("month"),
        cents(col("o_totalprice")).as("cents"))
      .groupBy(col("o_custkey"))
      .agg(min(col("month")).as("cohort"),
        collect_list(struct(col("month"), col("cents"))).as("os"))
      .select(col("cohort"), explode(col("os")).as("o"))
      .groupBy(tsSeconds(col("cohort")).as("cohort_s"),
        (months_between(col("o.month"), col("cohort"))).cast("long").as("month_offset"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o.cents")).as("rev_cents"))
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(cum))
      .orderBy(col("cohort_s"), col("month_offset"))
  }

  private def lnLibm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.LnLibm(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** q_prop_test — two-proportion z-test on user conversion between the
    * two halves of a deterministic A/B split (`user_id % 2`): the
    * experiment-readout statistic. Conversion = "made a high-value
    * (≥150.00) purchase" — a mid-range rate; bare "any purchase" is
    * degenerate on this fixture (every user converts, pooled variance
    * 0). ONE per-user pass folds the variant and the converted flag;
    * the per-variant table is 2 rows; the final row is a conditional
    * re-aggregate. All counts BIGINT; p0/p1/z are pinned double chains
    * (`sqrt` is IEEE correctly-rounded, so the whole expression is
    * bit-identical across engines); a degenerate pooled rate (0 or 1)
    * yields NULL z via the same CASE guard in both engines — under
    * ANSI mode Spark (correctly) refuses even double division by zero
    * rather than emitting ±Inf.
    *
    * Scale: the only shuffle is the per-user fold (map-side partial);
    * everything downstream is constant-sized.
    */
  def qPropTest(spark: SparkSession, d: String): DataFrame = {
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    val v = events(spark, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= lit(150.0),
        lit(1L)).otherwise(lit(0L))).as("conv"))
      .select(pmod(col("user_id"), lit(2L)).as("variant"), col("conv"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val w = v.agg(
      max(when(col("variant") === 0L, col("n"))).as("n0"),
      max(when(col("variant") === 0L, col("c"))).as("c0"),
      max(when(col("variant") === 1L, col("n"))).as("n1"),
      max(when(col("variant") === 1L, col("c"))).as("c1"))
    val p0 = dbl(col("c0")) / dbl(col("n0"))
    val p1 = dbl(col("c1")) / dbl(col("n1"))
    val pp = dbl(col("c0") + col("c1")) / dbl(col("n0") + col("n1"))
    w.select(col("n0"), col("c0"), col("n1"), col("c1"),
      p0.as("p0"), p1.as("p1"),
      when((col("c0") + col("c1")) > 0L && (col("c0") + col("c1")) < (col("n0") + col("n1")),
        (p0 - p1) /
          sqrt((pp * (lit(1.0) - pp)) *
            ((lit(1.0) / dbl(col("n0"))) + (lit(1.0) / dbl(col("n1")))))).as("z"))
  }

  /** q_survival — Kaplan-Meier survival over signup→purchase conversion
    * with right-censoring at last activity: duration = days from a
    * user's first signup to their first subsequent purchase (observed)
    * or to their last event (censored). The life table carries, per
    * distinct duration, the at-risk count (suffix sum over durations —
    * a DESC cumulative window, no inequality join), the event count,
    * and the log-survival curve ln S(t) = Σ_{u≤t} ln((n_u−d_u)/n_u).
    *
    * The curve is reported in LOG space: the cumulative product becomes
    * a cumulative SUM of [[graft.functions.LnLibm]] factors — libm-exact
    * in both engines — folded left-to-right by an ordered ROWS window
    * (deterministic sequential order on both sides), sidestepping both
    * float-product non-associativity and any exp() mismatch.
    *
    * Scale: ONE per-user shuffle folds signup/censor/purchase-list
    * facts (the purchase list is bounded by per-user activity, the
    * same contract as q_retention's day set); the life table is
    * |distinct durations| rows (calendar-bounded), so the two
    * single-partition windows are over a tiny relation.
    */
  def qSurvival(spark: SparkSession, d: String): DataFrame = {
    val pu = events(spark, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("tsig"),
        max(col("ts")).as("tmax"),
        collect_list(when(col("event_type") === "purchase", col("ts"))).as("purch"))
      .filter(col("tsig").isNotNull)
      .select(col("tsig"), col("tmax"),
        array_min(filter(col("purch"), p => p >= col("tsig"))).as("tp"))
    val u = pu.select(
      when(col("tp").isNotNull, lit(1L)).otherwise(lit(0L)).as("observed"),
      datediff(date_trunc("day", coalesce(col("tp"), col("tmax"))),
        date_trunc("day", col("tsig"))).cast("long").as("t"))
    val g = u.groupBy(col("t"))
      .agg(sum(col("observed")).as("d"), count(lit(1)).as("n_all"))
    val riskW = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val survW = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // The KM product hits EXACT zero on a step where every remaining
    // at-risk user events (d == n_risk — only possible at the maximum
    // duration, since n_risk is a suffix count). ln S is undefined from
    // that step on: both engines carry NULL there (DuckDB refuses ln(0)
    // outright; Math.log(0) would yield -Inf), via the same pair of
    // guards — the factor guard keeps ln(0) out of the running sum, the
    // zero-step counter NULLs every row at/after the zero step.
    g.withColumn("n_risk", sum(col("n_all")).over(riskW))
      .withColumn("zero_steps",
        sum(when(col("d") === col("n_risk"), lit(1L)).otherwise(lit(0L))).over(survW))
      .withColumn("ln_surv",
        when(col("zero_steps") === 0L,
          sum(when(col("d") < col("n_risk"),
            lnLibm((col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double")))).over(survW)))
      .select(col("t"), col("n_risk"), col("d"), col("ln_surv"))
      .orderBy(col("t"))
  }

  /** q_rolling_median — exact trailing-7-day median of daily revenue per
    * event type: the robust smoother ops dashboards overlay on spiky
    * daily series (a rolling MEAN follows one outlier day; the median
    * doesn't). Daily cents are BIGINT (one map-side-partial aggregate
    * over the log); the rolling exact `percentile(0.5)` runs per type
    * over a ROWS frame of 7 calendar-bounded aggregate rows. Median of
    * exact ints < 2⁵² is exactly representable (int or half-int) and
    * both engines interpolate `a + (b−a)·0.5` — hash-exact.
    *
    * Scale: the window partitions by event_type over the DAILY aggregate
    * (rows = types × days, calendar-bounded) — the expensive relation
    * never meets a window.
    */
  def qRollingMedian(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    events(spark, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(cents(col("value"))).as("day_cents"))
      .withColumn("med7_cents", percentile(col("day_cents"), lit(0.5)).over(w))
      .select(col("event_type"), tsSeconds(col("day")).as("day_s"),
        col("day_cents"), col("med7_cents"))
      .orderBy(col("event_type"), col("day_s"))
  }

  /** q_calibration — reliability table for a score against outcomes
    * (the companion to q_auc's ranking view: AUC says the score ORDERS
    * well, calibration says its MAGNITUDE means what it claims). The
    * `value` column is binned into 10 equal-width bins between the
    * data min/max (1-row broadcast stats — no wall-clock, no collect),
    * and each bin reports its observed purchase rate and exact mean
    * score. Counts BIGINT; the bin index, rate, and mean are pinned
    * double chains (bin edges from one broadcast min/max, mean via
    * exactSum/count).
    *
    * Scale: one map-side-partial aggregate for the stats row, one for
    * the 10-bin table — two passes over the scan, zero wide shuffles.
    */
  def qCalibration(spark: SparkSession, d: String): DataFrame = {
    val stats = events(spark, d)
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    events(spark, d)
      .crossJoin(broadcast(stats))
      .select(
        when(col("vmax") > col("vmin"),
          least(floor(((col("value") - col("vmin")) /
            (col("vmax") - col("vmin"))) * lit(10.0)), lit(9.0)))
          .otherwise(lit(0.0)).cast("long").as("bin"),
        when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)).as("pos"),
        col("value"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        graft.Tables.exactAvg(col("value")).as("avg_score"))
      .withColumn("obs_rate", col("n_pos").cast("double") / col("n").cast("double"))
      .select(col("bin"), col("n"), col("n_pos"), col("obs_rate"), col("avg_score"))
      .orderBy(col("bin"))
  }

  /** q_attribution — U-shaped (position-based) multi-touch attribution:
    * each purchase closes a journey; the non-purchase touches since the
    * user's previous purchase share the conversion credit 40/20/40
    * (first / middles / last; all of it for a lone touch, 50/50 for a
    * pair). Credit is integer MICRO-units with truncating division for
    * the middle share — exact in both engines (the float alternative
    * would need an ordered fold per journey); the per-journey remainder
    * (≤ n−3 micro) is deliberately dropped, identically on both sides.
    * Trailing touches with no subsequent purchase convert nothing and
    * are excluded by a per-user total-conversion bound.
    *
    * Plan: journeys are gaps-and-islands — the journey id is a
    * cumulative count of prior purchases (one ordered window per user),
    * position/size are one more window pair over (user, journey), and
    * the final surface is a |types|-row aggregate. All windows partition
    * by user — parallel across the user dimension, never global.
    */
  def qAttribution(spark: SparkSession, d: String): DataFrame = {
    val userW = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val jw = Window.partitionBy(col("user_id"), col("jid"))
      .orderBy(col("ts"), col("event_id"))
    val marked = events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)).as("is_conv"))
      .withColumn("jid", coalesce(
        sum(col("is_conv")).over(userW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("total_conv",
        sum(col("is_conv")).over(Window.partitionBy(col("user_id"))))
    marked
      .filter(col("is_conv") === 0L && col("jid") < col("total_conv"))
      .withColumn("rn", row_number().over(jw).cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("user_id"), col("jid"))))
      .withColumn("credit",
        when(col("n") === 1L, lit(1000000L))
          .when(col("n") === 2L, lit(500000L))
          .when(col("rn") === 1L || col("rn") === col("n"), lit(400000L))
          .otherwise(expr("200000L div (n - 2L)")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("credit_micro"))
      .orderBy(col("event_type"))
  }

  /** q_cohort_matrix — the weekly retention MATRIX: users grouped by
    * their first-ever active week (the cohort), each later week's
    * activity expressed as a RATE of the cohort's size — the triangle
    * every product-analytics dashboard renders, and the denominator
    * [[Analytics.qRetention]]'s raw day-offset counts deliberately leave
    * out (counts compare cohorts of different sizes incomparably; rates
    * are the decision surface).
    *
    * Plan: events collapse to the DISTINCT user-week grain first (one
    * hash aggregate — the fact never reappears), the per-user cohort is
    * a window min over that user-partitioned relation (same shuffle the
    * dedup already paid), cells are a second calendar-sized aggregate,
    * and the cohort-size denominator is the matrix's own offset-0 column
    * joined back broadcast. Rate = one pinned integer division.
    */
  def qCohortMatrix(spark: SparkSession, d: String): DataFrame = {
    // Purchase events only: "active" for a retention matrix means the
    // VALUE action, and the fixture's all-event stream has every user
    // touching every week (a degenerate all-1.0 matrix says nothing).
    val uw = events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val withCohort = uw.withColumn("cohort",
      min(col("wk")).over(Window.partitionBy(col("user_id"))))
    val cells = graft.Tables.cacheForSelfJoin(
      withCohort.groupBy(col("cohort"),
        expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)").as("week_offset"))
        .agg(count(lit(1)).as("n_active")))
    val sizes = cells.filter(col("week_offset") === 0L)
      .select(col("cohort"), col("n_active").as("n_cohort"))
    cells.join(broadcast(sizes), "cohort")
      .select(tsSeconds(col("cohort")).as("cohort_s"), col("week_offset"),
        col("n_active"), col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort").cast("double"))
          .as("retention"))
      .orderBy(col("cohort_s"), col("week_offset"))
  }

  /** Anonymity threshold for [[qKAnonymity]]: groups smaller than K are
    * re-identification risks (the conventional release bar).
    */
  val AnonK = 5L

  /** q_k_anonymity — the privacy-release audit: group the customer table
    * by its quasi-identifier tuple (market segment × nation × coarse
    * balance band — the attributes an attacker can link from outside),
    * and report each
    * equivalence class's size, its distinct count of the sensitive
    * attribute (order priority of the customer's orders — l-diversity's
    * l), and whether the class passes k ≥ [[AnonK]] — plus the overall
    * share of ROWS at risk. This is the check a dataset must pass
    * before leaving the curated zone; a class of size < k means those
    * customers are re-identifiable by their public attributes alone.
    *
    * Plan: one customer⋈orders join carries only three columns; the
    * class relation is a |segments×nations|-sized hash aggregate;
    * at-risk share via a 1-row broadcast. All-integer + one pinned
    * division.
    */
  def qKAnonymity(spark: SparkSession, d: String): DataFrame = {
    val classes = graft.Tables.cacheForSelfJoin(
      customer(spark, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / lit(2500.0)).cast("long").as("bal_band"))
        .join(orders(spark, d).select(col("o_custkey"), col("o_orderpriority")),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
        .agg(countDistinct(col("c_custkey")).as("k"),
          countDistinct(col("o_orderpriority")).as("l_div")))
    val risk = classes.agg(
      sum(when(col("k") < AnonK, col("k")).otherwise(0L)).as("n_at_risk"),
      sum(col("k")).as("n_total"))
    classes.crossJoin(broadcast(risk))
      .select(col("c_mktsegment"), col("c_nationkey"), col("bal_band"),
        col("k"), col("l_div"),
        (col("k") >= AnonK).as("passes_k"),
        (col("n_at_risk").cast("double") / col("n_total").cast("double"))
          .as("at_risk_share"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
  }

  /** q_cuped — CUPED variance reduction for the A/B readout: each
    * user's post-period spend adjusted by their PRE-period spend
    * (Y' = Y − θ·(X − X̄), θ = cov(X,Y)/var(X)) — the standard
    * experimentation trick that removes between-user baseline variance
    * from the treatment comparison, often halving required sample size.
    * Periods split at day 15 of the fixture window; variant =
    * user_id mod 2 ([[qPropTest]]'s deterministic split).
    *
    * Determinism: ALL moments (n, Σx, Σy, Σxy, Σx²) are exact BIGINT
    * cent sums from ONE per-user fold (x·y ≲ 10¹⁰ per user — widen to
    * DECIMAL(38,0) past ~10⁸-cent users, documented); θ and the
    * adjusted means are single pinned double chains over those
    * integers, mirrored verbatim. Plan: one fact shuffle (per-user
    * fold); everything after is 2-row / 1-row relations broadcast.
    */
  def qCuped(spark: SparkSession, d: String): DataFrame = {
    val perUser = graft.Tables.cacheForSelfJoin(
      events(spark, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(
          sum(when(dayofmonth(col("ts")) <= 15, cents(col("value")))
            .otherwise(0L)).as("x"),
          sum(when(dayofmonth(col("ts")) > 15, cents(col("value")))
            .otherwise(0L)).as("y"))
        .select(pmod(col("user_id"), lit(2L)).as("variant"),
          col("x"), col("y")))
    val g = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nD = col("n").cast("double")
    val theta = (col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double") / nD) /
      (col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") / nD)
    val xbar = col("sx").cast("double") / nD
    perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_v"),
        sum(col("x")).as("sx_v"), sum(col("y")).as("sy_v"))
      .crossJoin(broadcast(g.select(theta.as("theta"), xbar.as("xbar"))))
      .select(col("variant"), col("n_v"),
        (col("sy_v").cast("double") / col("n_v").cast("double"))
          .as("mean_y"),
        ((col("sy_v").cast("double") / col("n_v").cast("double")) -
          col("theta") *
            ((col("sx_v").cast("double") / col("n_v").cast("double")) -
              col("xbar"))).as("adj_mean_y"),
        col("theta"))
      .orderBy(col("variant"))
  }

  /** Normal quantiles for [[qMde]]'s 95%-power/5%-size design — the
    * conventional z₀.₉₇₅ and z₀.₈ constants, fixed so the closed form
    * is pure arithmetic.
    */
  val ZAlpha = 1.959963984540054
  val ZPower = 0.8416212335729143

  /** q_mde — minimum detectable effect of the running A/B split: given
    * each variant's user count and the pooled baseline conversion rate
    * (the [[qPropTest]] population), the smallest absolute rate lift a
    * 5%-size / 80%-power two-proportion test can detect —
    * MDE = (z_α/2 + z_β)·√(p(1−p)(1/n₀+1/n₁)). THE experiment-planning
    * readout ("is this test even worth running at current traffic?"),
    * computed from the same exact counts the test itself uses.
    *
    * One per-user fold → 2-row variant table → 1-row closed form; the
    * only doubles are the final pinned chain (sqrt is correctly
    * rounded — bit-identical cross-engine).
    */
  def qMde(spark: SparkSession, d: String): DataFrame = {
    val v = events(spark, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
        col("value") >= lit(150.0), 1L).otherwise(0L)).as("conv"))
      .select(pmod(col("user_id"), lit(2L)).as("variant"), col("conv"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val w = v.agg(
      max(when(col("variant") === 0L, col("n"))).as("n0"),
      max(when(col("variant") === 1L, col("n"))).as("n1"),
      sum(col("c")).as("c_all"), sum(col("n")).as("n_all"))
    val p = col("c_all").cast("double") / col("n_all").cast("double")
    w.select(col("n0"), col("n1"), col("c_all"), p.as("p_base"),
      (lit(ZAlpha + ZPower) *
        sqrt((p * (lit(1.0) - p)) *
          ((lit(1.0) / col("n0").cast("double")) +
            (lit(1.0) / col("n1").cast("double"))))).as("mde"))
  }

  /** [[qWindowFunnel]] window: a chain must complete within 3 days of
    * its FIRST step.
    */
  val FunnelWindowUs: Long = 3L * 24 * 3600 * 1000000L

  /** q_window_funnel — the time-BOUNDED ordered funnel (the windowFunnel
    * operator ClickHouse popularized, re-expressed Spark-first): per
    * user, the deepest view → click → purchase chain whose steps occur
    * in order AND within [[FunnelWindowUs]] of the chain's first step,
    * reported as the level histogram. [[Analytics.qFunnel]] counts
    * unordered lifetime reach; THIS is the conversion-window semantics a
    * growth team actually quotes ("converted within 3 days of first
    * view"). Semantics pinned exactly (greedy earliest chain): t₁ =
    * first view; t₂ = first click after t₁ within the window of t₁;
    * t₃ = first purchase after t₂ within the window of t₁.
    *
    * Plan: ONE per-user shuffle; the chain state machine is an ORDERED
    * fold over the user's sorted event structs — each event encoded as
    * the SAME struct shape as the accumulator (its µs in the slot of
    * its step, −1 elsewhere), so the fold is a uniform-type reduce that
    * DuckDB's list_reduce replays verbatim. Per-user state is three
    * BIGINTs; the histogram is a ≤4-row aggregate. All-integer →
    * hash-exact.
    */
  def qWindowFunnel(spark: SparkSession, d: String): DataFrame = {
    val enc = expr(
      """named_struct(
        |  'us', unix_micros(ts), 'eid', event_id,
        |  't1', CASE WHEN event_type = 'view' THEN unix_micros(ts)
        |             ELSE CAST(-1 AS BIGINT) END,
        |  't2', CASE WHEN event_type = 'click' THEN unix_micros(ts)
        |             ELSE CAST(-1 AS BIGINT) END,
        |  't3', CASE WHEN event_type = 'purchase' THEN unix_micros(ts)
        |             ELSE CAST(-1 AS BIGINT) END)""".stripMargin)
    val zero =
      "named_struct('us', CAST(-1 AS BIGINT), 'eid', CAST(-1 AS BIGINT), " +
        "'t1', CAST(-1 AS BIGINT), 't2', CAST(-1 AS BIGINT), " +
        "'t3', CAST(-1 AS BIGINT))"
    val step =
      s"""(s, e) -> named_struct(
         |  'us', e.us, 'eid', e.eid,
         |  't1', CASE WHEN s.t1 >= 0 THEN s.t1 ELSE e.t1 END,
         |  't2', CASE WHEN s.t2 >= 0 THEN s.t2
         |             WHEN s.t1 >= 0 AND e.t2 > s.t1
         |                  AND e.t2 <= s.t1 + $FunnelWindowUs THEN e.t2
         |             ELSE CAST(-1 AS BIGINT) END,
         |  't3', CASE WHEN s.t3 >= 0 THEN s.t3
         |             WHEN s.t1 >= 0 AND s.t2 >= 0 AND e.t3 > s.t2
         |                  AND e.t3 <= s.t1 + $FunnelWindowUs THEN e.t3
         |             ELSE CAST(-1 AS BIGINT) END)""".stripMargin
    events(spark, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), enc.as("e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col("user_id"),
        expr(s"aggregate(evs, $zero, $step)").as("f"))
      .select(col("user_id"),
        when(col("f.t3") >= 0L, 3L).when(col("f.t2") >= 0L, 2L)
          .when(col("f.t1") >= 0L, 1L).otherwise(0L).as("level"))
      .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("level"))
  }

  /** q_bitmap_rollup — DAU + rolling 7-day WAU per day computed through
    * BITMAP WORDS: users pack into 63-bit BIGINT words (`bucket =
    * user_id div 63`, bit `user_id mod 63`), a day's activity per bucket
    * is one `bit_or` word, the 7-day window is a word-wise OR of the
    * contributing days, and distinct counts are `sum(bit_count(word))`.
    * The roaring-bitmap scheme every production engagement store uses
    * (Druid/ClickHouse/Snowflake BITMAP_* do exactly this), and the
    * scalable twin of [[graft.operators.Analytics.qWau]]: that query
    * fans out |user-days|×7 DISTINCT rows; this one's window state is
    * |buckets|×|days| words — a 63× compression that also turns the
    * distinct-count into a popcount with NO second dedup shuffle.
    * 63-bit words (not 64) because the oracle's `1::BIGINT << 63`
    * overflows signed range in DuckDB; capping the shift at 62 keeps
    * both engines in defined-behavior territory.
    *
    * Plan: events collapse to (day, bucket) words in ONE hash aggregate
    * (map-side partial `bit_or` — associative, so partials combine
    * exactly); the ×7 sequence-explode fan-out is bounded by the window
    * length, never the data; phantom trailing windows drop against the
    * broadcast day spine. At 10⁹ users a day is 1.6·10⁷ words — the
    * whole rollup is calendar×buckets-sized, independent of event
    * volume. All-BIGINT bit ops → hash-exact.
    */
  def qBitmapRollup(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d).select(
      expr("unix_micros(date_trunc('day', ts)) DIV 86400000000").as("dy"),
      expr("user_id DIV 63").as("bucket"),
      expr("CAST(user_id % 63 AS INT)").as("bit"))
    val daily = ev.groupBy(col("dy"), col("bucket"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("w"))
    val days = daily.select(col("dy")).distinct()
    val dau = daily.groupBy(col("dy"))
      .agg(sum(expr("bit_count(w)")).as("dau"))
    val wau7 = daily
      .select(explode(sequence(col("dy"), col("dy") + lit(6L))).as("td"),
        col("bucket"), col("w"))
      .join(broadcast(days.select(col("dy").as("td"))), "td")
      .groupBy(col("td"), col("bucket"))
      .agg(expr("bit_or(w)").as("w7"))
      .groupBy(col("td")).agg(sum(expr("bit_count(w7)")).as("wau7"))
    dau.join(wau7, col("dy") === col("td"))
      .select(
        tsSeconds(timestamp_micros(col("dy") * lit(86400000000L))).as("day_s"),
        col("dau"), col("wau7"))
      .orderBy(col("day_s"))
  }

  /** q_dp_counts — ε-differentially-private per-(type, day) event counts
    * via the Laplace mechanism: release count + Lap(Δ/ε) with
    * sensitivity Δ=1 (one event moves one cell by one) and ε=1. The
    * privacy layer a shared analytics surface publishes through —
    * counts leave the engine only after calibrated noise.
    *
    * DERANDOMIZED FOR THE GATE: production draws the Laplace sample
    * from a CSPRNG; here the uniform is the cell's portable 60-bit md5
    * hash scaled to [0,1) (the [[graft.operators.TextOps]] hash idiom),
    * pushed through the standard inverse-CDF transform
    * `−sign(u−½)·b·ln(1−2|u−½|)`. Same mechanism, same distribution
    * across cells, reproducible in both engines — the documented
    * seeded-noise testing stance (same as a seeded `rand(42)` but
    * engine-portable). ln goes through the codegen'd [[lnLibm]] so the
    * released double is bit-identical to DuckDB's.
    *
    * Plan: one hash aggregate to cells, then per-row scalar math —
    * nothing after the groupBy exceeds |types|×|days| rows.
    */
  def qDpCounts(spark: SparkSession, d: String): DataFrame = {
    val cnt = events(spark, d)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('day', ts)) DIV 86400000000").as("dy"))
      .groupBy(col("event_type"), col("dy")).agg(count(lit(1)).as("n"))
    val u = conv(substring(md5(
      concat(col("event_type"), lit("|"), col("dy").cast("string"))), 1, 15),
      16, 10).cast("long").cast("double") / lit(1152921504606846976.0)
    val c = u - lit(0.5)
    val noise = (-signum(c)) * lit(1.0) * lnLibm(lit(1.0) - (lit(2.0) * abs(c)))
    cnt.select(col("event_type"),
        tsSeconds(timestamp_micros(col("dy") * lit(86400000000L))).as("day_s"),
        (col("n").cast("double") + noise).as("noisy_n"))
      .orderBy(col("event_type"), col("day_s"))
  }

  /** SPRT design constants for [[qSprt]]: H0 p=0.04 vs H1 p=0.06
    * (straddling the fixture's ≈4.7% high-value rate so the walk is a
    * REAL contest), α=0.05, β=0.2.
    */
  val SprtP0 = 0.04
  val SprtP1 = 0.06

  /** q_sprt — Wald's Sequential Probability Ratio Test per event type:
    * observations (in event-time order) update a cumulative
    * log-likelihood ratio between H1 (high-value rate [[SprtP1]]) and
    * H0 ([[SprtP0]]); the FIRST crossing of ln((1−β)/α) accepts H1, of
    * ln(β/(1−α)) accepts H0, otherwise the test is still running at
    * data end. This is the SEQUENTIAL experimentation layer —
    * fixed-horizon tests ([[qPropTest]], the BH family) answer "decide
    * at n"; SPRT answers "decide AS EARLY AS the evidence allows",
    * which is how modern always-on experiment platforms stop — with
    * ~half the average sample size at the same error rates (Wald's
    * optimality).
    *
    * Determinism: LLRₙ = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) needs NO
    * per-row float accumulation — k and n are EXACT prefix integers
    * (one window sum), and the two ln constants go through the
    * libm-exact [[lnLibm]], so every LLR is two exact-int casts, two
    * multiplies, one add — bit-identical cross-engine, as are the
    * boundary comparisons. Conversion = value ≥ 150 (the [[qPropTest]]
    * threshold).
    *
    * Plan: per-type ordered prefix windows (the q_stream_anomaly
    * causal-prefix stance — partitioned by type, calendar-bounded
    * keys), then TWO domain-sized aggregates (first crossing via
    * min/min_by, totals via max/max_by) joined on type. Nothing after
    * the window exceeds |types| rows.
    */
  def qSprt(spark: SparkSession, d: String): DataFrame = {
    val la = lnLibm(lit(SprtP1) / lit(SprtP0))
    val lb = lnLibm((lit(1.0) - lit(SprtP1)) / (lit(1.0) - lit(SprtP0)))
    val up = lnLibm(lit(0.8) / lit(0.05))
    val dn = lnLibm(lit(0.2) / lit(0.95))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val pref = events(spark, d)
      .select(col("event_type"), col("ts"), col("event_id"),
        when(col("value") >= lit(150.0), 1L).otherwise(0L).as("x"))
      .withColumn("n", row_number().over(w))
      .withColumn("k", sum(col("x")).over(w))
      .select(col("event_type"), col("n"),
        ((col("k").cast("double") * la) +
          ((col("n") - col("k")).cast("double") * lb)).as("llr"))
      .withColumn("dir",
        when(col("llr") >= up, lit("accept_h1"))
          .when(col("llr") <= dn, lit("accept_h0")))
    val firstCross = pref.filter(col("dir").isNotNull)
      .groupBy(col("event_type"))
      .agg(min(col("n")).as("decision_n"),
        min_by(col("dir"), col("n")).as("dir_at"),
        min_by(col("llr"), col("n")).as("llr_at"))
    val totals = pref.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_obs"), max_by(col("llr"), col("n")).as("llr_end"))
    totals.join(firstCross, Seq("event_type"), "left")
      .select(col("event_type"), col("n_obs"), col("decision_n"),
        coalesce(col("dir_at"), lit("continue")).as("decision"),
        coalesce(col("llr_at"), col("llr_end")).as("llr_at_decision"))
      .orderBy(col("event_type"))
  }

  /** q_ucb_replay — UCB1 policy evaluation on the logged bandit
    * feedback (Auer et al. 2002 scores, Li et al. 2011 replay stance):
    * arms = event types, one decision per UTC day. For each day the
    * policy scores every arm from the LOGGED history strictly before
    * that day — mean high-value rate s_i/n_i plus the exploration
    * bonus √(2·ln N/n_i) — and "pulls" the argmax (unexplored arms
    * first, the canonical play-each-arm-once bootstrap); the day's
    * realized best arm by high-value count sets the per-day regret.
    * This is the offline harness an experimentation platform runs
    * BEFORE wiring a bandit to live traffic: would UCB have kept up
    * with the oracle arm on our own logs, and how fast does its
    * exploration debt amortize?
    *
    * Determinism: per-(day, arm) trials/successes and all prefix
    * histories are exact BIGINT window sums (integer — safe in any
    * accumulation order); regret is COUNT-based (best successes −
    * chosen successes, an exact integer) so the cumulative-regret
    * window never sums doubles; the UCB score itself is a per-row
    * pinned double chain (one division + LnLibm + IEEE sqrt) used
    * only for ORDERING, with the explored-first / score / arm-name
    * sort fully pinned on both engines (DESC NULLS LAST stated
    * explicitly).
    *
    * Plan: the log collapses to the |days|×|arms| daily grid first
    * (one map-side-partial aggregate — the only corpus-sized stage),
    * densified against the day×arm spine so silent days still carry
    * their prefix history; every window after that rides the
    * domain-sized grid.
    */
  def qUcbReplay(spark: SparkSession, d: String): DataFrame = {
    val daily = events(spark, d)
      .select(expr("unix_micros(date_trunc('day', ts)) DIV 86400000000")
        .as("dy"), col("event_type").as("arm"),
        when(col("value") >= 150.0, 1L).otherwise(0L).as("hv"))
      .groupBy(col("dy"), col("arm"))
      .agg(count(lit(1)).as("trials"), sum(col("hv")).as("succ"))
    val spine = daily.select(col("dy")).distinct()
      .crossJoin(daily.select(col("arm")).distinct())
    val grid = spine.join(daily, Seq("dy", "arm"), "left")
      .select(col("dy"), col("arm"),
        coalesce(col("trials"), lit(0L)).as("trials"),
        coalesce(col("succ"), lit(0L)).as("succ"))
    val wArm = Window.partitionBy(col("arm")).orderBy(col("dy"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDay = Window.partitionBy(col("dy"))
    val scored = grid
      .withColumn("n_i", coalesce(sum(col("trials")).over(wArm), lit(0L)))
      .withColumn("s_i", coalesce(sum(col("succ")).over(wArm), lit(0L)))
      .withColumn("n_prev", sum(col("n_i")).over(wDay))
      .withColumn("ucb",
        when(col("n_i") > 0L && col("n_prev") > 0L,
          col("s_i").cast("double") / col("n_i").cast("double") +
            sqrt((lit(2.0) * lnLibm(col("n_prev").cast("double"))) /
              col("n_i").cast("double"))))
      .withColumn("explored", when(col("n_i") > 0L, 1).otherwise(0))
    val chosen = scored
      .withColumn("rn", row_number().over(Window.partitionBy(col("dy"))
        .orderBy(col("explored").asc, col("ucb").desc_nulls_last,
          col("arm").asc)))
      .filter(col("rn") === 1)
      .select(col("dy"), col("arm").as("chosen_arm"),
        (col("explored") === 0).as("forced_explore"), col("ucb"),
        col("succ").as("chosen_succ"), col("trials").as("chosen_trials"))
    val best = grid
      .withColumn("rn", row_number().over(Window.partitionBy(col("dy"))
        .orderBy(col("succ").desc, col("arm").asc)))
      .filter(col("rn") === 1)
      .select(col("dy"), col("arm").as("best_arm"),
        col("succ").as("best_succ"))
    chosen.join(best, "dy")
      .select(col("dy"), col("chosen_arm"), col("forced_explore"),
        col("ucb"), col("best_arm"), col("chosen_succ"), col("best_succ"),
        (col("best_succ") - col("chosen_succ")).as("regret"))
      .withColumn("cum_regret", sum(col("regret")).over(
        Window.orderBy(col("dy"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy(col("dy"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ucb_replay"    -> qUcbReplay _,
    "q_sprt"          -> qSprt _,
    "q_cohort_matrix" -> qCohortMatrix _,
    "q_window_funnel" -> qWindowFunnel _,
    "q_k_anonymity" -> qKAnonymity _,
    "q_cuped" -> qCuped _,
    "q_mde" -> qMde _,
    "q_rfm" -> qRfm _,
    "q_ltv" -> qLtv _,
    "q_prop_test" -> qPropTest _,
    "q_survival" -> qSurvival _,
    "q_rolling_median" -> qRollingMedian _,
    "q_calibration" -> qCalibration _,
    "q_attribution" -> qAttribution _,
    "q_bitmap_rollup" -> qBitmapRollup _,
    "q_dp_counts" -> qDpCounts _,
  )

  val oracle: Map[String, String] = Map(
    "q_ucb_replay" ->
      """WITH daily AS (
        |  SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
        |         event_type AS arm, COUNT(*) AS trials,
        |         CAST(SUM(CASE WHEN value >= 150.0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS succ
        |  FROM events GROUP BY 1, 2
        |), spine AS (
        |  SELECT d.dy, a.arm FROM (SELECT DISTINCT dy FROM daily) d
        |  CROSS JOIN (SELECT DISTINCT arm FROM daily) a
        |), grid AS (
        |  SELECT s.dy, s.arm, COALESCE(d.trials, 0) AS trials,
        |         COALESCE(d.succ, 0) AS succ
        |  FROM spine s LEFT JOIN daily d ON d.dy = s.dy AND d.arm = s.arm
        |), pref AS (
        |  SELECT dy, arm, trials, succ,
        |         CAST(COALESCE(SUM(trials) OVER (PARTITION BY arm ORDER BY dy
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS n_i,
        |         CAST(COALESCE(SUM(succ) OVER (PARTITION BY arm ORDER BY dy
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS s_i
        |  FROM grid
        |), tot AS (
        |  SELECT *, CAST(SUM(n_i) OVER (PARTITION BY dy) AS BIGINT) AS n_prev
        |  FROM pref
        |), scored AS (
        |  SELECT *,
        |         CASE WHEN n_i > 0 AND n_prev > 0
        |              THEN CAST(s_i AS DOUBLE) / CAST(n_i AS DOUBLE)
        |                 + sqrt((2.0 * ln(CAST(n_prev AS DOUBLE)))
        |                        / CAST(n_i AS DOUBLE))
        |         END AS ucb,
        |         CASE WHEN n_i > 0 THEN 1 ELSE 0 END AS explored
        |  FROM tot
        |), chosen AS (
        |  SELECT dy, arm AS chosen_arm, explored = 0 AS forced_explore,
        |         ucb, succ AS chosen_succ
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY dy
        |          ORDER BY explored ASC, ucb DESC NULLS LAST, arm ASC) AS rn
        |        FROM scored)
        |  WHERE rn = 1
        |), best AS (
        |  SELECT dy, arm AS best_arm, succ AS best_succ
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY dy
        |          ORDER BY succ DESC, arm ASC) AS rn FROM grid)
        |  WHERE rn = 1
        |)
        |SELECT c.dy, c.chosen_arm, c.forced_explore, c.ucb, b.best_arm,
        |       c.chosen_succ, b.best_succ,
        |       b.best_succ - c.chosen_succ AS regret,
        |       CAST(SUM(b.best_succ - c.chosen_succ) OVER (ORDER BY c.dy
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_regret
        |FROM chosen c JOIN best b ON b.dy = c.dy
        |ORDER BY c.dy""".stripMargin,
    "q_sprt" ->
      s"""WITH pref AS (
         |  SELECT event_type,
         |         CAST(ROW_NUMBER() OVER w AS INT) AS n,
         |         CAST(SUM(CASE WHEN value >= 150.0 THEN 1 ELSE 0 END)
         |           OVER w AS BIGINT) AS k
         |  FROM events
         |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id
         |               ROWS UNBOUNDED PRECEDING)
         |), lr AS (
         |  SELECT event_type, n,
         |         (CAST(k AS DOUBLE)
         |            * ln(CAST($SprtP1 AS DOUBLE) / CAST($SprtP0 AS DOUBLE)))
         |           + (CAST(n - k AS DOUBLE)
         |            * ln((1.0 - CAST($SprtP1 AS DOUBLE))
         |                 / (1.0 - CAST($SprtP0 AS DOUBLE)))) AS llr
         |  FROM pref
         |), flagged AS (
         |  SELECT event_type, n, llr,
         |         CASE WHEN llr >= ln(CAST(0.8 AS DOUBLE) / CAST(0.05 AS DOUBLE))
         |                THEN 'accept_h1'
         |              WHEN llr <= ln(CAST(0.2 AS DOUBLE) / CAST(0.95 AS DOUBLE))
         |                THEN 'accept_h0' END AS dir
         |  FROM lr
         |), fc AS (
         |  SELECT event_type, MIN(n) AS decision_n,
         |         min_by(dir, n) AS dir_at, min_by(llr, n) AS llr_at
         |  FROM flagged WHERE dir IS NOT NULL GROUP BY event_type
         |), tot AS (
         |  SELECT event_type, MAX(n) AS n_obs, max_by(llr, n) AS llr_end
         |  FROM flagged GROUP BY event_type
         |)
         |SELECT t.event_type, t.n_obs, fc.decision_n,
         |       COALESCE(fc.dir_at, 'continue') AS decision,
         |       COALESCE(fc.llr_at, t.llr_end) AS llr_at_decision
         |FROM tot t LEFT JOIN fc ON t.event_type = fc.event_type
         |ORDER BY t.event_type""".stripMargin,
    "q_bitmap_rollup" ->
      """WITH ev AS (
        |  SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
        |         user_id // 63 AS bucket, CAST(user_id % 63 AS INT) AS bit
        |  FROM events
        |), daily AS (
        |  SELECT dy, bucket,
        |         bit_or(CAST(1 AS BIGINT) << bit) AS w
        |  FROM ev GROUP BY dy, bucket
        |), days AS (SELECT DISTINCT dy FROM daily),
        |dau AS (
        |  SELECT dy, CAST(SUM(bit_count(w)) AS BIGINT) AS dau
        |  FROM daily GROUP BY dy
        |), expand AS (
        |  SELECT unnest(generate_series(dy, dy + 6)) AS td, bucket, w
        |  FROM daily
        |), wau AS (
        |  SELECT e.td, e.bucket, bit_or(e.w) AS w7
        |  FROM expand e JOIN days ON e.td = days.dy
        |  GROUP BY e.td, e.bucket
        |), wau7 AS (
        |  SELECT td, CAST(SUM(bit_count(w7)) AS BIGINT) AS wau7
        |  FROM wau GROUP BY td
        |)
        |SELECT strftime(make_timestamp(dau.dy * 86400000000),
        |         '%Y-%m-%d %H:%M:%S') AS day_s,
        |       dau.dau AS dau, wau7.wau7 AS wau7
        |FROM dau JOIN wau7 ON dau.dy = wau7.td
        |ORDER BY day_s""".stripMargin,
    "q_dp_counts" ->
      """WITH cnt AS (
        |  SELECT event_type,
        |         epoch_us(date_trunc('day', ts)) // 86400000000 AS dy,
        |         COUNT(*) AS n
        |  FROM events GROUP BY event_type, dy
        |), h AS (
        |  SELECT event_type, dy, n,
        |         (CAST(CAST(('0x' || substr(md5(
        |            event_type || '|' || CAST(dy AS VARCHAR)), 1, 15))
        |            AS BIGINT) AS DOUBLE) / 1152921504606846976.0) - 0.5 AS c
        |  FROM cnt
        |)
        |SELECT event_type,
        |       strftime(make_timestamp(dy * 86400000000),
        |         '%Y-%m-%d %H:%M:%S') AS day_s,
        |       CAST(n AS DOUBLE)
        |         + ((-sign(c)) * 1.0 * ln(1.0 - (2.0 * abs(c)))) AS noisy_n
        |FROM h ORDER BY event_type, day_s""".stripMargin,
    "q_window_funnel" -> {
      val w = FunnelWindowUs
      s"""WITH enc AS (
         |  SELECT user_id,
         |         struct_pack(
         |           us := epoch_us(ts), eid := event_id,
         |           t1 := CASE WHEN event_type = 'view' THEN epoch_us(ts)
         |                      ELSE CAST(-1 AS BIGINT) END,
         |           t2 := CASE WHEN event_type = 'click' THEN epoch_us(ts)
         |                      ELSE CAST(-1 AS BIGINT) END,
         |           t3 := CASE WHEN event_type = 'purchase' THEN epoch_us(ts)
         |                      ELSE CAST(-1 AS BIGINT) END) AS e,
         |         epoch_us(ts) AS us, event_id
         |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
         |), folded AS (
         |  SELECT user_id,
         |         list_reduce(
         |           list_prepend(
         |             struct_pack(us := CAST(-1 AS BIGINT),
         |                         eid := CAST(-1 AS BIGINT),
         |                         t1 := CAST(-1 AS BIGINT),
         |                         t2 := CAST(-1 AS BIGINT),
         |                         t3 := CAST(-1 AS BIGINT)),
         |             list(e ORDER BY us, event_id)),
         |           (acc, x) -> struct_pack(
         |             us := x.us, eid := x.eid,
         |             t1 := CASE WHEN acc.t1 >= 0 THEN acc.t1 ELSE x.t1 END,
         |             t2 := CASE WHEN acc.t2 >= 0 THEN acc.t2
         |                        WHEN acc.t1 >= 0 AND x.t2 > acc.t1
         |                             AND x.t2 <= acc.t1 + $w THEN x.t2
         |                        ELSE CAST(-1 AS BIGINT) END,
         |             t3 := CASE WHEN acc.t3 >= 0 THEN acc.t3
         |                        WHEN acc.t1 >= 0 AND acc.t2 >= 0 AND x.t3 > acc.t2
         |                             AND x.t3 <= acc.t1 + $w THEN x.t3
         |                        ELSE CAST(-1 AS BIGINT) END)) AS f
         |  FROM enc GROUP BY user_id
         |)
         |SELECT CAST(CASE WHEN f.t3 >= 0 THEN 3 WHEN f.t2 >= 0 THEN 2
         |            WHEN f.t1 >= 0 THEN 1 ELSE 0 END AS BIGINT) AS level,
         |       CAST(COUNT(*) AS BIGINT) AS n_users
         |FROM folded GROUP BY level ORDER BY level""".stripMargin
    },
    "q_cuped" ->
      """WITH pu AS (
        |  SELECT user_id % 2 AS variant,
        |         CAST(SUM(CASE WHEN day(ts) <= 15 THEN
        |           CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS x,
        |         CAST(SUM(CASE WHEN day(ts) > 15 THEN
        |           CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |), g AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM pu
        |), t AS (
        |  SELECT (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |            / CAST(n AS DOUBLE))
        |         / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |            / CAST(n AS DOUBLE)) AS theta,
        |         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
        |  FROM g
        |)
        |SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_v,
        |       CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_y,
        |       (CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |         - theta * ((CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |                    - xbar) AS adj_mean_y,
        |       theta
        |FROM pu, t GROUP BY variant, theta, xbar
        |ORDER BY variant""".stripMargin,
    "q_mde" ->
      s"""WITH pu AS (
         |  SELECT user_id % 2 AS variant,
         |         MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
         |                  THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY user_id
         |), v AS (
         |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(conv) AS BIGINT) AS c
         |  FROM pu GROUP BY variant
         |), w AS (
         |  SELECT CAST(MAX(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n0,
         |         CAST(MAX(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1,
         |         CAST(SUM(c) AS BIGINT) AS c_all,
         |         CAST(SUM(n) AS BIGINT) AS n_all
         |  FROM v
         |)
         |SELECT n0, n1, c_all,
         |       CAST(c_all AS DOUBLE) / CAST(n_all AS DOUBLE) AS p_base,
         |       ${ZAlpha + ZPower} *
         |         sqrt(((CAST(c_all AS DOUBLE) / CAST(n_all AS DOUBLE))
         |               * (1.0 - CAST(c_all AS DOUBLE) / CAST(n_all AS DOUBLE)))
         |              * ((1.0 / CAST(n0 AS DOUBLE))
         |                 + (1.0 / CAST(n1 AS DOUBLE)))) AS mde
         |FROM w""".stripMargin,
    "q_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_mktsegment, c_nationkey,
        |         CAST(floor(c_acctbal / 2500.0) AS BIGINT) AS bal_band,
        |         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS k,
        |         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l_div
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_mktsegment, c_nationkey, bal_band
        |), risk AS (
        |  SELECT CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
        |           AS n_at_risk,
        |         CAST(SUM(k) AS BIGINT) AS n_total
        |  FROM cls
        |)
        |SELECT c_mktsegment, c_nationkey, bal_band, k, l_div,
        |       k >= 5 AS passes_k,
        |       CAST(n_at_risk AS DOUBLE) / CAST(n_total AS DOUBLE)
        |         AS at_risk_share
        |FROM cls, risk
        |ORDER BY c_mktsegment, c_nationkey, bal_band""".stripMargin,
    "q_cohort_matrix" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
        |  WHERE event_type = 'purchase'
        |), wc AS (
        |  SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort
        |  FROM uw
        |), cells AS (
        |  SELECT cohort,
        |         CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
        |         CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM wc GROUP BY cohort, week_offset
        |), sz AS (
        |  SELECT cohort, n_active AS n_cohort FROM cells WHERE week_offset = 0
        |)
        |SELECT strftime(cohort, '%Y-%m-%d %H:%M:%S') AS cohort_s, week_offset,
        |       n_active, n_cohort,
        |       CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
        |FROM cells JOIN sz USING (cohort)
        |ORDER BY cohort_s, week_offset""".stripMargin,
    "q_rfm" ->
      """WITH anchor AS (
        |  SELECT MAX(date_trunc('day', ts)) AS anchor FROM events
        |), pu AS (
        |  SELECT user_id,
        |         COUNT(*) AS freq,
        |         SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents,
        |         CAST(date_diff('day', MAX(date_trunc('day', ts)),
        |                        (SELECT anchor FROM anchor)) AS BIGINT) AS recency
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |), q AS (
        |  SELECT cents,
        |         CAST(ntile(4) OVER (ORDER BY recency, user_id) AS BIGINT) AS r_q,
        |         CAST(ntile(4) OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS f_q,
        |         CAST(ntile(4) OVER (ORDER BY cents DESC, user_id) AS BIGINT) AS m_q
        |  FROM pu
        |)
        |SELECT r_q, f_q, m_q, COUNT(*) AS n_users,
        |       CAST(SUM(cents) AS BIGINT) AS seg_cents
        |FROM q GROUP BY r_q, f_q, m_q ORDER BY r_q, f_q, m_q""".stripMargin,
    "q_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |), c AS (
        |  SELECT o_custkey, MIN(month) AS cohort FROM o GROUP BY o_custkey
        |), m AS (
        |  SELECT strftime(c.cohort, '%Y-%m-%d %H:%M:%S') AS cohort_s,
        |         CAST(date_diff('month', c.cohort, o.month) AS BIGINT) AS month_offset,
        |         COUNT(*) AS n_orders,
        |         CAST(SUM(o.cents) AS BIGINT) AS rev_cents
        |  FROM o JOIN c ON o.o_custkey = c.o_custkey
        |  GROUP BY cohort_s, month_offset
        |)
        |SELECT cohort_s, month_offset, n_orders, rev_cents,
        |       CAST(SUM(rev_cents) OVER (PARTITION BY cohort_s
        |         ORDER BY month_offset
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_rev_cents
        |FROM m ORDER BY cohort_s, month_offset""".stripMargin,
    "q_prop_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
        |             THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id
        |), v AS (
        |  SELECT user_id % 2 AS variant, COUNT(*) AS n,
        |         CAST(SUM(conv) AS BIGINT) AS c
        |  FROM pu GROUP BY variant
        |), w AS (
        |  SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        |         MAX(CASE WHEN variant = 0 THEN c END) AS c0,
        |         MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        |         MAX(CASE WHEN variant = 1 THEN c END) AS c1
        |  FROM v
        |)
        |SELECT n0, c0, n1, c1,
        |       CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
        |       CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |       CASE WHEN (c0 + c1) > 0 AND (c0 + c1) < (n0 + n1) THEN
        |         ((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)) -
        |          (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))) /
        |         sqrt(((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) *
        |               (1.0 - (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)))) *
        |              ((1.0 / CAST(n0 AS DOUBLE)) + (1.0 / CAST(n1 AS DOUBLE))))
        |       END AS z
        |FROM w""".stripMargin,
    "q_survival" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS tsig,
        |         MAX(ts) AS tmax
        |  FROM events GROUP BY user_id
        |), pp AS (
        |  SELECT e.user_id, MIN(e.ts) AS tp
        |  FROM events e JOIN pu ON e.user_id = pu.user_id
        |  WHERE e.event_type = 'purchase' AND pu.tsig IS NOT NULL
        |    AND e.ts >= pu.tsig
        |  GROUP BY e.user_id
        |), u AS (
        |  SELECT CASE WHEN pp.tp IS NOT NULL THEN 1 ELSE 0 END AS observed,
        |         CAST(date_diff('day', date_trunc('day', pu.tsig),
        |              date_trunc('day', COALESCE(pp.tp, pu.tmax))) AS BIGINT) AS t
        |  FROM pu LEFT JOIN pp ON pu.user_id = pp.user_id
        |  WHERE pu.tsig IS NOT NULL
        |), g AS (
        |  SELECT t, CAST(SUM(observed) AS BIGINT) AS d, COUNT(*) AS n_all
        |  FROM u GROUP BY t
        |), r AS (
        |  SELECT t, d,
        |         SUM(n_all) OVER (ORDER BY t DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        |  FROM g
        |)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d,
        |       CASE WHEN SUM(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |              OVER (ORDER BY t
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0
        |       THEN SUM(CASE WHEN d < n_risk
        |              THEN ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)) END)
        |              OVER (ORDER BY t
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       END AS ln_surv
        |FROM r ORDER BY t""".stripMargin,
    "q_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |           AS day_cents
        |  FROM events GROUP BY event_type, day
        |)
        |SELECT event_type, strftime(day, '%Y-%m-%d %H:%M:%S') AS day_s,
        |       day_cents,
        |       median(day_cents) OVER (PARTITION BY event_type ORDER BY day
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7_cents
        |FROM daily ORDER BY event_type, day_s""".stripMargin,
    "q_calibration" ->
      """WITH stats AS (
        |  SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events
        |), b AS (
        |  SELECT CAST(CASE WHEN s.vmax > s.vmin
        |           THEN least(floor(((e.value - s.vmin) / (s.vmax - s.vmin)) * 10.0), 9.0)
        |           ELSE 0.0 END AS BIGINT) AS bin,
        |         CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
        |         e.value
        |  FROM events e CROSS JOIN stats s
        |)
        |SELECT bin, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |       CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS obs_rate,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_score
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q_attribution" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv,
        |         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid,
        |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id) AS total_conv
        |  FROM events
        |), c AS (
        |  SELECT event_type,
        |         CAST(row_number() OVER (PARTITION BY user_id, jid
        |           ORDER BY ts, event_id) AS BIGINT) AS rn,
        |         COUNT(*) OVER (PARTITION BY user_id, jid) AS n
        |  FROM m WHERE is_conv = 0 AND jid < total_conv
        |)
        |SELECT event_type, COUNT(*) AS n_touches,
        |       CAST(SUM(CASE WHEN n = 1 THEN 1000000
        |                     WHEN n = 2 THEN 500000
        |                     WHEN rn = 1 OR rn = n THEN 400000
        |                     ELSE 200000 // (n - 2) END) AS BIGINT) AS credit_micro
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
