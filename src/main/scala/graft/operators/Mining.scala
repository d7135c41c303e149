package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pattern-mining / statistical-dependence operators (SURVEY.md §2e
  * extensions): association rules over per-user behavior, chi-squared
  * token–label feature selection, series autocorrelation, and mutual
  * information — the dataset-diagnostics a training-data pipeline runs to
  * understand WHAT is in 100 TB before sampling from it. The reference's
  * analytic surface stops at counts and a latest-row insight
  * (/root/reference/app.py:200-293); these are the dependence-structure
  * analogs.
  *
  * Shared determinism contract: every statistic is assembled from EXACT
  * BIGINT contingency/series counts; doubles appear only in the final
  * projection with ONE literal parenthesization mirrored in the oracle,
  * logs go through the libm-exact [[graft.functions.LnLibm]], and
  * cross-term sums of doubles use ordered folds.
  */
object Mining {

  private def lnLibm(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.LnLibm(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** q_assoc — association rules a → b over per-user event-type
    * itemsets: for every ordered pair of distinct event types, support
    * (P(a∧b)), confidence (P(b|a)) and lift (confidence / P(b)) — the
    * market-basket diagnostic for behavioral event logs.
    *
    * Plan: the itemset table is `distinct(user_id, event_type)` —
    * a map-side-partial dedup that shrinks the log to ≤ |users|·|types|
    * rows BEFORE any join. The pair join is a self-equi-join on user_id
    * whose per-user fan-out is bounded by |types|² (a constant — event
    * vocabularies don't grow with data volume), so at 100 TB the join
    * output is |users|·|types|² rows, linear in users. Per-item counts
    * are broadcast (|types| rows).
    *
    * Determinism: all counts are BIGINT; the three ratios are single
    * double expressions — support = n_ab/n_users,
    * confidence = n_ab/n_a, lift = (n_ab·n_users)/(n_a·n_b).
    */
  def qAssoc(spark: SparkSession, d: String): DataFrame = {
    val items = events(spark, d)
      .select(col("user_id"), col("event_type")).distinct()
    val nUsers = events(spark, d)
      .agg(countDistinct(col("user_id")).as("n_users"))
    val itemCnt = items.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val pairs = items.select(col("user_id"), col("event_type").as("a"))
      .join(items.select(col("user_id"), col("event_type").as("b")), "user_id")
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(itemCnt.select(col("event_type").as("a"), col("cnt").as("n_a"))), "a")
      .join(broadcast(itemCnt.select(col("event_type").as("b"), col("cnt").as("n_b"))), "b")
      .crossJoin(broadcast(nUsers))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("n_users").cast("double")).as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
        ((col("n_ab").cast("double") * col("n_users").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
      .orderBy(col("a"), col("b"))
  }

  /** q_chisq — χ² token–language association over `documents`: for every
    * observed (token, lang) pair, the chi-squared statistic of the 2×2
    * presence contingency table — the classic supervised
    * feature-selection score, and the "which tokens mark which language"
    * diagnostic of a multilingual corpus. Top-20 by χ².
    *
    * Plan: presence rows are `array_distinct` inside the row (token set
    * per doc — no cross-row dedup shuffle), then ONE hash agg to
    * (token, lang) counts; lang sizes (|langs| rows) and token document
    * frequencies (|vocab| rows) join back broadcast / vocab-sized. At
    * 100 TB every shuffled relation is vocabulary-sized, not
    * corpus-sized.
    *
    * Determinism: the 2×2 cells (n11, n10, n01, n00) are exact BIGINTs
    * derived once; χ² = (N·(n11·n00 − n10·n01)²) / (r1·r0·c1·c0) is
    * computed in doubles in one pinned parenthesization (every factor
    * exact-integer-valued and ≪ 2^53 at fixture scale). Tokens present
    * in every document (a degenerate table: c0 = 0) are excluded by the
    * df < N guard, mirrored in the oracle.
    */
  def qChisq(spark: SparkSession, d: String): DataFrame = {
    val pres = documents(spark, d)
      .select(col("lang"), col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
    val cell = pres.groupBy(col("token"), col("lang")).agg(count(lit(1)).as("n11"))
    val langN = documents(spark, d).groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val dfTok = cell.groupBy(col("token")).agg(sum(col("n11")).as("df"))
    val nDocs = documents(spark, d).agg(count(lit(1)).as("n_docs"))
    val n11 = col("n11")
    val n10 = col("n_lang") - col("n11")
    val n01 = col("df") - col("n11")
    val n00 = col("n_docs") - col("n_lang") - n01
    val det = n11 * n00 - n10 * n01
    val chi2 = (col("n_docs").cast("double") *
        (det.cast("double") * det.cast("double"))) /
      (((col("n_lang").cast("double") *
        (col("n_docs") - col("n_lang")).cast("double")) *
        col("df").cast("double")) *
        (col("n_docs") - col("df")).cast("double"))
    cell.join(broadcast(langN), "lang")
      .join(dfTok, "token")
      .crossJoin(broadcast(nDocs))
      .filter(col("df") < col("n_docs"))
      .select(col("lang"), col("token"),
        n11.as("n11"), n10.as("n10"), n01.as("n01"), n00.as("n00"),
        chi2.as("chi2"))
      .orderBy(col("chi2").desc, col("lang"), col("token"))
      .limit(20)
  }

  /** q_autocorr — lag-1 autocorrelation of the hourly event-count
    * series: Pearson r between x(h) and x(h+1h) — the "is this metric
    * trending or noise" one-number diagnostic of a time series, computed
    * over the full log.
    *
    * Plan: the log collapses to an hourly count histogram FIRST (one
    * map-side-partial agg — the only pass over the data); the lag pairing
    * is then an equi-join of the histogram with itself on h = h + 1 hour
    * (hash join over |hours| rows — NO unpartitioned window, no global
    * sort; consecutive-hour gaps simply drop out of the join, the
    * standard treatment for a sparse series). At 100 TB the pair table is
    * |hours| rows regardless of volume.
    *
    * Determinism: counts and all five moment sums (Σx, Σy, Σxy, Σx²,
    * Σy²) are exact BIGINTs (integer sums are associative —
    * partitioning-independent); r's numerator/radicands are exact BIGINT
    * expressions, with doubles only in the final divide/sqrt, guarded
    * against zero-variance degenerate series exactly as in the oracle.
    */
  def qAutocorr(spark: SparkSession, d: String): DataFrame = {
    val hourly = events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val pairs = hourly.select(col("h"), col("x"))
      .join(hourly.select((col("h") - expr("INTERVAL 1 HOUR")).as("h"), col("x").as("y")), "h")
    val m = pairs.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val num  = m("n") * m("sxy") - m("sx") * m("sy")
    val radX = m("n") * m("sxx") - m("sx") * m("sx")
    val radY = m("n") * m("syy") - m("sy") * m("sy")
    m.select(col("n"),
      when(radX > 0L && radY > 0L,
        num.cast("double") /
          (sqrt(radX.cast("double")) * sqrt(radY.cast("double"))))
        .as("autocorr"))
  }

  /** q_mutual_info — mutual information (nats) between event_type and
    * hour-of-day: MI = Σ_cells p(t,h)·ln(p(t,h)/(p(t)·p(h))) — the
    * dependence strength between a label and a covariate, the
    * feature-screening companion to [[qChisq]] on the events side.
    *
    * Plan: one hash agg to the |types|×24 joint contingency table, two
    * marginal re-aggregations OVER THAT TABLE (never re-reading the
    * log), marginals broadcast back. The cell table is constant-sized at
    * any data volume.
    *
    * Determinism: all counts BIGINT; each cell's term uses one pinned
    * parenthesization ((c_th·N)/(c_t·c_h) fully in exact-valued doubles)
    * through [[lnLibm]], and the cell terms are summed by an ordered fold
    * keyed on (event_type, hr) — the [[Similarity.qLabelEntropy]]
    * contract applied to a two-way table.
    */
  def qMutualInfo(spark: SparkSession, d: String): DataFrame = {
    val joint = events(spark, d)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("c_th"))
    val margT = joint.groupBy(col("event_type")).agg(sum(col("c_th")).as("c_t"))
    val margH = joint.groupBy(col("hr")).agg(sum(col("c_th")).as("c_h"))
    val n = joint.agg(sum(col("c_th")).as("n"))
    val p = col("c_th").cast("double") / col("n").cast("double")
    val ratio = (col("c_th").cast("double") * col("n").cast("double")) /
      (col("c_t").cast("double") * col("c_h").cast("double"))
    joint.join(broadcast(margT), "event_type")
      .join(broadcast(margH), "hr")
      .crossJoin(broadcast(n))
      .select(col("event_type"), col("hr"), (p * lnLibm(ratio)).as("term"))
      .agg(count(lit(1)).as("n_cells"),
        sort_array(collect_list(struct(col("event_type"), col("hr"), col("term"))))
          .as("cells"))
      .select(col("n_cells"),
        expr("aggregate(cells, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)")
          .as("mi"))
  }

  /** Maximum lag of [[qAcf]]'s correlogram (hours). */
  val AcfMaxLag = 24

  /** q_acf — the full correlogram: Pearson r of the hourly event-count
    * series against itself at every lag 1..[[AcfMaxLag]] — [[qAutocorr]]
    * generalized from one point to the curve, which is what you actually
    * read for periodicity (a daily cycle shows as a resonance at lag 24)
    * and for "how much history matters" (AR order selection).
    *
    * Plan: ONE hourly histogram (the only pass over the log), then the
    * lag spine explodes each histogram row into its ≤ [[AcfMaxLag]]
    * pairings — fan-out bounded by the LAG BUDGET, not the data — and
    * one (lag)-keyed aggregate computes all five moment sums per lag.
    * Everything after the first pass is |hours|·|lags| rows,
    * calendar-bounded at any volume.
    *
    * Determinism: the q_autocorr contract per lag — exact BIGINT
    * moments, exact-integer zero-variance guards, doubles only in the
    * final divide/sqrt with one pinned parenthesization.
    */
  def qAcf(spark: SparkSession, d: String): DataFrame = {
    val hourly = events(spark, d)
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) DIV 3600000000")
        .as("h"))
      .agg(count(lit(1)).as("x"))
    val lagged = hourly
      .select(col("h"), col("x"),
        explode(sequence(lit(1L), lit(AcfMaxLag.toLong))).as("lag"))
      .select((col("h") - col("lag")).as("h"), col("lag"), col("x").as("y"))
    val m = hourly.join(lagged, "h")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val radX = m("n") * m("sxx") - m("sx") * m("sx")
    val radY = m("n") * m("syy") - m("sy") * m("sy")
    m.select(col("lag"), col("n"),
      when(radX > 0L && radY > 0L,
        (m("n") * m("sxy") - m("sx") * m("sy")).cast("double") /
          (sqrt(radX.cast("double")) * sqrt(radY.cast("double"))))
        .as("acf"))
      .orderBy(col("lag"))
  }

  /** q_ewma — exponentially-weighted moving average (α = 0.2) of the
    * hourly event-count series per event_type: the standard smoothed
    * "current level" statistic behind monitoring baselines and anomaly
    * thresholds, inherently SEQUENTIAL (s_t = α·x_t + (1−α)·s_{t−1}) and
    * therefore the interesting distributed case.
    *
    * Plan: the log collapses to the per-(type, hour) count histogram
    * first (the only pass over the data); the sequential recurrence then
    * runs per type as an hour-ordered fold over the collected series —
    * state per group is the bounded (types × hours) histogram, never raw
    * events, and groups fold in parallel. At 100 TB the calendar is what
    * bounds the fold (~10⁴ hours/year), not data volume.
    *
    * Determinism: counts exact; the fold is seeded s_0 = x_0 via a −1.0
    * sentinel (counts are ≥ 0) and every step is one pinned α·x + (1−α)·s
    * expression — both engines replay the identical left fold.
    */
  def qEwma(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sort_array(collect_list(struct(col("h"), col("x")))).as("hx"))
      .select(col("event_type"), col("n_hours"),
        expr("aggregate(hx, CAST(-1.0 AS DOUBLE), (acc, e) -> " +
          "IF(acc < CAST(0.0 AS DOUBLE), CAST(e.x AS DOUBLE), " +
          "CAST(0.2 AS DOUBLE) * CAST(e.x AS DOUBLE) + " +
          "CAST(0.8 AS DOUBLE) * acc))").as("ewma"))
      .orderBy(col("event_type"))

  /** q_gini — Gini coefficient of `value` per event_type via the sorted
    * formula G = (2·Σᵢ rᵢ·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ): the standard
    * concentration/inequality summary (is the metric dominated by a few
    * heavy rows?) a pipeline checks before weighting or sampling by a
    * value column.
    *
    * Plan: ONE per-group `row_number` window (partitioned by event_type
    * — parallel across groups, the sort amortized by the grouping
    * shuffle) feeding one hash aggregate. The O(n²) pairwise |xᵢ−xⱼ|
    * definition never materializes.
    *
    * Determinism: ranks are total-ordered integers ((value, event_id));
    * both sums go through [[graft.Tables.exactSum]]'s decimal cast — the
    * established order-independent-sum contract — so the assembled G is
    * bit-identical under any partitioning; final expression is one
    * pinned parenthesization.
    */
  def qGini(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    events(spark, d).select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Tables.exactSum(col("value")).as("s_x"),
        graft.Tables.exactSum(col("rk").cast("double") * col("value")).as("s_rx"))
      .select(col("event_type"), col("n"),
        ((lit(2.0) * col("s_rx") - (col("n") + lit(1L)).cast("double") * col("s_x")) /
          (col("n").cast("double") * col("s_x"))).as("gini"))
      .orderBy(col("event_type"))
  }

  /** q_rolling_count — per-event trailing-hour activity: for every event,
    * how many events its user produced in the preceding hour (inclusive)
    * — the RANGE-frame window (frame bounded by the ORDER-BY VALUE, not
    * by row offsets), which rows-frame operators like q_rolling_avg
    * can't express over irregular event times. The standard rate/burst
    * feature of a behavioral pipeline.
    *
    * Plan: one window partitioned by user_id — one hash shuffle + one
    * per-partition sort; the range frame is maintained by two pointers
    * over each sorted partition (O(n) per user). Parallel across users
    * at any scale.
    *
    * Determinism: the frame key is exact integer MICROSECONDS
    * (`unix_micros` ↔ `epoch_us` — both total, both exact; a seconds
    * cast would truncate and merge frame boundaries), and the aggregate
    * is a count.
    */
  def qRollingCount(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    events(spark, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("cnt_1h", count(lit(1)).over(w))
      .orderBy(col("event_id"))
  }

  /** q_ks_test — two-sample Kolmogorov–Smirnov statistic between the
    * train and test halves of the deterministic 80/20 doc_id-hash split
    * (the SAME split [[TextOps.qSplitLeakage]] audits, via the shared
    * md5 hash), over the document-length distribution:
    * D = sup_x |F_train(x) − F_test(x)|. This is the distributional
    * soundness check a pipeline runs on a fresh split — and, pointed at
    * two corpus snapshots instead of two split halves, the canonical
    * data-drift alarm.
    *
    * Plan: the corpus reduces to ONE value-domain-sized relation
    * (per-length split counts — map-side-partial hash agg; document
    * lengths have a bounded domain, so this is ≤ |domain| rows at ANY
    * corpus size). The two empirical CDFs are one unpartitioned
    * cumulative window over that bounded relation — legal at 100 TB
    * precisely because the window input is domain-sized, not
    * corpus-sized (the q_gapfill dense-spine stance); totals ride in as
    * a 1-row broadcast.
    *
    * Determinism: the supremum is taken over exact integers — D's
    * numerator max|F_a·n_b − F_b·n_a| cross-multiplies the two CDFs so
    * no rational division ever happens; products are ≤ n_a·n_b, within
    * BIGINT for any corpus under ~9·10⁹ docs per side. The only double
    * is the final num/(n_a·n_b) projection.
    */
  def qKsTest(spark: SparkSession, d: String): DataFrame = {
    val isTrain = (TextOps.md5Long(col("doc_id").cast("string"), 15) % 10 <
      TextOps.TrainBuckets).as("is_train")
    val split = documents(spark, d).select(col("n_chars"), isTrain)
    val perValue = split.groupBy(col("n_chars")).agg(
      sum(when(col("is_train"), 1L).otherwise(0L)).as("ca"),
      sum(when(col("is_train"), 0L).otherwise(1L)).as("cb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n_chars"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = split.agg(
      sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
      sum(when(col("is_train"), 0L).otherwise(1L)).as("n_test"))
    perValue
      .select(col("n_chars"),
        sum(col("ca")).over(w).as("fa"), sum(col("cb")).over(w).as("fb"))
      .crossJoin(broadcast(tot))
      .groupBy(col("n_train"), col("n_test"))
      .agg(max(abs(col("fa") * col("n_test") - col("fb") * col("n_train")))
        .as("ks_num"))
      .select(col("n_train"), col("n_test"), col("ks_num"),
        (col("ks_num").cast("double") /
          (col("n_train") * col("n_test")).cast("double")).as("ks_stat"))
  }

  /** q_mann_whitney — Mann-Whitney U rank-sum test between the `click`
    * and `error` populations of `value`: the NONPARAMETRIC two-sample
    * location test ([[qWelch]]'s distribution-free counterpart — the one
    * to reach for when the metric is skewed or heavy-tailed, i.e. most
    * production metrics), with midrank tie handling and the tie-corrected
    * normal approximation. Output: group sizes, 2·U (kept doubled so it
    * stays an exact BIGINT under half-integer midranks), the tie term
    * Σ(t³−t), and the z statistic.
    *
    * Plan: the log collapses to per-distinct-value counts FIRST (one
    * map-side-partial hash aggregate), so the rank window runs over the
    * |distinct values| relation, not the row count — the [[qKsTest]]
    * domain-sized-tail stance; at 100 TB a measure with real duplication
    * collapses by orders of magnitude, and a continuous one would be
    * binned upstream exactly as a production test harness does. The
    * cumulative rank prefix is the only ordered step; everything after is
    * one global fold of exact BIGINTs.
    *
    * Determinism: ranks enter ONLY through 2·midrank = 2·cum_lt + t + 1
    * (integer — no .5 anywhere), every fold is BIGINT-exact in any
    * order, and z is a single pinned double chain over those integers,
    * mirrored verbatim by the oracle.
    *
    * Bound: the tie term computes t³−t per distinct value in BIGINT, so a
    * SINGLE value carrying more than 2^21 ≈ 2.09M tied rows overflows
    * (ANSI throw here, error in DuckDB). That is a property of the
    * per-value multiplicity, not the corpus size — a heavily-tied
    * discrete metric at larger scale should be pre-binned (as the plan
    * note above already prescribes) or the fold widened to
    * DECIMAL(38,0) on both engines.
    */
  def qMannWhitney(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ab = events(spark, d)
      .filter(col("value").isNotNull && col("event_type").isin("click", "error"))
      .select(col("value").as("v"), (col("event_type") === "click").as("is_a"))
    val perValue = ab.groupBy(col("v")).agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
      count(lit(1)).as("nv"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    perValue
      .select(col("na"), col("nv"),
        (sum(col("nv")).over(w) - col("nv")).as("cumlt"))
      .agg(
        sum(col("na")).as("n1"),
        (sum(col("nv")) - sum(col("na"))).as("n2"),
        sum(col("na") * (lit(2L) * col("cumlt") + col("nv") + lit(1L)))
          .as("r1x2"),
        sum(col("nv") * col("nv") * col("nv") - col("nv")).as("t_ties"))
      .select(col("n1"), col("n2"),
        (col("r1x2") - col("n1") * (col("n1") + lit(1L))).as("u_twice"),
        col("t_ties"))
      .select(col("n1"), col("n2"), col("u_twice"), col("t_ties"),
        expr("CAST(u_twice - n1 * n2 AS DOUBLE) / " +
          "(2.0 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0) * " +
          "((CAST(n1 + n2 AS DOUBLE) + 1.0) - CAST(t_ties AS DOUBLE) / " +
          "(CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0)))))")
          .as("z"))
  }

  /** q_psi — population stability index of each language's document-
    * length distribution against the whole corpus:
    * PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) over 10 fixed-width length
    * bins — the standard drift score feature stores alarm on (rule of
    * thumb: > 0.2 ≈ significant shift). With the corpus-wide histogram
    * as the "expected" side, the output ranks languages by how atypical
    * their length profile is.
    *
    * Plan: the corpus collapses to (lang, bin) counts — ONE
    * map-side-partial hash aggregate with |langs|·10 rows of state at
    * any scale; the global histogram and totals join back broadcast. The
    * fixed 10-bin spine is generated per lang (sequence + explode) and
    * left-joined so EMPTY bins still contribute, with Laplace +1
    * smoothing ((c+1)/(n+10)) so no ln(0) and no silent bin drop.
    *
    * Determinism: counts exact BIGINT; p and q are each ONE double
    * division; the per-bin term is one pinned parenthesization through
    * the libm-exact ln; the 10 terms sum by an ORDERED fold (bin asc),
    * replayed verbatim by the oracle's list_reduce.
    */
  def qPsi(spark: SparkSession, d: String): DataFrame = {
    val binned = documents(spark, d)
      .select(col("lang"), expr("least(n_chars div 64, 9)").as("bin"))
    val langBin = binned.groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("c"))
    val globBin = binned.groupBy(col("bin")).agg(count(lit(1)).as("g"))
    val langN = binned.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val total = binned.agg(count(lit(1)).as("nn"))
    val spine = langN.select(col("lang"), col("n"),
      explode(sequence(lit(0L), lit(9L))).as("bin"))
    val p = (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
      (col("n") + lit(10L)).cast("double")
    val q = (coalesce(col("g"), lit(0L)) + lit(1L)).cast("double") /
      (col("nn") + lit(10L)).cast("double")
    spine
      .join(langBin, Seq("lang", "bin"), "left")
      .join(broadcast(globBin), Seq("bin"), "left")
      .crossJoin(broadcast(total))
      .select(col("lang"), col("n"), col("bin"),
        ((p - q) * lnLibm(p / q)).as("term"))
      .groupBy(col("lang"), col("n"))
      .agg(sort_array(collect_list(struct(col("bin"), col("term")))).as("bt"))
      .select(col("lang"), col("n"),
        expr("aggregate(bt, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)")
          .as("psi"))
      .orderBy(col("lang"))
  }

  /** Bootstrap replicates drawn by [[qBootstrapCi]] — fixed and small
    * enough that the CI bounds are plain order statistics (2nd / 39th of
    * 40 ≈ the 2.5 % / 97.5 % quantiles) with no interpolation to match.
    */
  val BootReplicates = 40

  /** Integer inverse-CDF thresholds for a Poisson(1) draw from a uniform
    * integer in [0, 10⁶): u < 367879 → 0, < 735759 → 1, < 919699 → 2,
    * < 981012 → 3, < 996340 → 4, else 5 (the ≥5 tail is ~0.37 %, folded
    * into weight 5 — a documented truncation both engines share).
    */
  val PoissonCdf: Seq[(Int, Int)] =
    Seq(367879 -> 0, 735759 -> 1, 919699 -> 2, 981012 -> 3, 996340 -> 4)

  /** LCG modulus for [[qBootstrapCi]]'s replicate draws (2³¹ − 1, the
    * same Mersenne prime the MinHash permutations mix with).
    */
  val BootP = 2147483647L

  /** Per-replicate LCG constants: the MinHash-permutation recipe
    * ((2r+1)·h + c_r mod [[BootP]]) extended to 40 replicates.
    */
  private val bootParams: Seq[(Long, Long)] =
    (0 until BootReplicates).map(r => (2L * r + 1, (1000003L * r + 12345L) % BootP))

  /** q_bootstrap_ci — Poisson-bootstrap confidence interval for the mean
    * of `value` per event_type: the DISTRIBUTED bootstrap. Classical
    * resampling (n draws with replacement) needs global coordination;
    * the Poisson approximation gives every row an independent Poisson(1)
    * weight per replicate, which is embarrassingly parallel and is how
    * resampling is actually run at 100 TB. R = 40 replicate means per
    * group, CI = their 2nd/39th order statistics.
    *
    * Determinism: each row is md5-hashed ONCE (row-identity-keyed
    * randomness — the q_sample_hash contract); replicate r's draw is the
    * MinHash-style LCG mix (aᵣ·h + bᵣ) mod [[BootP]], reduced mod 10⁶
    * and pushed through the integer inverse-CDF [[PoissonCdf]] — exact
    * integer arithmetic end-to-end. Replicate means divide an exactSum
    * decimal by an exact BIGINT weight total; CI bounds are exact
    * element selections from the sorted 40-array — no interpolation, no
    * float quantile algorithm to match.
    *
    * Plan: ONE hash aggregate with 2R columns (the q_simhash
    * 60-bit-tally shape) — NO row explosion: every input partition
    * contributes one (type, 80-column) partial, so shuffle volume is
    * |types| rows regardless of R or corpus size, and the whole weight
    * computation stays inside whole-stage codegen over the scan. The
    * 40-element array reshape happens on |types| rows — free.
    *
    * The weighted sums use the FIXED-POINT form of the exactSum
    * contract: each w·x rounds once to integer micro-units
    * (round(w·x·10⁶) — identical in both engines for positive values)
    * and accumulates as a plain BIGINT — the same order-independence
    * and cross-engine bit-exactness as the decimal cast, at
    * integer-add speed. This is the one hot spot in the suite where
    * the decimal path's constant factor actually dominates (40 decimal
    * conversions per row measured ~2× the whole query); width budget
    * |Σ| ≤ n·max(w·x)·10⁶ — revisit the scale (or revert to decimal)
    * beyond ~10⁹ rows per group.
    */
  def qBootstrapCi(spark: SparkSession, d: String): DataFrame = {
    def weightOf(u: Column): Column = PoissonCdf.reverse
      .foldLeft(lit(5L)) { case (acc, (thr, k)) =>
        when(u < thr, lit(k.toLong)).otherwise(acc) }
    val aggs = bootParams.zipWithIndex.flatMap { case ((a, b), r) =>
      val w = weightOf(((lit(a) * col("h") + lit(b)) % BootP) % 1000000L)
      Seq(sum(round(w.cast("double") * col("value") * lit(1000000.0))
          .cast("long")).as(s"ws$r"),
        sum(w).as(s"wn$r"))
    }
    val wide = events(spark, d)
      .select(col("event_type"), col("value"),
        (TextOps.md5Long(col("event_id").cast("string"), 15) % BootP).as("h"))
      .groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
    val ms = (0 until BootReplicates).map(r =>
      when(col(s"wn$r") > 0L,
        (col(s"ws$r").cast("double") / lit(1000000.0)) /
          col(s"wn$r").cast("double")))
    val point = events(spark, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Tables.exactAvg(col("value")).as("mean"))
    wide
      .select(col("event_type"), sort_array(array(ms: _*)).as("msArr"))
      .select(col("event_type"),
        element_at(col("msArr"), 2).as("ci_lo"),
        element_at(col("msArr"), BootReplicates - 1).as("ci_hi"))
      .join(broadcast(point), "event_type")
      .select(col("event_type"), col("n"), col("mean"), col("ci_lo"), col("ci_hi"))
      .orderBy(col("event_type"))
  }

  /** q_weighted_sample — deterministic weighted sampling WITHOUT
    * replacement (Efraimidis–Spirakis A-ES): top-3 events per type with
    * inclusion probability proportional to weight. The one-pass
    * distributed form of weighted sampling — each row computes its own
    * priority key ln(u)/w locally (u identity-keyed from md5, w =
    * value + 1, the documented floor that keeps zero-value rows
    * sampleable), and the sample is a bounded per-group top-k: no
    * global sort, no sequential draw loop, reproducible under any
    * partitioning.
    *
    * Plan: one hash shuffle on event_type; the rn ≤ 3 filter is a
    * WindowGroupLimit (per-partition bounded heap, the q_sample_balanced
    * contract). Determinism: u is exact-integer-derived, the key is ONE
    * pinned parenthesization through the libm-exact ln, ties broken by
    * event_id.
    */
  def qWeightedSample(spark: SparkSession, d: String): DataFrame = {
    val key = lnLibm(
      (TextOps.md5Long(col("event_id").cast("string"), 15) % 1000000L)
        .cast("double").plus(lit(0.5)) / lit(1000000.0)) /
      (col("value") + lit(1.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("key").desc, col("event_id"))
    events(spark, d)
      .select(col("event_type"), col("event_id"), col("value"), key.as("key"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("rn"), col("event_id"), col("value"), col("key"))
      .orderBy(col("event_type"), col("rn"))
  }

  /** q_welch — Welch's two-sample t-test on `value` between purchase and
    * view events: the unequal-variance mean-difference test (the safe
    * default over Student's t — no pooled-variance assumption), with the
    * Welch–Satterthwaite effective degrees of freedom. The inferential
    * companion to [[qBootstrapCi]]: the parametric answer to "did the
    * mean move", where bootstrap is the nonparametric one.
    *
    * Plan: two map-side-partial aggregates (count, exactSum, exact
    * sum-of-squares per side — ONE pass each, no window), then pure
    * 1-row arithmetic. Determinism: moments go through the exactSum
    * decimal contract; every downstream double (means, variances,
    * standard errors, t, df) is a pinned column-by-column chain mirrored
    * stepwise in the oracle — sqrt is libm in both engines, and powers
    * are written as explicit products (pow() may not be).
    */
  def qWelch(spark: SparkSession, d: String): DataFrame = {
    def side(t: String, sfx: String) =
      events(spark, d).filter(col("event_type") === t)
        .agg(count(lit(1)).as(s"n$sfx"),
          graft.Tables.exactSum(col("value")).as(s"sx$sfx"),
          graft.Tables.exactSum(col("value") * col("value")).as(s"sxx$sfx"))
    side("purchase", "1").crossJoin(side("view", "2"))
      .select(col("n1"), col("n2"),
        expr("sx1 / CAST(n1 AS DOUBLE)").as("mean_1"),
        expr("sx2 / CAST(n2 AS DOUBLE)").as("mean_2"),
        expr("(sxx1 - (sx1 * sx1) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)")
          .as("v1"),
        expr("(sxx2 - (sx2 * sx2) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)")
          .as("v2"))
      .select(col("n1"), col("n2"), col("mean_1"), col("mean_2"),
        col("v1"), col("v2"),
        expr("v1 / CAST(n1 AS DOUBLE)").as("se1"),
        expr("v2 / CAST(n2 AS DOUBLE)").as("se2"))
      .select(col("n1"), col("n2"), col("mean_1"), col("mean_2"),
        expr("(mean_1 - mean_2) / sqrt(se1 + se2)").as("t_stat"),
        expr("((se1 + se2) * (se1 + se2)) / " +
          "((se1 * se1) / (CAST(n1 AS DOUBLE) - 1.0) + " +
          "(se2 * se2) / (CAST(n2 AS DOUBLE) - 1.0))").as("df_welch"))
  }

  /** q_linreg — per-type OLS trend of the hourly event-count series:
    * slope/intercept/r² of count-vs-hour-index — "is this event type
    * growing, and how linearly?", the monitoring regression behind every
    * capacity forecast, and the parametric companion to [[qAutocorr]]
    * (same series, dependence vs drift).
    *
    * Plan: the log collapses to the (type, hour) count histogram FIRST
    * (the one pass over the data — map-side-partial); the five OLS
    * moments (Σt, Σc, Σtt, Σtc, Σcc) are then ONE hash aggregate over
    * that bounded relation (≤ |types|·|hours| rows at any volume — the
    * q_autocorr calendar-bounds-the-work stance).
    *
    * Determinism: t is exact epoch-HOURS (BIGINT — unix_micros DIV
    * 3600000000; a µs regressor would overflow Σtt), c exact BIGINT, so
    * all five moments and both determinants (n·Σtt − Σt², n·Σcc − Σc²)
    * are exact integers (width budget: n·Σtt ≈ 10³·10¹⁴ ≪ 2⁶³ at fixture
    * scale — epoch-hours ≈ 5·10⁵). Only the covariance SQUARE would
    * overflow, so r² casts the exact integer covariance to double FIRST
    * and squares in doubles — one pinned parenthesization, zero-variance
    * groups NULLed by the same exact-integer guards as the oracle.
    */
  def qLinreg(spark: SparkSession, d: String): DataFrame = {
    val hourly = events(spark, d)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) DIV 3600000000").as("t"))
      .agg(count(lit(1)).as("c"))
    val m = hourly.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("t")).as("st"), sum(col("c")).as("sc"),
      sum(col("t") * col("t")).as("stt"),
      sum(col("t") * col("c")).as("stc"),
      sum(col("c") * col("c")).as("scc"))
    val detT = m("n") * m("stt") - m("st") * m("st")
    val detC = m("n") * m("scc") - m("sc") * m("sc")
    val cov  = m("n") * m("stc") - m("st") * m("sc")
    val slope = cov.cast("double") / detT.cast("double")
    m.select(col("event_type"), col("n"),
      when(detT > 0L, slope).as("slope"),
      when(detT > 0L,
        (col("sc").cast("double") - slope * col("st").cast("double")) /
          col("n").cast("double")).as("intercept"),
      when(detT > 0L && detC > 0L,
        (cov.cast("double") * cov.cast("double")) /
          (detT.cast("double") * detC.cast("double"))).as("r2"))
      .orderBy(col("event_type"))
  }

  /** q_jaccard_sets — Jaccard similarity between event-type USER sets:
    * J(a,b) = |A∩B| / |A∪B| for every unordered type pair — the
    * set-overlap companion to [[qAssoc]]'s lift (lift asks "dependent?",
    * Jaccard asks "how much of the audience is shared?"), and the same
    * statistic MinHash estimates — computed exactly here, so the sketch
    * paths (q_minhash_sig/q_minhash_lsh) have an audit twin on the
    * events side.
    *
    * Plan: identical skeleton to [[qAssoc]] — the distinct (user, type)
    * itemset relation shrinks the log before any join (≤ |users|·|types|
    * rows), the pair join fans out ≤ |types|² per user, per-type set
    * sizes ride back broadcast. a < b keeps each unordered pair once.
    *
    * Determinism: pure exact-BIGINT counts; the ratio is the only
    * double, in one pinned parenthesization (union size via
    * inclusion–exclusion n_a + n_b − n_ab, never a second dedup pass).
    */
  def qJaccardSets(spark: SparkSession, d: String): DataFrame = {
    val items = events(spark, d)
      .select(col("user_id"), col("event_type")).distinct()
    val itemCnt = items.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    items.select(col("user_id"), col("event_type").as("a"))
      .join(items.select(col("user_id"), col("event_type").as("b")), "user_id")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .join(broadcast(itemCnt.select(col("event_type").as("a"), col("cnt").as("n_a"))), "a")
      .join(broadcast(itemCnt.select(col("event_type").as("b"), col("cnt").as("n_b"))), "b")
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") /
          (col("n_a") + col("n_b") - col("n_ab")).cast("double")).as("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  /** q_moments — per-type higher-moment shape diagnostics: population
    * variance, skewness and excess kurtosis of `value` — the
    * distribution-shape triage (heavy tail? lopsided? peaked?) a
    * pipeline runs before choosing transforms/clips, completing the
    * moment ladder ([[qWelch]] stops at the 2nd moment).
    *
    * Plan: ONE map-side-partial aggregate per group collecting the four
    * raw power sums — a single pass, no window, |types| rows out.
    *
    * Determinism: Σv..Σv³ go through the exactSum decimal contract —
    * legal because a double→decimal(scale 6) cast is only cross-engine
    * stable while v^k·10⁶ < 2⁵³ (DuckDB converts via a double multiply
    * by 10^scale; Spark via BigDecimal — they agree only when that
    * multiply is exact; v ≤ ~560 keeps v³·10⁶ ≈ 10¹⁴ safe). v⁴·10⁶ ≈
    * 10¹⁷ CROSSES the boundary (measured: the engines' s4 differ in the
    * last decimal digits), so the 4th moment uses the explicit
    * fixed-point contract instead — floor(v⁴·100 + 0.5) summed as
    * BIGINT, identical IEEE ops in both engines by construction (the
    * q_bootstrap_ci / q_power_iter recipe; width: ≤ 10¹³ per row).
    * Central moments are assembled from the raw sums in a pinned
    * stepwise double chain mirrored column-by-column in the oracle
    * (the q_welch contract); σ³ written as sqrt(v2)·v2 (no pow());
    * zero-variance groups NULLed by the same guard both sides.
    */
  def qMoments(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Tables.exactSum(col("value")).as("s1"),
        graft.Tables.exactSum(col("value") * col("value")).as("s2"),
        graft.Tables.exactSum((col("value") * col("value")) * col("value")).as("s3"),
        sum(floor(((col("value") * col("value")) * col("value")) * col("value")
          * lit(100.0) + lit(0.5)).cast("long")).as("s4i"))
      .select(col("event_type"), col("n"), col("s1"), col("s2"), col("s3"),
        (col("s4i").cast("double") / lit(100.0)).as("s4"))
      .select(col("event_type"), col("n"),
        expr("s1 / CAST(n AS DOUBLE)").as("mean"),
        expr("s2 / CAST(n AS DOUBLE)").as("r2"),
        expr("s3 / CAST(n AS DOUBLE)").as("r3"),
        expr("s4 / CAST(n AS DOUBLE)").as("r4"))
      .select(col("event_type"), col("n"), col("mean"),
        expr("r2 - mean * mean").as("variance"),
        expr("r3 - (3.0 * mean) * r2 + (2.0 * mean) * (mean * mean)").as("m3"),
        expr("r4 - (4.0 * mean) * r3 + ((6.0 * mean) * mean) * r2 " +
          "- ((3.0 * mean) * mean) * (mean * mean)").as("m4"))
      .select(col("event_type"), col("n"), col("mean"), col("variance"),
        when(col("variance") > 0.0,
          expr("m3 / (sqrt(variance) * variance)")).as("skewness"),
        when(col("variance") > 0.0,
          expr("m4 / (variance * variance) - 3.0")).as("kurtosis_ex"))
      .orderBy(col("event_type"))

  /** q_benford — Benford's-law first-digit audit of `value`: observed
    * first-significant-digit shares vs the log₁₀(1 + 1/d) expectation,
    * with the χ² goodness-of-fit — the classic fabricated-data /
    * broken-ETL tripwire (organically-generated magnitudes follow
    * Benford; hand-typed or linear-uniform ones don't). Measured on
    * this fixture: χ² ≈ 8 at 8 df — the synthetic generator draws
    * exponential-ish magnitudes, so the audit (correctly) does NOT
    * reject; MiningSpec pins that verdict so a fixture change that
    * breaks the magnitude distribution trips CI.
    *
    * Determinism: the first digit is extracted with NO floating-point
    * formatting (double→string differs across engines): value → exact
    * integer centi-units (the fixed-point contract) → BIGINT → decimal
    * string (leading-zero-free in both engines) → first character.
    * Zero-valued rows (no significant digit) are excluded identically.
    * Expected shares go through the libm-exact ln (log₁₀ x = ln x /
    * ln 10, one pinned parenthesization); the χ² sum is a digit-ORDERED
    * fold. Plan: one map-side-partial 9-row hash agg; the 9-row tail is
    * constant-sized at any volume.
    */
  def qBenford(spark: SparkSession, d: String): DataFrame = {
    val digit = substring(
      floor(col("value") * lit(100.0) + lit(0.5)).cast("string"), 1, 1)
      .cast("long")
    val counts = events(spark, d)
      .select(digit.as("digit"))
      .filter(col("digit") >= 1L)
      .groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
    val tot = counts.agg(sum(col("n_d")).as("n"))
    val pd = lnLibm(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      lnLibm(lit(10.0))
    val scored = counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_d"),
        (col("n_d").cast("double") / col("n").cast("double")).as("obs_share"),
        pd.as("exp_share"),
        ((col("n_d").cast("double") - col("n").cast("double") * pd) *
          (col("n_d").cast("double") - col("n").cast("double") * pd) /
          (col("n").cast("double") * pd)).as("chi2_term"))
    val chi = scored
      .agg(sort_array(collect_list(struct(col("digit"), col("chi2_term"))))
        .as("ts"))
      .select(
        expr("aggregate(ts, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.chi2_term)")
          .as("chi2"))
    scored.crossJoin(broadcast(chi))
      .select(col("digit"), col("n_d"), col("obs_share"), col("exp_share"),
        col("chi2"))
      .orderBy(col("digit"))
  }

  /** q_copurchase — part co-occurrence mining over order baskets: for
    * every part pair bought together in ≥ 2 orders, the co-count and
    * lift, top-100 by co-count. [[qAssoc]] at the OTHER vocabulary
    * scale: event types are a constant-sized vocabulary (per-item
    * counts broadcast, per-user fan-out |types|²); parts GROW with the
    * catalog, so here the per-item counts join by SHUFFLE (broadcast
    * is structurally impossible at 100 TB) and the pair fan-out is
    * bounded by the BASKET size (TPC-H orders hold ≤ 7 lines), a
    * per-row constant — the join output is |orders|·basket², linear in
    * orders. The ≥2-support filter prunes the singleton tail before
    * the stats joins; the top-100 is a TakeOrderedAndProject under a
    * TOTAL (n_ab desc, a, b) order, never a global sort.
    *
    * All counts BIGINT; lift is one pinned double division.
    */
  def qCopurchase(spark: SparkSession, d: String): DataFrame = {
    val items = lineitem(spark, d)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    val nOrders = items.agg(countDistinct(col("okey")).as("n_orders"))
    val partCnt = items.groupBy(col("part")).agg(count(lit(1)).as("cnt"))
    val pairs = items.select(col("okey"), col("part").as("a"))
      .join(items.select(col("okey"), col("part").as("b")), "okey")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2L)
    pairs
      .join(partCnt.select(col("part").as("a"), col("cnt").as("n_a")), "a")
      .join(partCnt.select(col("part").as("b"), col("cnt").as("n_b")), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("n_ab").desc, col("a"), col("b"))
      .limit(100)
  }

  /** Key-sampling modulus for [[qJoinSizeEst]] — keep 1/8 of join keys. */
  val JoinEstMod = 8

  /** q_join_size_est — JOIN CARDINALITY ESTIMATION by deterministic key
    * sampling: the optimizer-statistics primitive behind every join
    * reorder / broadcast decision. The self-join size on `user_id` is
    * Σᵤ f(u)² (exact, from the key histogram — never the join itself);
    * the estimator keeps the 1/[[JoinEstMod]] of keys whose portable
    * md5 lands in bucket 0 (END-BIASED key sampling — a key is either
    * fully in or fully out, so each kept key's f² term is EXACT and the
    * estimate is unbiased over the hash choice; row-level Bernoulli
    * sampling would bias f² low) and scales by the modulus. Output is
    * exact vs estimate vs signed relative error — the calibration row a
    * planner regression suite tracks.
    *
    * Plan: ONE pass to the (user, f) histogram (map-side partial), the
    * sample filter is a projection on that bounded relation, both sums
    * are exact BIGINTs. At any volume this costs what a count(*) group
    * by costs; the join being estimated is never executed. rel_err is
    * the single pinned double.
    */
  def qJoinSizeEst(spark: SparkSession, d: String): DataFrame = {
    val hist = events(spark, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("f"))
    val h = TextOps.md5Long(col("user_id").cast("string"), 15) % JoinEstMod
    hist.select(col("f"), (h === 0L).as("in_sample"))
      .agg(sum(col("f") * col("f")).as("exact_pairs"),
        (sum(when(col("in_sample"), col("f") * col("f")).otherwise(0L)) *
          JoinEstMod).as("est_pairs"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled_keys"))
      .select(col("exact_pairs"), col("est_pairs"), col("n_sampled_keys"),
        ((col("est_pairs") - col("exact_pairs")).cast("double") /
          col("exact_pairs").cast("double")).as("rel_err"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_size_est" -> qJoinSizeEst _,
    "q_assoc"         -> qAssoc _,
    "q_copurchase"    -> qCopurchase _,
    "q_chisq"         -> qChisq _,
    "q_autocorr"      -> qAutocorr _,
    "q_mutual_info"   -> qMutualInfo _,
    "q_ewma"          -> qEwma _,
    "q_gini"          -> qGini _,
    "q_rolling_count" -> qRollingCount _,
    "q_ks_test"       -> qKsTest _,
    "q_mann_whitney"  -> qMannWhitney _,
    "q_psi"           -> qPsi _,
    "q_bootstrap_ci"  -> qBootstrapCi _,
    "q_weighted_sample" -> qWeightedSample _,
    "q_welch"         -> qWelch _,
    "q_linreg"        -> qLinreg _,
    "q_jaccard_sets"  -> qJaccardSets _,
    "q_moments"       -> qMoments _,
    "q_benford"       -> qBenford _,
    "q_acf"           -> qAcf _,
  )

  val oracle: Map[String, String] = Map(
    "q_join_size_est" ->
      s"""WITH hist AS (
         |  SELECT user_id, COUNT(*) AS f FROM events GROUP BY user_id
         |), s AS (
         |  SELECT f,
         |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         |           ::BIGINT % $JoinEstMod = 0 AS in_sample
         |  FROM hist
         |), agg AS (
         |  SELECT CAST(SUM(f * f) AS BIGINT) AS exact_pairs,
         |         CAST(SUM(CASE WHEN in_sample THEN f * f ELSE 0 END)
         |           * $JoinEstMod AS BIGINT) AS est_pairs,
         |         CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_sampled_keys
         |  FROM s
         |)
         |SELECT exact_pairs, est_pairs, n_sampled_keys,
         |       CAST(est_pairs - exact_pairs AS DOUBLE)
         |         / CAST(exact_pairs AS DOUBLE) AS rel_err
         |FROM agg""".stripMargin,
    "q_benford" ->
      """WITH c AS (
        |  SELECT CAST(substr(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |           AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM events
        |), counts AS (
        |  SELECT digit, COUNT(*) AS n_d FROM c WHERE digit >= 1 GROUP BY digit
        |), tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n FROM counts),
        |scored AS (
        |  SELECT digit, n_d,
        |         CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE) AS obs_share,
        |         ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS exp_share,
        |         (CAST(n_d AS DOUBLE) - CAST(n AS DOUBLE)
        |            * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
        |         * (CAST(n_d AS DOUBLE) - CAST(n AS DOUBLE)
        |            * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
        |         / (CAST(n AS DOUBLE)
        |            * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
        |           AS chi2_term
        |  FROM counts CROSS JOIN tot
        |), chi AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(chi2_term ORDER BY digit)), (acc, x) -> acc + x) AS chi2
        |  FROM scored
        |)
        |SELECT digit, n_d, obs_share, exp_share, chi2
        |FROM scored CROSS JOIN chi ORDER BY digit""".stripMargin,
    "q_moments" ->
      """WITH s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
        |         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2,
        |         CAST(SUM(CAST((value * value) * value AS DECIMAL(38,6))) AS DOUBLE) AS s3,
        |         CAST(CAST(SUM(CAST(floor(((value * value) * value) * value
        |           * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS s4
        |  FROM events GROUP BY event_type
        |), r AS (
        |  SELECT event_type, n,
        |         s1 / CAST(n AS DOUBLE) AS mean,
        |         s2 / CAST(n AS DOUBLE) AS r2,
        |         s3 / CAST(n AS DOUBLE) AS r3,
        |         s4 / CAST(n AS DOUBLE) AS r4
        |  FROM s
        |), c AS (
        |  SELECT event_type, n, mean,
        |         r2 - mean * mean AS variance,
        |         r3 - (3.0 * mean) * r2 + (2.0 * mean) * (mean * mean) AS m3,
        |         r4 - (4.0 * mean) * r3 + ((6.0 * mean) * mean) * r2
        |           - ((3.0 * mean) * mean) * (mean * mean) AS m4
        |  FROM r
        |)
        |SELECT event_type, n, mean, variance,
        |       CASE WHEN variance > 0.0
        |            THEN m3 / (sqrt(variance) * variance) END AS skewness,
        |       CASE WHEN variance > 0.0
        |            THEN m4 / (variance * variance) - 3.0 END AS kurtosis_ex
        |FROM c ORDER BY event_type""".stripMargin,
    "q_linreg" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(date_trunc('hour', ts)) // 3600000000 AS t,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY event_type, date_trunc('hour', ts)
        |), m AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(c) AS BIGINT) AS sc,
        |         CAST(SUM(t * t) AS BIGINT) AS stt,
        |         CAST(SUM(t * c) AS BIGINT) AS stc,
        |         CAST(SUM(c * c) AS BIGINT) AS scc
        |  FROM hourly GROUP BY event_type
        |)
        |SELECT event_type, n,
        |       CASE WHEN (n * stt - st * st) > 0
        |            THEN CAST(n * stc - st * sc AS DOUBLE)
        |                 / CAST(n * stt - st * st AS DOUBLE) END AS slope,
        |       CASE WHEN (n * stt - st * st) > 0
        |            THEN (CAST(sc AS DOUBLE)
        |                  - (CAST(n * stc - st * sc AS DOUBLE)
        |                     / CAST(n * stt - st * st AS DOUBLE))
        |                    * CAST(st AS DOUBLE))
        |                 / CAST(n AS DOUBLE) END AS intercept,
        |       CASE WHEN (n * stt - st * st) > 0 AND (n * scc - sc * sc) > 0
        |            THEN (CAST(n * stc - st * sc AS DOUBLE)
        |                  * CAST(n * stc - st * sc AS DOUBLE))
        |                 / (CAST(n * stt - st * st AS DOUBLE)
        |                    * CAST(n * scc - sc * sc AS DOUBLE)) END AS r2
        |FROM m ORDER BY event_type""".stripMargin,
    "q_jaccard_sets" ->
      """WITH items AS (SELECT DISTINCT user_id, event_type FROM events),
        |ic AS (SELECT event_type, COUNT(*) AS cnt FROM items GROUP BY event_type),
        |p AS (
        |  SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS n_ab
        |  FROM items x JOIN items y ON x.user_id = y.user_id
        |  WHERE x.event_type < y.event_type
        |  GROUP BY x.event_type, y.event_type
        |)
        |SELECT a, b, n_ab, ia.cnt AS n_a, ib.cnt AS n_b,
        |       CAST(n_ab AS DOUBLE)
        |         / CAST(ia.cnt + ib.cnt - n_ab AS DOUBLE) AS jaccard
        |FROM p JOIN ic ia ON p.a = ia.event_type
        |       JOIN ic ib ON p.b = ib.event_type
        |ORDER BY a, b""".stripMargin,
    "q_copurchase" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
        |), no AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items),
        |pc AS (SELECT part, COUNT(*) AS cnt FROM items GROUP BY part),
        |pairs AS (
        |  SELECT a.part AS a, b.part AS b, COUNT(*) AS n_ab
        |  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
        |  GROUP BY a.part, b.part HAVING COUNT(*) >= 2
        |)
        |SELECT pairs.a, pairs.b, pairs.n_ab,
        |       ca.cnt AS n_a, cb.cnt AS n_b,
        |       CAST(pairs.n_ab * no.n_orders AS DOUBLE) /
        |         CAST(ca.cnt * cb.cnt AS DOUBLE) AS lift
        |FROM pairs
        |JOIN pc ca ON pairs.a = ca.part
        |JOIN pc cb ON pairs.b = cb.part
        |CROSS JOIN no
        |ORDER BY pairs.n_ab DESC, pairs.a, pairs.b LIMIT 100""".stripMargin,
    "q_assoc" ->
      """WITH items AS (SELECT DISTINCT user_id, event_type FROM events),
        |u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
        |ic AS (SELECT event_type, COUNT(*) AS cnt FROM items GROUP BY event_type),
        |p AS (
        |  SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS n_ab
        |  FROM items x JOIN items y ON x.user_id = y.user_id
        |  WHERE x.event_type <> y.event_type
        |  GROUP BY x.event_type, y.event_type
        |)
        |SELECT a, b, n_ab, ia.cnt AS n_a, ib.cnt AS n_b,
        |       CAST(n_ab AS DOUBLE) / CAST(n_users AS DOUBLE) AS support,
        |       CAST(n_ab AS DOUBLE) / CAST(ia.cnt AS DOUBLE) AS confidence,
        |       (CAST(n_ab AS DOUBLE) * CAST(n_users AS DOUBLE))
        |         / (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE)) AS lift
        |FROM p JOIN ic ia ON p.a = ia.event_type
        |       JOIN ic ib ON p.b = ib.event_type
        |       CROSS JOIN u
        |ORDER BY a, b""".stripMargin,
    "q_chisq" ->
      """WITH pres AS (
        |  SELECT lang, doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        |  FROM documents
        |), cell AS (
        |  SELECT token, lang, COUNT(*) AS n11 FROM pres GROUP BY token, lang
        |), langn AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
        |dft AS (SELECT token, CAST(SUM(n11) AS BIGINT) AS df FROM cell GROUP BY token),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT lang, token, n11,
        |       n_lang - n11 AS n10,
        |       df - n11 AS n01,
        |       n_docs - n_lang - (df - n11) AS n00,
        |       (CAST(n_docs AS DOUBLE)
        |          * (CAST(n11 * (n_docs - n_lang - (df - n11))
        |                  - (n_lang - n11) * (df - n11) AS DOUBLE)
        |             * CAST(n11 * (n_docs - n_lang - (df - n11))
        |                  - (n_lang - n11) * (df - n11) AS DOUBLE)))
        |       / (((CAST(n_lang AS DOUBLE) * CAST(n_docs - n_lang AS DOUBLE))
        |            * CAST(df AS DOUBLE)) * CAST(n_docs - df AS DOUBLE)) AS chi2
        |FROM cell JOIN langn USING (lang) JOIN dft USING (token) CROSS JOIN nd
        |WHERE df < n_docs
        |ORDER BY chi2 DESC, lang, token LIMIT 20""".stripMargin,
    "q_acf" ->
      s"""WITH hourly AS (
         |  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
         |         CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1
         |), lagged AS (
         |  SELECT h - lag AS h, lag, x AS y
         |  FROM hourly CROSS JOIN
         |    (SELECT unnest(range(1, ${AcfMaxLag + 1})) AS lag)
         |), m AS (
         |  SELECT lag, COUNT(*) AS n,
         |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |         CAST(SUM(x * y) AS BIGINT) AS sxy,
         |         CAST(SUM(x * x) AS BIGINT) AS sxx,
         |         CAST(SUM(y * y) AS BIGINT) AS syy
         |  FROM hourly JOIN lagged USING (h) GROUP BY lag
         |)
         |SELECT lag, n,
         |       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
         |            THEN CAST(n * sxy - sx * sy AS DOUBLE)
         |                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         |       END AS acf
         |FROM m ORDER BY lag""".stripMargin,
    "q_autocorr" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY date_trunc('hour', ts)
        |), pairs AS (
        |  SELECT a.x AS x, b.x AS y
        |  FROM hourly a JOIN hourly b ON a.h = b.h - INTERVAL 1 HOUR
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx,
        |         CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM pairs
        |)
        |SELECT n,
        |       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        |            THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |       END AS autocorr
        |FROM m""".stripMargin,
    "q_gini" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |                                 ORDER BY value, event_id) AS BIGINT) AS rk
        |  FROM events
        |), a AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s_x,
        |         CAST(SUM(CAST(CAST(rk AS DOUBLE) * value AS DECIMAL(38,6))) AS DOUBLE) AS s_rx
        |  FROM r GROUP BY event_type
        |)
        |SELECT event_type, n,
        |       (2.0 * s_rx - CAST(n + 1 AS DOUBLE) * s_x)
        |         / (CAST(n AS DOUBLE) * s_x) AS gini
        |FROM a ORDER BY event_type""".stripMargin,
    "q_rolling_count" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS cnt_1h
        |FROM events ORDER BY event_id""".stripMargin,
    "q_ewma" ->
      """WITH hx AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, date_trunc('hour', ts)
        |)
        |SELECT event_type, COUNT(*) AS n_hours,
        |       list_reduce(list_prepend(CAST(-1.0 AS DOUBLE),
        |         list(CAST(x AS DOUBLE) ORDER BY h)),
        |         (acc, x) -> CASE WHEN acc < CAST(0.0 AS DOUBLE) THEN x
        |                          ELSE CAST(0.2 AS DOUBLE) * x
        |                               + CAST(0.8 AS DOUBLE) * acc END) AS ewma
        |FROM hx GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_mann_whitney" ->
      """WITH ab AS (
        |  SELECT value AS v, (event_type = 'click') AS is_a
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'error')
        |), pv AS (
        |  SELECT v,
        |         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |         COUNT(*) AS nv
        |  FROM ab GROUP BY v
        |), rk AS (
        |  SELECT na, nv,
        |         SUM(nv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - nv
        |           AS cumlt
        |  FROM pv
        |), agg AS (
        |  SELECT CAST(SUM(na) AS BIGINT) AS n1,
        |         CAST(SUM(nv) - SUM(na) AS BIGINT) AS n2,
        |         CAST(SUM(na * (2 * cumlt + nv + 1)) AS BIGINT) AS r1x2,
        |         CAST(SUM(nv * nv * nv - nv) AS BIGINT) AS t_ties
        |  FROM rk
        |), u AS (
        |  SELECT n1, n2, r1x2 - n1 * (n1 + 1) AS u_twice, t_ties FROM agg
        |)
        |SELECT n1, n2, u_twice, t_ties,
        |       CAST(u_twice - n1 * n2 AS DOUBLE) /
        |       (2.0 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0) *
        |         ((CAST(n1 + n2 AS DOUBLE) + 1.0) - CAST(t_ties AS DOUBLE) /
        |          (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0)))))
        |         AS z
        |FROM u""".stripMargin,
    "q_ks_test" ->
      s"""WITH split AS (
         |  SELECT n_chars,
         |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |           % 10 < ${graft.operators.TextOps.TrainBuckets} AS is_train
         |  FROM documents
         |), pv AS (
         |  SELECT n_chars,
         |         SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS ca,
         |         SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS cb
         |  FROM split GROUP BY n_chars
         |), cum AS (
         |  SELECT n_chars,
         |         SUM(ca) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS fa,
         |         SUM(cb) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS fb
         |  FROM pv
         |), tot AS (
         |  SELECT SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS n_train,
         |         SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS n_test
         |  FROM split
         |)
         |SELECT CAST(n_train AS BIGINT) AS n_train,
         |       CAST(n_test AS BIGINT) AS n_test,
         |       CAST(MAX(ABS(fa * n_test - fb * n_train)) AS BIGINT) AS ks_num,
         |       CAST(MAX(ABS(fa * n_test - fb * n_train)) AS DOUBLE)
         |         / CAST(n_train * n_test AS DOUBLE) AS ks_stat
         |FROM cum CROSS JOIN tot
         |GROUP BY n_train, n_test""".stripMargin,
    "q_psi" ->
      """WITH binned AS (
        |  SELECT lang, least(n_chars // 64, 9) AS bin FROM documents
        |), lb AS (SELECT lang, bin, COUNT(*) AS c FROM binned GROUP BY lang, bin),
        |gb AS (SELECT bin, COUNT(*) AS g FROM binned GROUP BY bin),
        |langn AS (SELECT lang, COUNT(*) AS n FROM binned GROUP BY lang),
        |tot AS (SELECT COUNT(*) AS nn FROM binned),
        |t AS (
        |  SELECT s.lang, s.n, s.bin,
        |         (CAST(COALESCE(lb.c, 0) + 1 AS DOUBLE) / CAST(s.n + 10 AS DOUBLE)
        |          - CAST(COALESCE(gb.g, 0) + 1 AS DOUBLE) / CAST(nn + 10 AS DOUBLE))
        |         * ln((CAST(COALESCE(lb.c, 0) + 1 AS DOUBLE) / CAST(s.n + 10 AS DOUBLE))
        |              / (CAST(COALESCE(gb.g, 0) + 1 AS DOUBLE) / CAST(nn + 10 AS DOUBLE)))
        |           AS term
        |  FROM (SELECT lang, n, unnest(range(0, 10)) AS bin FROM langn) s
        |  LEFT JOIN lb ON s.lang = lb.lang AND s.bin = lb.bin
        |  LEFT JOIN gb ON s.bin = gb.bin
        |  CROSS JOIN tot
        |)
        |SELECT lang, n,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         list(term ORDER BY bin)), (acc, x) -> acc + x) AS psi
        |FROM t GROUP BY lang, n ORDER BY lang""".stripMargin,
    "q_bootstrap_ci" -> {
      def wSql(r: Int): String = {
        val (a, b) = bootParams(r)
        val u = s"((($a * h) + $b) % $BootP) % 1000000"
        s"CASE ${PoissonCdf.map { case (thr, k) => s"WHEN $u < $thr THEN $k" }
          .mkString(" ")} ELSE 5 END"
      }
      s"""WITH hv AS (
         |  SELECT event_type, value,
         |         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
         |           % $BootP AS h
         |  FROM events
         |), wide AS (
         |  SELECT event_type,
         |         ${(0 until BootReplicates).map { r =>
                     s"CAST(SUM(CAST(round(CAST(${wSql(r)} AS DOUBLE) * value * 1000000.0) AS BIGINT)) AS BIGINT) AS ws$r, " +
                     s"SUM(${wSql(r)}) AS wn$r"
                   }.mkString(",\n         ")}
         |  FROM hv GROUP BY event_type
         |), ci AS (
         |  SELECT event_type,
         |         list_sort([${(0 until BootReplicates).map { r =>
                     s"CASE WHEN wn$r > 0 THEN (CAST(ws$r AS DOUBLE) / 1000000.0) / CAST(wn$r AS DOUBLE) END"
                   }.mkString(", ")}]) AS ms
         |  FROM wide
         |), pt AS (
         |  SELECT event_type, COUNT(*) AS n,
         |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS mean
         |  FROM events GROUP BY event_type
         |)
         |SELECT event_type, n, mean,
         |       ms[2] AS ci_lo, ms[${BootReplicates - 1}] AS ci_hi
         |FROM ci JOIN pt USING (event_type)
         |ORDER BY event_type""".stripMargin
    },
    "q_welch" ->
      """WITH s1 AS (
        |  SELECT COUNT(*) AS n1,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx1,
        |         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS sxx1
        |  FROM events WHERE event_type = 'purchase'
        |), s2 AS (
        |  SELECT COUNT(*) AS n2,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
        |         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS sxx2
        |  FROM events WHERE event_type = 'view'
        |), m AS (
        |  SELECT n1, n2,
        |         sx1 / CAST(n1 AS DOUBLE) AS mean_1,
        |         sx2 / CAST(n2 AS DOUBLE) AS mean_2,
        |         (sxx1 - (sx1 * sx1) / CAST(n1 AS DOUBLE))
        |           / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
        |         (sxx2 - (sx2 * sx2) / CAST(n2 AS DOUBLE))
        |           / (CAST(n2 AS DOUBLE) - 1.0) AS v2
        |  FROM s1 CROSS JOIN s2
        |), se AS (
        |  SELECT n1, n2, mean_1, mean_2,
        |         v1 / CAST(n1 AS DOUBLE) AS se1,
        |         v2 / CAST(n2 AS DOUBLE) AS se2
        |  FROM m
        |)
        |SELECT n1, n2, mean_1, mean_2,
        |       (mean_1 - mean_2) / sqrt(se1 + se2) AS t_stat,
        |       ((se1 + se2) * (se1 + se2))
        |         / ((se1 * se1) / (CAST(n1 AS DOUBLE) - 1.0)
        |            + (se2 * se2) / (CAST(n2 AS DOUBLE) - 1.0)) AS df_welch
        |FROM se""".stripMargin,
    "q_weighted_sample" ->
      """WITH k AS (
        |  SELECT event_type, event_id, value,
        |         ln(((('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
        |              % 1000000) + 0.5) / 1000000.0)
        |           / (value + 1.0) AS key
        |  FROM events
        |), r AS (
        |  SELECT event_type, event_id, value, key,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY key DESC, event_id) AS rn
        |  FROM k
        |)
        |SELECT event_type, rn, event_id, value, key
        |FROM r WHERE rn <= 3
        |ORDER BY event_type, rn""".stripMargin,
    "q_mutual_info" ->
      """WITH joint AS (
        |  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
        |         COUNT(*) AS c_th
        |  FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
        |), mt AS (SELECT event_type, CAST(SUM(c_th) AS BIGINT) AS c_t
        |          FROM joint GROUP BY event_type),
        |mh AS (SELECT hr, CAST(SUM(c_th) AS BIGINT) AS c_h FROM joint GROUP BY hr),
        |nn AS (SELECT CAST(SUM(c_th) AS BIGINT) AS n FROM joint),
        |t AS (
        |  SELECT event_type, hr,
        |         (CAST(c_th AS DOUBLE) / CAST(n AS DOUBLE))
        |           * ln((CAST(c_th AS DOUBLE) * CAST(n AS DOUBLE))
        |                / (CAST(c_t AS DOUBLE) * CAST(c_h AS DOUBLE))) AS term
        |  FROM joint JOIN mt USING (event_type) JOIN mh USING (hr) CROSS JOIN nn
        |)
        |SELECT COUNT(*) AS n_cells,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         list(term ORDER BY event_type, hr)), (acc, x) -> acc + x) AS mi
        |FROM t""".stripMargin,
  )
}
