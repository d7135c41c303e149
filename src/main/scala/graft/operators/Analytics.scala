package graft.operators

import graft.Tables._
import graft.functions.ArgMaxLong.argMaxLong
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation / join / window / set-op extensions (SURVEY.md §2e E1-E7,
  * E10-E12) — the north-star batch-analytics surface the reference's
  * bar-chart + insight shape implies at scale
  * (/root/reference/app.py:279-293).
  *
  * Scale notes baked into each query:
  *  - group-bys use Catalyst hash aggregation with map-side partial
  *    aggregation — only |groups| rows reach the shuffle;
  *  - dimension sides of star joins are `broadcast()` so the 100 TB fact
  *    table never shuffles for a join;
  *  - aggregated doubles go through exact decimal sums (Tables.exactSum) so
  *    results are identical under any partitioning/AQE re-plan;
  *  - the one windowed query partitions by user_id — state per key, the
  *    same layout a 1000-executor cluster would use.
  */
object Analytics {

  /** q_groupby_agg — per-(flag,status) count/sum/avg, the bar-chart
    * aggregation shape (app.py:281-287) at TPC-H Q1's layout.
    */
  def qGroupbyAgg(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_price"),
        exactAvg(col("l_discount")).as("avg_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q_pricing — the FULL TPC-H Q1 pricing summary (the canonical
    * analytics-engine benchmark query, vs [[qGroupbyAgg]]'s chart-shaped
    * subset): shipdate cutoff, eight aggregates including the
    * `price·(1−disc)` and `price·(1−disc)·(1+tax)` product measures.
    * ONE map-side-partial hash aggregate over the scan — at 100 TB the
    * shuffle carries a handful of (flag, status) partial rows per input
    * partition and the timestamp cutoff is PUSHED to the parquet reader
    * (PushedFilters), so pre-cutoff row groups never decompress.
    *
    * Determinism: products are evaluated left-to-right in IEEE double per
    * row ((price·(1−disc))·(1+tax) — one parenthesization both engines),
    * then summed order-independently via [[graft.Tables.exactSum]]'s
    * decimal cast. Averages divide the exact decimal sum by the count.
    */
  /** q_market_share — supplier-nation revenue share per order month
    * (TPC-H Q8's shape): how each nation's suppliers split the market,
    * month by month. The fact table joins orders CO-KEYED on the order
    * key (both sides shuffle once on l_orderkey/o_orderkey — at 100 TB
    * this is the join you bucket both tables on); supplier→nation is a
    * BROADCAST snowflake arm; revenue is exact BIGINT cents of the
    * discounted price; the share divides each (month, nation) cell by
    * its month total through ONE aggregate-sized window, a pinned
    * division of exact integers.
    *
    * Note the cents conversion happens per LINE (floor(x·100+0.5) on the
    * discounted price, both engines) BEFORE aggregation, so the sum is
    * order-independent — the float-sum-then-round alternative would be
    * partitioning-dependent in the rounding ulp.
    */
  def qMarketShare(spark: SparkSession, d: String): DataFrame = {
    val sn = supplier(spark, d)
      .join(broadcast(nation(spark, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val lineCents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    val cells = lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"), lineCents.as("cents"))
      .join(orders(spark, d)
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(tsSeconds(col("month")).as("month_s"), col("n_name"))
      .agg(sum(col("cents")).as("rev_cents"))
    val monthW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("month_s"))
    cells
      .withColumn("month_cents", sum(col("rev_cents")).over(monthW))
      .select(col("month_s"), col("n_name"), col("rev_cents"),
        (col("rev_cents").cast("double") / col("month_cents").cast("double"))
          .as("share"))
      .orderBy(col("month_s"), col("n_name"))
  }

  /** Cents threshold for [[qBigSpenders]] — ~the customer-total p95 of the
    * fixture (400M cents = $4M): the HAVING cut that keeps "large-volume
    * customers" a short list.
    */
  val BigSpenderCents = 400000000L

  /** q_big_spenders — large-volume customers and their orders (TPC-H
    * Q18's shape): aggregate-then-join-back. Phase 1 reduces orders to
    * per-customer BIGINT totals and applies the HAVING threshold —
    * customer-sized BEFORE any join; phase 2 joins the (short) qualifying
    * list back to orders — AQE broadcasts it — plus the customer name
    * arm. The anti-pattern this query exists to reject is filtering the
    * JOINED fact table by a windowed total (shuffles the whole fact
    * twice); the two-phase form shuffles orders once for the aggregate
    * and streams the join-back map-side.
    */
  def qBigSpenders(spark: SparkSession, d: String): DataFrame = {
    val orderCents =
      floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
    val o = orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), orderCents.as("cents"))
    val spenders = o.groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("total_cents"))
      .filter(col("total_cents") > lit(BigSpenderCents))
    o.join(spenders, "o_custkey")
      .join(broadcast(customer(spark, d)
        .select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_custkey"), col("total_cents"),
        col("o_orderkey"), tsSeconds(col("o_orderdate")).as("o_date_s"),
        col("cents").as("order_cents"))
      .orderBy(col("total_cents").desc, col("o_custkey"), col("o_orderkey"))
  }

  /** q_lateral — the correlated LATERAL subquery surface: each
    * customer's top-2 orders by value, written exactly as the SQL canon
    * writes it (`FROM c, LATERAL (SELECT ... WHERE o.ck = c.ck ORDER BY
    * ... LIMIT 2)`). Catalyst DECORRELATES the lateral into the same
    * per-group-top-k machinery the explicit q_topk_group operator uses —
    * the planner story: the user-facing correlated form and the
    * engine-facing window/heap form meet at one physical plan, so
    * LIMIT-inside-LATERAL does not become a per-row re-execution (the
    * nested-loop reading of the syntax). All-integer output under a
    * total order.
    */
  def qLateral(spark: SparkSession, d: String): DataFrame = {
    orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents"))
      .createOrReplaceTempView("graft_lat_orders")
    customer(spark, d).select(col("c_custkey"))
      .createOrReplaceTempView("graft_lat_cust")
    spark.sql(
      """SELECT c.c_custkey, l.o_orderkey, l.cents
        |FROM graft_lat_cust c,
        |LATERAL (SELECT o_orderkey, cents FROM graft_lat_orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY cents DESC, o_orderkey LIMIT 2) l
        |ORDER BY c.c_custkey, l.cents DESC, l.o_orderkey""".stripMargin)
  }

  def qPricing(spark: SparkSession, d: String): DataFrame = {
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = discPrice * (lit(1.0) + col("l_tax"))
    lineitem(spark, d)
      // l_shipdate is TIMESTAMP_NTZ in the parquet (like o_orderdate); the
      // cutoff literal must be NTZ too or analysis inserts a tz cast above
      // the scan and the predicate stops pushing down.
      .filter(col("l_shipdate") <=
        lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(discPrice).as("sum_disc_price"),
        exactSum(charge).as("sum_charge"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_extendedprice")).as("avg_price"),
        exactAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q_revenue_topn — TPC-H Q3's shape: segment-filtered customers ⋈
    * orders ⋈ lineitem → top-10 orders by discounted revenue. The join
    * topology IS the scale story: the filtered customer keys are a
    * dimension-sized BROADCAST (the fact-table lineitem side never
    * shuffles for either join at 100 TB — AQE picks broadcast-hash from
    * the post-filter size; at true 100 TB orders⋈lineitem becomes a
    * co-partitioned shuffle join on orderkey, the bucketing
    * [[graft.sources.WritePath]] demonstrates), and the top-10 plans as
    * TakeOrderedAndProject — O(k) per partition, never a global sort.
    * Revenue is an exact decimal sum; (revenue DESC, orderkey) gives a
    * total order so the LIMIT is deterministic.
    */
  def qRevenueTopn(spark: SparkSession, d: String): DataFrame = {
    val cust = customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    lineitem(spark, d)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(exactSum(col("rev")).as("revenue"))
      .select(col("o_orderkey"),
        tsSeconds(col("o_orderdate").cast("timestamp"))
          .as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** q_regional_revenue — TPC-H Q5's shape, the canonical star-schema
    * multi-way join: revenue per nation for orders where the CUSTOMER and
    * the SUPPLIER sit in the same nation of one region — lineitem ⋈
    * orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region, five joins spanning
    * the fact table and every dimension tier.
    *
    * Scale shape: the ONLY big-big join is lineitem ⋈ orders on the order
    * key (shuffle on both sides — unavoidable and correct); customer is a
    * key-projected join AQE broadcasts when it fits and shuffles when it
    * doesn't (no forced hint — at 100 TB customer is NOT broadcastable
    * and the planner must be free to shuffle it); supplier, nation and
    * region are true dimension broadcasts. The same-nation predicate
    * (c_nationkey = s_nationkey) rides the supplier join condition, so
    * mismatched rows die before the aggregate. Revenue is the exact
    * decimal sum.
    */
  def qRegionalRevenue(spark: SparkSession, d: String): DataFrame = {
    val asiaNations = nation(spark, d)
      .join(broadcast(region(spark, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer(spark, d).select(col("c_custkey"), col("c_nationkey"))
    val sup = supplier(spark, d).select(col("s_suppkey"), col("s_nationkey"))
    lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(orders(spark, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(exactSum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q_top_supplier — TPC-H Q15's shape: max-of-aggregate. Quarterly
    * revenue per supplier, then the supplier(s) achieving the maximum —
    * the "which key won" pattern (hottest shard, best-performing source)
    * that tempts a driver-side `collect().maxBy`. The distributed form:
    * the per-supplier aggregate is computed ONCE (cached across its two
    * uses — Spark would otherwise re-run the whole subtree for each side
    * of the self-join), the global max is a 1-ROW aggregate of that
    * (supplier-count-sized, tiny) table broadcast back as the join
    * filter, and the winner joins the supplier dimension broadcast-side.
    * Nothing wider than the revenue table's own group-by ever shuffles,
    * and no row reaches the driver.
    *
    * Determinism: revenue stays DECIMAL(38,6) (exact, order-invariant)
    * through the max-equality comparison — comparing doubles computed by
    * two engines for exact equality would be a latent last-ulp mismatch —
    * and is cast to double only in the output projection. Ties at the max
    * all survive, ordered by s_suppkey.
    */
  def qTopSupplier(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val rev = cacheForSelfJoin(
      lineitem(spark, d)
        .filter(col("l_shipdate") >=
            lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
          col("l_shipdate") <
            lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(38, 6))).as("total_rev")))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    rev
      .join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .join(broadcast(supplier(spark, d)
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** q_promo_share — TPC-H Q14's shape: CONDITIONAL aggregation over a
    * fact ⋈ dimension join, collapsing to one global ratio row (promo
    * revenue as a % of the month's total). The shape matters at scale
    * because the naive alternative — two separate filtered scans joined
    * back — reads the fact table twice; the conditional `sum(when(...))`
    * computes both the numerator and denominator in ONE pass, partial-
    * aggregated map-side so the shuffle carries one 2-value row per input
    * partition. `part` is key-projected to (p_partkey, p_type) and left
    * UN-hinted — AQE broadcasts it at fixture scale, and at 100 TB (where
    * part is billions of rows) the planner is free to shuffle both sides
    * on the part key instead. The shipdate month cutoff pushes into the
    * parquet scan.
    *
    * Determinism: both sums are exact decimals; the final ratio is ONE
    * pinned parenthesization ((promo·100)/total) evaluated in IEEE double
    * identically in both engines. No-promo months yield NULL (sum over an
    * empty set) rather than 0 — mirrored by the oracle's CASE-less sum.
    */
  def qPromoShare(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(38, 6))
    lineitem(spark, d)
      .filter(col("l_shipdate") >=
          lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        col("l_shipdate") <
          lit("1996-02-01 00:00:00").cast("timestamp_ntz"))
      .join(part(spark, d).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", rev)).cast("double") * lit(100.0) /
          sum(rev).cast("double")).as("promo_share"),
        count(lit(1)).as("n_items"))
  }

  /** q_markov — first-order event-transition matrix: counts and
    * conditional probabilities P(next event type | current) from each
    * user's (ts, event_id)-ordered history — the sequence-mining step
    * behind next-action prediction, funnel synthesis, and bot detection
    * (a bot's transition row is near-deterministic; a human's is not).
    *
    * Scale shape: ONE shuffle that matters — the per-user window
    * producing `lag(event_type)` (hash-partitioned on user_id, per-key
    * sort shared with everything else keyed the same way). Everything
    * after runs on the TRANSITION table, which is |types|² rows (25
    * here) at ANY corpus size — the second aggregate and the per-prev
    * normalizing window are asymptotically free, the classic
    * big-log-to-small-model collapse. Probabilities divide exact BIGINT
    * counts in one pinned double division, so rows hash-match.
    */
  def qMarkov(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = events(spark, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .select(lag(col("event_type"), 1).over(w).as("prev"),
        col("event_type").as("cur"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev"))
    trans.select(col("prev"), col("cur"), col("n"),
        (col("n").cast("double") / sum(col("n")).over(byPrev).cast("double"))
          .as("p"))
      .orderBy(col("prev"), col("cur"))
  }

  /** q_constraint_check — declarative data-quality validation (the
    * dbt-test / expectations pattern): one row per constraint with its
    * violation count, over four constraint CLASSES a warehouse actually
    * enforces — key uniqueness (orders.o_orderkey), referential
    * integrity (every lineitem points at an existing order), a domain
    * range (l_discount ∈ [0, 1]), and non-null (c_custkey). The report
    * shape (not a boolean, not an exception) is deliberate: at 100 TB a
    * validation run feeds a dashboard/circuit-breaker, and the count of
    * violations is the signal.
    *
    * Scale shape per class: uniqueness is a two-level aggregate (per-key
    * counts map-side partial, then one violation row per DUPLICATED key
    * — never a distinct-collect); referential integrity is a LEFT ANTI
    * join (orderkey-shuffle of the two fact tables — the honest
    * unavoidable cost; at rest both sides would be bucketed by orderkey
    * and the Exchange vanishes, see WritePath); range and non-null are
    * pure map-side conditional counts. The four single-row results union
    * into the report — each leg is its own tiny plan, so a failed SLA on
    * one constraint points at one subtree.
    */
  def qConstraintCheck(spark: SparkSession, d: String): DataFrame = {
    val uniq = orders(spark, d)
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0))
          .cast("long").as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit("unique_o_orderkey").as("constraint"),
        col("n_violations"), col("n_checked"))
    val fk = lineitem(spark, d).select(col("l_orderkey"))
      .join(orders(spark, d).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(lineitem(spark, d).agg(count(lit(1)).as("n_checked")))
      .select(lit("fk_lineitem_orders").as("constraint"),
        col("n_violations"), col("n_checked"))
    val range = lineitem(spark, d)
      .agg(coalesce(sum(when(col("l_discount") < 0.0 ||
            col("l_discount") > 1.0, 1L)), lit(0L)).as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit("range_l_discount_0_1").as("constraint"),
        col("n_violations"), col("n_checked"))
    val nn = customer(spark, d)
      .agg((count(lit(1)) - count(col("c_custkey"))).as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit("notnull_c_custkey").as("constraint"),
        col("n_violations"), col("n_checked"))
    uniq.unionByName(fk).unionByName(range).unionByName(nn)
      .orderBy(col("constraint"))
  }

  /** q_incremental_agg — incremental aggregate maintenance, the pattern
    * every scheduled ETL at scale runs instead of full recomputes: the
    * standing aggregate state (here: everything before the last day) is
    * MERGED with the new delta's partial aggregate, without touching the
    * historical rows' detail again. The query computes state and delta as
    * two independent per-type partial aggregates (sum/count/min/max —
    * each a map-side-partial hash agg over a date-pruned scan) and merges
    * them with the algebra that makes partial aggregation work at all:
    * sums add, counts add, min/max fold. The oracle computes the SAME
    * aggregate over the full table in one pass, so the green hash row IS
    * the proof that merge(agg(state), agg(delta)) = agg(state ∪ delta) —
    * exactly (decimal sums make + associative; min/max are selections).
    * At 100 TB the state side is itself a stored table and this plan
    * reads only the delta partition — the cost drops from O(history) to
    * O(day).
    */
  def qIncrementalAgg(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cutoff = lit("2024-01-30 00:00:00").cast("timestamp")
    // Partial sums stay DECIMAL through the merge: adding two
    // double-rounded partials would differ from the rounding of the
    // exact total in the last ulp — the merge must use the exact
    // representation and round ONCE at the end, which is precisely how
    // Spark's own partial aggregation stays correct.
    def partials(df: DataFrame) = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 6))).as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
    val state = partials(events(spark, d).filter(col("ts") < cutoff))
      .withColumnsRenamed(Map("n" -> "n_s", "sum_v" -> "sum_s",
        "min_v" -> "min_s", "max_v" -> "max_s"))
    val delta = partials(events(spark, d).filter(col("ts") >= cutoff))
      .withColumnsRenamed(Map("n" -> "n_d", "sum_v" -> "sum_d",
        "min_v" -> "min_d", "max_v" -> "max_d"))
    val decZero = lit(0).cast(DecimalType(38, 6))
    // FULL outer: a type seen only in history or only today must survive
    // the merge — the classic incremental-pipeline edge case.
    state.join(delta, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("sum_s"), decZero) + coalesce(col("sum_d"), decZero))
          .cast("double").as("sum_v"),
        least(col("min_s"), col("min_d")).as("min_v"),
        greatest(col("max_s"), col("max_d")).as("max_v"))
      .orderBy(col("event_type"))
  }

  /** q_distinct — exact distinct count per group (E2). Spark plans this as a
    * two-phase expand+aggregate; partial-distinct happens before the
    * shuffle.
    */
  def qDistinct(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd_part"))
      .orderBy(col("l_returnflag"))

  /** q_approx_distinct — HLL++ distinct (E2 approximate). The 100 TB path:
    * constant memory per group vs. countDistinct's per-key state. Sketches
    * differ from DuckDB's, so no SQL oracle — self-checked in tests against
    * the exact count (rsd bound).
    */
  def qApproxDistinct(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("nd_approx"))
      .orderBy(col("l_returnflag"))

  /** q_approx_topk — the engine-native heavy-hitters sketch (Spark 4.1's
    * `approx_top_k` family): estimated top-k items with counts, built by
    * the SAME accumulate → combine → estimate lifecycle as the HLL and
    * MinHash sketches (q_hll_merge / q_minhash_merge complete the trio:
    * distinct counts, set overlap, heavy hitters) — 1000 executors each
    * accumulate their slice, constant-size sketches combine, one
    * estimate finishes. AnalyticsSpec pins the per-day-accumulate +
    * combine path against the direct sketch.
    *
    * The fixture's event_type domain (5 values) sits far under the
    * sketch's default tracking capacity, where approx_top_k is EXACT by
    * construction — so unlike the other sketches this one carries a full
    * hash-match oracle (exact top counts), proving the sketch path
    * end-to-end rather than rows-only.
    *
    * Plan: one map-side-partial sketch aggregate (constant state per
    * partition), explode of the k-row estimate; nothing corpus-sized
    * ever shuffles.
    */
  def qApproxTopk(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .agg(expr("approx_top_k(event_type, 5)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))

  /** q_hll_merge — HLL sketch MERGEABILITY, the property that makes
    * approximate distinct-counting a DISTRIBUTED sketch (the HLL analog
    * of q_minhash_merge): per-shard sketches union into exactly the
    * sketch of the union, so 1000 executors each sketch their slice and
    * a constant-size merge finishes the job — also the incremental-view
    * path (yesterday's sketch + today's delta sketch, no rescan).
    * Per event_type: the DIRECT DataSketches HLL estimate of distinct
    * users, the estimate from merging per-DAY sub-sketches, and the
    * exact count. AnalyticsSpec asserts merged == direct EXACTLY (union
    * of HLL registers is an order-independent max) and both within the
    * sketch's error bound of exact; the driver gate is rows-only
    * (DataSketches registers have no DuckDB twin — same contract as
    * q_approx_distinct).
    *
    * Plan: both sketch paths are map-side-partial aggregates (state =
    * one 2^12-register sketch per group per partition); the day-sharded
    * path shuffles |types|·days sketches, the merge |types|. Nothing is
    * ever corpus-sized.
    */
  def qHllMerge(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d).select(col("event_type"), col("user_id"),
      dayofmonth(col("ts")).as("shard"))
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"),
        countDistinct(col("user_id")).as("n_exact"))
    val merged = ev.groupBy(col("event_type"), col("shard"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
    direct.join(merged, "event_type")
      .select(col("event_type"), col("n_exact"),
        col("est_direct"), col("est_merged"))
      .orderBy(col("event_type"))
  }

  /** q_join_inner — star join orders⋈customer⋈nation → revenue per nation
    * (E3). Only the true dimension (nation, fixed 25 rows) is broadcast;
    * customer grows with the scale factor, so orders⋈customer is left to
    * Spark's shuffle/AQE choice — at 100 TB that join runs co-partitioned on
    * custkey (bucketed in a real deployment) instead of OOM-ing executors
    * with a fact-proportional broadcast.
    */
  def qJoinInner(spark: SparkSession, d: String): DataFrame = {
    val o = orders(spark, d).select(col("o_custkey"), col("o_totalprice"))
    val c = customer(spark, d).select(col("c_custkey"), col("c_nationkey"))
    val n = nation(spark, d).select(col("n_nationkey"), col("n_name"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** q_join_left — left outer join keeping customers with zero orders (E3),
    * aggregated per customer. Broadcast the dim side (customer) is wrong
    * here — the aggregation is on the left key, so Spark's shuffled hash /
    * AQE choice is kept; at scale this is a co-partitioned join on
    * custkey.
    */
  def qJoinLeft(spark: SparkSession, d: String): DataFrame = {
    val c = customer(spark, d).select(col("c_custkey"), col("c_name"))
    val o = orders(spark, d).select(col("o_custkey"), col("o_totalprice"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_custkey")).as("n_orders"),
        coalesce(exactSum(col("o_totalprice")), lit(0.0)).as("spend"))
      .orderBy(col("c_custkey"))
  }

  /** q_join_semi — EXISTS: customers holding at least one high-value order
    * (E3). left_semi never materializes right columns — minimal shuffle
    * payload.
    */
  def qJoinSemi(spark: SparkSession, d: String): DataFrame = {
    val c = customer(spark, d)
    val big = orders(spark, d).filter(col("o_totalprice") > 400000).select(col("o_custkey"))
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q_join_anti — NOT EXISTS: customers with no high-value order (E3). */
  def qJoinAnti(spark: SparkSession, d: String): DataFrame = {
    val c = customer(spark, d)
    val big = orders(spark, d).filter(col("o_totalprice") > 450000).select(col("o_custkey"))
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q_join_full — FULL OUTER join completing the join family: customers
    * with no qualifying order keep a NULL order side, qualifying orders
    * with no customer (none in the fixture, but the shape allows it) keep
    * a NULL customer side. Same shuffle equi-join plan as the inner form —
    * outer-ness only changes row emission, not distribution.
    */
  def qJoinFull(spark: SparkSession, d: String): DataFrame = {
    val c = customer(spark, d).select(col("c_custkey"), col("c_name"))
    val big = orders(spark, d).filter(col("o_totalprice") > 450000)
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(big, c("c_custkey") === big("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"))
      .orderBy(col("c_custkey"), col("o_orderkey"))
  }

  /** q_window_rank — row_number / rank / lag partitioned by user (E4): the
    * per-key ordered-state shape sessionization needs. State is bounded per
    * user_id partition, so the plan scales horizontally with keys.
    */
  def qWindowRank(spark: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, d)
      .select(
        col("event_id"),
        col("user_id"),
        row_number().over(byTs).as("rn"),
        lag(col("value"), 1).over(byTs).as("lag_v"))
      .orderBy(col("event_id"))
  }

  /** q_percent_rank — relative-standing window functions: each event's
    * percent_rank ((rank−1)/(N−1)) and cume_dist (rows ≤ current / N) of
    * `value` within its event_type. The normalized-score shape feature
    * pipelines use for rank-based scaling (a distribution-free
    * alternative to z-scores). Ordering is by `value` alone, so SQL TIE
    * semantics (equal values share a rank) are exercised, not bypassed
    * with a unique tie-break — both functions are deterministic under
    * ties by definition. One shuffle on event_type; each output is a
    * single exact int-ratio division, bit-identical across engines. Same
    * bounded-per-partition state story as [[qWindowRank]].
    */
  def qPercentRank(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
    events(spark, d)
      .select(col("event_id"), col("event_type"), col("value"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("event_id"))
  }

  /** q_zscore — per-event-type standardization z = (x − μ)/σ, the
    * feature-scaling pass of every training pipeline, BIT-STABLY: the
    * per-group moments are exact decimal sums ([[qCorr]]'s contract), μ
    * and the population σ = √(n·Sxx − Sx²)/n are then evaluated in one
    * literal IEEE order in both engines, and each row's z is a single
    * subtract-divide against the 5-row BROADCAST stats table — the scan
    * never shuffles; at 100 TB this is one partial-agg pass plus one
    * map-side join. Zero-variance groups yield NULL through the same
    * CASE guard in both engines (never NaN/Infinity).
    */
  def qZscore(spark: SparkSession, d: String): DataFrame = {
    val stats = events(spark, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        exactSum(col("value")).as("sx"),
        exactSum(col("value") * col("value")).as("sxx"))
    val rad = col("n") * col("sxx") - col("sx") * col("sx")
    events(spark, d)
      .join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        when(rad > 0,
          (col("value") - col("sx") / col("n")) / (sqrt(rad) / col("n")))
          .as("z"))
      .orderBy(col("event_id"))
  }

  /** Shards for [[qSkyline]]'s local-skyline phase. */
  val SkylineShards = 8

  /** q_skyline — Pareto frontier over per-user (activity, spend): users
    * not dominated in BOTH event count and exact value sum — the
    * multi-objective "best customers" cut a single ORDER BY cannot
    * express.
    *
    * The plan is the distributed two-phase skyline: dedup to distinct
    * (n, sum) points, compute a LOCAL skyline per shard with one
    * sort-based window pass (a point survives iff its sum exceeds the
    * running max over strictly-preceding points in (n DESC, sum DESC)
    * order — O(n log n), correct because any dominator sorts earlier),
    * then one tiny global pass over the union of local survivors (a
    * global skyline point is a fortiori a local one), and join the
    * winning points back to users. Per-shard windows parallelize the
    * heavy pass; the global window sees only Σ local-skyline sizes —
    * bounded, not corpus-sized. The ORACLE is the O(n²) NOT EXISTS
    * dominance scan, so the gate proves the sort-based rewrite equals
    * the textbook definition exactly.
    */
  def qSkyline(spark: SparkSession, d: String): DataFrame = {
    val perUser = events(spark, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_v"))
    def survivors(points: DataFrame,
                  part: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val w = Window.partitionBy(part: _*)
        .orderBy(col("n").desc, col("sum_v").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      points.select(col("n"), col("sum_v"),
          max(col("sum_v")).over(w).as("mprev"))
        .filter(col("mprev").isNull || col("sum_v") > col("mprev"))
        .drop("mprev")
    }
    val localSky = survivors(
      perUser.select(col("n"), col("sum_v"),
          (col("user_id") % SkylineShards).as("shard"))
        .dropDuplicates("shard", "n", "sum_v"),
      Seq(col("shard")))
    val globalSky = survivors(localSky.dropDuplicates("n", "sum_v"), Seq.empty)
    perUser.join(globalSky, Seq("n", "sum_v"))
      .select(col("user_id"), col("n"), col("sum_v"))
      .orderBy(col("n").desc, col("sum_v").desc, col("user_id"))
  }

  /** q_union / q_intersect / q_except — set ops (E5), distinct semantics
    * matching SQL UNION/INTERSECT/EXCEPT.
    */
  def qUnion(spark: SparkSession, d: String): DataFrame = {
    val e = events(spark, d)
    e.filter(col("event_type") === "purchase").select(col("event_id"))
      .union(e.filter(col("value") > 400).select(col("event_id")))
      .distinct()
      .orderBy(col("event_id"))
  }

  def qIntersect(spark: SparkSession, d: String): DataFrame = {
    val e = events(spark, d)
    e.filter(col("event_type") === "click").select(col("event_id"))
      .intersect(e.filter(col("value") > 200).select(col("event_id")))
      .orderBy(col("event_id"))
  }

  def qExcept(spark: SparkSession, d: String): DataFrame = {
    val e = events(spark, d)
    e.filter(col("event_type") === "click").select(col("event_id"))
      .except(e.filter(col("value") > 200).select(col("event_id")))
      .orderBy(col("event_id"))
  }

  /** q_except_all / q_intersect_all — the MULTISET set operations
    * (EXCEPT ALL / INTERSECT ALL): duplicate-preserving difference and
    * intersection of the part bags sold through even- vs odd-keyed
    * orders. The DISTINCT forms above answer "which parts"; the ALL
    * forms answer "how many copies survive" — the semantics inventory
    * reconciliation and bag-diff audits actually need (SQL: each row
    * appears max(m−n, 0) / min(m, n) times). Catalyst plans both as a
    * single hash aggregate computing per-key counts on each side then
    * replicating — no join, ONE shuffle; the count re-aggregate here
    * keeps the output compact and the row order total.
    */
  def qExceptAll(spark: SparkSession, d: String): DataFrame = {
    val l = lineitem(spark, d)
    l.filter(pmod(col("l_orderkey"), lit(2L)) === 0L).select(col("l_partkey"))
      .exceptAll(l.filter(pmod(col("l_orderkey"), lit(2L)) === 1L)
        .select(col("l_partkey")))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_surplus"))
      .orderBy(col("l_partkey"))
  }

  def qIntersectAll(spark: SparkSession, d: String): DataFrame = {
    val l = lineitem(spark, d)
    l.filter(pmod(col("l_orderkey"), lit(2L)) === 0L).select(col("l_partkey"))
      .intersectAll(l.filter(pmod(col("l_orderkey"), lit(2L)) === 1L)
        .select(col("l_partkey")))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_common"))
      .orderBy(col("l_partkey"))
  }

  /** q_rollup / q_cube — grouping-sets aggregation (E6). Subtotal rows'
    * NULL keys are coalesced to 'ALL' so the presentation order is total
    * without relying on engine-specific NULL ordering.
    */
  private def groupingSets(df: DataFrame, cube: Boolean): DataFrame = {
    val g = if (cube) df.cube(col("l_returnflag"), col("l_linestatus"))
            else df.rollup(col("l_returnflag"), col("l_linestatus"))
    g.agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"),
        exactSum(col("l_quantity")).as("sum_qty"))
      .select(
        col("g_flag"), col("g_status"),
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy(col("g_flag"), col("g_status"), col("flag"), col("status"))
  }

  def qRollup(spark: SparkSession, d: String): DataFrame =
    groupingSets(lineitem(spark, d), cube = false)

  def qCube(spark: SparkSession, d: String): DataFrame =
    groupingSets(lineitem(spark, d), cube = true)

  /** q_grouping_sets — EXPLICIT grouping-set combinations (the general
    * form rollup/cube are shorthands of): per-(flag, status), per-flag,
    * and grand total — but NOT per-status, which neither rollup nor cube
    * can express alone. One Expand + hash agg, like E6.
    */
  def qGroupingSets(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), exactSum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("n"))

  /** q_dedup — exact deduplication (E7) with a deterministic keeper
    * (min event_id per key), expressed as an aggregation so it partial-
    * aggregates map-side; `dropDuplicates` would keep an arbitrary row and
    * break the oracle compare.
    */
  def qDedup(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"))
      .orderBy(col("user_id"), col("event_type"))

  /** q_multimodal_join — text + vector side-by-side (E11): documents joined
    * to their embeddings. Both sides are fact-proportional (1:1 row
    * cardinality), so neither is broadcast — the equi-join is left to
    * shuffle/AQE, and at 100 TB both tables would be bucketed on the id so
    * the join is co-located with no shuffle at all.
    */
  def qMultimodalJoin(spark: SparkSession, d: String): DataFrame = {
    val doc = documents(spark, d)
    val emb = embeddings(spark, d)
    doc.join(emb, doc("doc_id") === emb("vec_id"))
      .select(
        col("doc_id"), col("lang"), col("label"),
        size(col("embedding")).cast("int").as("dim"),
        element_at(col("embedding"), 1).as("f0"),
        col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** q_salted_agg — skew-mitigated two-stage aggregation: rows are salted
    * into 8 sub-keys, partially aggregated per (key, salt), then combined
    * per key. The fixture keys aren't skewed, but the REWRITE is the point:
    * a hot key that would pin one reducer at 100 TB is split across 8
    * parallel partials, and because the partial sums stay decimal until the
    * final combine, the result is bit-identical to the direct aggregation —
    * which is exactly what the oracle checks (its SQL is the UNSALTED
    * query).
    */
  def qSaltedAgg(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    events(spark, d)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
           sum(col("value").cast(DecimalType(38, 6))).as("ps"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
           sum(col("ps")).cast("double").as("sum_v"))
      .orderBy(col("event_type"))
  }

  /** q_features — per-user FEATURE MATRIX assembly, the feature-store
    * shape every training pipeline ships: one row per entity, every
    * engineered feature computed in a SINGLE hash-aggregate pass over the
    * raw events (conditional aggregation, no joins, no per-feature
    * subqueries — the n-subquery formulation reads the table n times and
    * shuffles n times; this reads and shuffles ONCE, map-side partial).
    * Features: activity counts (total + per-type), temporal span
    * (first/last seen as epoch seconds, distinct active days), and value
    * stats (decimal-exact sum, exact mean). At 100 TB the single-pass
    * property is the whole game — and the output is entity-sized, not
    * event-sized.
    */
  def qFeatures(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", true)).as("n_purchase"),
        count(when(col("event_type") === "error", true)).as("n_error"),
        unix_timestamp(min(col("ts"))).as("first_s"),
        unix_timestamp(max(col("ts"))).as("last_s"),
        countDistinct(date_trunc("day", col("ts"))).as("n_days"),
        exactSum(col("value")).as("sum_v"),
        exactAvg(col("value")).as("mean_v"))
      .orderBy(col("user_id"))

  /** Salt fan-out for the skew-mitigated join — the small side is
    * replicated this many times, so it is also the factor the hot key's
    * rows are spread across.
    */
  val JoinSalt = 8

  /** q_salted_join — MANUAL skew-join salting: the big (potentially
    * hot-keyed) side gets a deterministic salt ∈ [0, [[JoinSalt]]), the
    * dimension side is replicated once per salt value via a per-row
    * `sequence` explode, and the join key becomes (key, salt) — a hot
    * key's rows now land on [[JoinSalt]] partitions instead of one.
    * Complements the two other skew surfaces: E22 salts an AGGREGATE,
    * SkewSpec shows AQE splitting a skewed join at runtime; manual
    * salting is the technique for where AQE can't reach — bucketed/
    * pre-partitioned inputs it won't re-split, stateful streaming joins
    * planned once, or engines without runtime re-planning. The join is
    * pinned to a SHUFFLE strategy (`shuffle_hash` hint): broadcasting
    * the dim would bypass the shuffle that salting exists to spread —
    * the demo targets the dim-too-big-to-broadcast regime. Replication
    * cost is |dim| × [[JoinSalt]] rows — per SHUFFLE PARTICIPANT, far
    * cheaper than per-executor broadcast when the dim is large. The
    * result re-aggregates to per-segment totals (decimal-exact), and
    * the oracle computes the UNSALTED join — the green row proves the
    * rewrite is semantics-preserving.
    */
  def qSaltedJoin(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val big = events(spark, d)
      .select(col("user_id"), col("value"),
        pmod(col("event_id"), lit(JoinSalt)).as("salt"))
    val dim = customer(spark, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        explode(sequence(lit(0L), lit(JoinSalt - 1L))).as("salt"))
    big.join(dim.hint("shuffle_hash"),
        big("user_id") === dim("c_custkey") && big("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 6))).cast("double").as("sum_v"))
      .orderBy(col("c_mktsegment"))
  }

  /** q_pivot — wide-format pivot: one row per user, one count column per
    * event type. Pivot values are EXPLICIT (the 5 known types) — at 100 TB
    * an implicit pivot would first run a distinct-values job and risk a
    * column-count explosion; fixed values keep it a single pass.
    */
  def qPivot(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** q_collect_list — per-key array aggregation. `collect_list` alone is
    * arrival-order-nondeterministic, so the result is wrapped in
    * `sort_array` — the only form that is stable under any partitioning
    * (and therefore oracle-checkable). The sorted array is emitted as a
    * comma-joined string because the verification harness's comparator
    * sorts result columns with pandas, which cannot hash array cells —
    * the string is a bijective encoding of the sorted array, so the
    * check is exactly as strong.
    */
  def qCollectList(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("user_id"))
      .agg(concat_ws(",", sort_array(collect_list(col("event_id")))).as("ids"))
      .orderBy(col("user_id"))

  /** q_histogram — fixed-width binning feeding the bar-chart shape
    * (app.py:279-293 at scale): integer bucket per row, then a hash
    * aggregation — one shuffle of |buckets| rows.
    */
  def qHistogram(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(expr("CAST(FLOOR(value / 50) AS INT)").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** q_gapfill — time-series DENSIFICATION: per-type hourly counts with
    * the missing hours between each type's first and last hour filled
    * with explicit zeros. Every dashboard chart needs this (the
    * reference's line chart silently skips empty ticks, app.py:287 —
    * a gap reads as interpolation instead of absence); downstream
    * rolling-average/anomaly jobs need the zero rows to exist. Plan: the
    * grid is `sequence()` + explode from each type's (min, max) hour — a
    * |types| × |hours| Generate off a tiny aggregate, never a cross
    * join — left-joined back to the hourly counts. Both join sides are
    * AGGREGATE-sized (∝ types × hours, never ∝ raw rows), so the plan is
    * a BroadcastHashJoin with the counts side built (`BuildRight` — the
    * grid is the preserved side of the left outer) — at 100 TB the raw
    * data is reduced before anything joins.
    */
  /** The dense (gap-free) hourly series behind [[qGapfill]] and
    * [[qRollingAvg]]: (event_type, h, n) with explicit zero hours.
    */
  private def hourlyDense(spark: SparkSession, d: String): DataFrame = {
    val counts = events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val grid = counts.groupBy(col("event_type"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
    grid.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("n"), lit(0L)).as("n"))
  }

  def qGapfill(spark: SparkSession, d: String): DataFrame =
    hourlyDense(spark, d)
      .select(col("event_type"), tsSeconds(col("h")).as("h_s"), col("n"))
      .orderBy(col("event_type"), col("h_s"))

  /** q_rolling_avg — bounded sliding frame over the DENSE series: 7-hour
    * trailing average of hourly event counts per type (`ROWS BETWEEN 6
    * PRECEDING AND CURRENT ROW`). Composes [[qGapfill]]: on the raw
    * (sparse) series the same frame silently averages over 7 PRESENT
    * rows, not 7 hours — densification is what makes a row-frame a
    * time-frame. The average is an exact integer sum divided once in
    * double, so both engines compute identical bits; one shuffle on
    * event_type serves the grid, the join, and the frame.
    */
  def qRollingAvg(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-6, 0)
    hourlyDense(spark, d)
      .select(col("event_type"), tsSeconds(col("h")).as("h_s"), col("n"),
        (sum(col("n")).over(w).cast("double") /
          count(lit(1)).over(w)).as("avg7h"))
      .orderBy(col("event_type"), col("h_s"))
  }

  /** q_range_window — the time-RANGE window frame: per event, the
    * trailing-hour spend and event count of its type (`RANGE BETWEEN
    * 3600000000 PRECEDING AND CURRENT ROW` over epoch-µs order) — the
    * frame a ROWS window cannot express on UNEVENLY spaced events
    * ([[qRollingAvg]] needed gap-filled densification to fake it on the
    * hourly grid; a range frame reads the raw stream directly — the pair
    * documents when each tool applies). Per-event trailing windows are
    * the serving-side feature shape (rate limits, velocity features,
    * fraud scores) that batch precomputation must match exactly.
    *
    * Determinism: frame membership is defined by the µs VALUES (ties at
    * the same µs are all in-frame in both engines — no peer ambiguity),
    * sums are exact BIGINT cents. One shuffle on event_type serves the
    * sort and the frame.
    */
  def qRangeWindow(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    events(spark, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("c"))
      .select(col("event_type"), col("event_id"), col("us"),
        sum(col("c")).over(w).as("hour_cents"),
        count(lit(1)).over(w).as("n_hour"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** q_locf — last-observation-carried-forward: per user in event order,
    * the value column with nulls replaced by the user's most recent
    * non-null value (`last(..., ignoreNulls)` over an unbounded-preceding
    * ROWS frame) — THE feature-pipeline imputation for sensor/price
    * streams where null means "unchanged", and the IGNORE NULLS window
    * surface [[qGapfill]]'s grid densification doesn't exercise.
    *
    * The fixture stream carries no nulls, so a deterministic dropout
    * mask (event_id ≡ 0 mod 5 reads as missing — the sensor-outage
    * simulation, stated identically in the oracle) supplies the gaps
    * the fill must close. Determinism: the filled value is an IDENTITY
    * COPY of an input double (no arithmetic), so cross-engine bits are
    * trivially equal; frame order is total via the event_id tie-break.
    * One shuffle on user_id.
    */
  def qLocf(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(pmod(col("event_id"), lit(5L)) === 0L, lit(null))
          .otherwise(col("value")).as("value"))
      .select(col("user_id"), col("event_id"), col("value"),
        last(col("value"), ignoreNulls = true).over(w).as("value_ff"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q_calendar_dim — the generated DATE DIMENSION joined back to the
    * fact: a continuous day spine spanning the orders table's range
    * (built IN-PLAN from a 1-row min/max aggregate + `sequence` explode —
    * no driver collect), each day carrying engine-independent derived
    * attributes (day-of-week as days-since-a-known-Monday mod 7, month,
    * quarter, weekend flag), left-joined to daily order revenue so
    * zero-order days appear explicitly — the calendar-dimension
    * generation every warehouse model ships, and the orders-side analog
    * of [[qGapfill]]'s hourly grid.
    *
    * dow is computed, not `dayofweek()`: Spark (1=Sunday) and DuckDB
    * (0=Sunday) disagree on the builtin's origin, while
    * datediff-from-epoch-Monday mod 7 is the same integer in both.
    */
  def qCalendarDim(spark: SparkSession, d: String): DataFrame = {
    val daily = orders(spark, d)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("rev_cents"))
    val spine = orders(spark, d)
      .agg(date_trunc("day", min(col("o_orderdate"))).as("d0"),
        date_trunc("day", max(col("o_orderdate"))).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val dow = pmod(datediff(col("day"), lit("1995-01-02").cast("date")),
      lit(7)).cast("long")
    spine.join(daily, Seq("day"), "left")
      .select(tsSeconds(col("day")).as("day_s"), dow.as("dow"),
        (dow >= 5L).as("is_weekend"),
        month(col("day")).cast("long").as("month"),
        quarter(col("day")).cast("long").as("quarter"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("rev_cents"), lit(0L)).as("rev_cents"))
      .orderBy(col("day_s"))
  }

  /** q_grouping_id — the grouping-metadata surface on a CUBE: revenue by
    * (returnflag, linestatus) with every subtotal level, each row
    * stamped with gid = grouping(flag)·2 + grouping(status) so a
    * consumer can SELECT the level it wants from ONE pass — the
    * mechanism that makes a single cube materialization serve detail,
    * both rollups, and the grand total ([[qCube]] emits the levels;
    * this emits the level DISCRIMINATOR, composed from grouping() so
    * both engines agree bit-for-bit on the bitmask).
    */
  def qGroupingId(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("rev_cents"),
        (grouping(col("l_returnflag")).cast("long") * lit(2L) +
          grouping(col("l_linestatus")).cast("long")).as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** q_percentile_disc — DISCRETE percentiles (nearest-rank: the
    * smallest ELEMENT whose cumulative rank reaches q·n) per event type
    * — the partner of [[qPercentileCont]]'s interpolated form, and the
    * right quantile when the answer must be a value that actually
    * occurred (latency SLOs, price points). Same single-sort shape: one
    * rank window, one conditional-aggregate pick at rn = ceil(q·cnt);
    * the emitted double is an IDENTITY COPY of an input value, so the
    * gate needs no arithmetic pinning at all. The oracle states the
    * identical nearest-rank window (neither engine's quantile builtin
    * is used — their edge conventions differ; the definition IS the
    * query).
    */
  def qPercentileDisc(spark: SparkSession, d: String): DataFrame = {
    val byValue = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val all = Window.partitionBy(col("event_type"))
    val ranked = events(spark, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        row_number().over(byValue).as("rn"),
        count(lit(1)).over(all).as("cnt"))
    def pick(q: Double, tag: String) =
      max(when(col("rn") === ceil(lit(q) * col("cnt")), col("value")))
        .as(s"p$tag")
    ranked.groupBy(col("event_type"))
      .agg(pick(0.5, "50"), pick(0.9, "90"), pick(0.99, "99"))
      .orderBy(col("event_type"))
  }

  /** q_cume_dist — the cumulative-distribution window function: each
    * event's value stamped with its type-relative CDF position
    * (fraction of peers ≤ it, ties sharing one value — the SQL-standard
    * peer semantics [[qPercentRank]]'s (rank−1)/(n−1) does NOT give) —
    * the per-row percentile stamp feature pipelines join back onto raw
    * events. Determinism: cume_dist is a count ratio (peers/total) —
    * one exact-integer division per row, identical bits cross-engine;
    * one shuffle on event_type serves sort + frame.
    */
  def qCumeDist(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    events(spark, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .select(col("event_type"), col("event_id"), col("cents"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** q_rolling_zscore — trailing-window standardization: each event's
    * value z-scored against its type's LAST 100 events (ROWS frame over
    * (ts, event_id) order, current row inclusive) — the rolling-baseline
    * form that adapts to drift where [[qZscore]]'s global moments and
    * [[Streaming.qStreamAnomaly]]'s all-history prefix do not; the
    * standard online feature for rate/fraud models. 30-event warmup and
    * a zero-variance guard decided in EXACT integers (n·Σc² > (Σc)² —
    * no double in either decision), then one pinned double chain,
    * mirrored verbatim. One shuffle on event_type serves sort + frame;
    * window state is three running integers.
    */
  def qRollingZscore(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(-99, 0)
    val nD = col("n").cast("double")
    events(spark, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("c"))
      .select(col("event_type"), col("event_id"), col("c"),
        count(lit(1)).over(w).as("n"),
        sum(col("c")).over(w).as("s"),
        sum(col("c") * col("c")).over(w).as("ss"))
      .select(col("event_type"), col("event_id"), col("c"), col("n"),
        when(col("n") >= 30L && col("n") * col("ss") > col("s") * col("s"),
          (col("c").cast("double") - col("s").cast("double") / nD) /
            sqrt((col("ss").cast("double") -
              col("s").cast("double") * col("s").cast("double") / nD) / nD))
          .as("z"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** q_anomaly — σ-threshold outlier detection over the DENSE hourly
    * series: hours whose count deviates from their type's mean by more
    * than 3 population standard deviations. Composes [[hourlyDense]] —
    * on the sparse series the zero hours (often exactly the anomaly)
    * would be invisible AND would bias the mean upward. Determinism at
    * the oracle gate: the |z| > 3 test is evaluated in EXACT integer
    * arithmetic — (n·cnt − sx)² > 9·(cnt·sxx − sx²) with integer sums —
    * so which rows are flagged is engine-independent, and only the
    * surviving rows compute the double z via the same literal
    * expression in both engines (one int→double cast each side, one
    * sqrt, one division — all correctly rounded, hence bit-equal).
    * Plan: the stats window (whole-partition frame, no ORDER BY) reuses
    * the event_type partitioning the dense series already produced — no
    * extra shuffle; window state per group is one (sx, sxx, cnt)
    * triple over an aggregate-sized input. Overflow: cnt·sxx fits int64
    * through ~10⁵ hours × 10⁶ events/hour per type; past that promote
    * the moment sums to DECIMAL — noted, nowhere near fixture scale.
    */
  def qAnomaly(spark: SparkSession, d: String): DataFrame = {
    val w   = Window.partitionBy(col("event_type"))
    val num = col("n") * col("cnt") - col("sx")
    val rad = col("cnt") * col("sxx") - col("sx") * col("sx")
    hourlyDense(spark, d)
      .select(col("event_type"), col("h"), col("n"),
        sum(col("n")).over(w).as("sx"),
        sum(col("n") * col("n")).over(w).as("sxx"),
        count(lit(1)).over(w).as("cnt"))
      .filter(num * num > lit(9L) * rad)
      .select(col("event_type"), tsSeconds(col("h")).as("h_s"), col("n"),
        (num.cast("double") / sqrt(rad.cast("double"))).as("z"))
      .orderBy(col("event_type"), col("h_s"))
  }

  /** q_retention — cohort retention matrix: users cohorted by first
    * active day, count of cohort members active at each later day
    * offset. The textbook formulation joins the raw events back to a
    * per-user first-day aggregate — TWO full shuffles of the raw table.
    * Here the single per-user pass folds both facts at once — first day
    * and the distinct active-day set (`collect_set`, bounded by the
    * CALENDAR, not the event count, and partially aggregated map-side) —
    * so the raw events shuffle ONCE on user_id and everything downstream
    * is aggregate-sized: explode the day set, integer day offset, and a
    * second aggregate over ∝ users × active-days rows. Day offsets via
    * `datediff` on midnight-truncated days — exact integers both
    * engines.
    */
  def qRetention(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"), collect_set(col("day")).as("days"))
      .select(col("cohort"), explode(col("days")).as("day"))
      .groupBy(tsSeconds(col("cohort")).as("cohort_s"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_s"), col("day_offset"))

  /** q_cum_users — daily growth accounting: per day, distinct active
    * users (DAU), NEW users (first ever touch), and the cumulative
    * distinct user count to date. The naive cumulative-distinct is
    * O(events × days) — re-deduplicating the whole prefix per day.
    * The first-touch identity (cumulative distinct == running sum of
    * first-touch counts) makes it two aggregates: ONE pass dedups to the
    * user-day relation, per-user min-day gives first touches, and the
    * cumulative sum is a window over the DAY SPINE — domain-sized, never
    * corpus-sized (the q_ks_test stance), so the unpartitioned window is
    * legal at 100 TB. Every new-user day is by definition an active day,
    * so the left join onto DAU days drops nothing.
    *
    * Determinism: everything is exact BIGINT counts on exact
    * midnight-truncated days; day rendered via the tsSeconds contract.
    */
  def qCumUsers(spark: SparkSession, d: String): DataFrame = {
    val ud = events(spark, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val news = ud.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dau.join(news, Seq("day"), "left")
      .select(col("day"), col("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .select(tsSeconds(col("day")).as("day_s"), col("dau"),
        col("new_users"), col("cum_users"))
      .orderBy(col("day_s"))
  }

  /** q_streaks — gaps-and-islands: per user, the activity-run structure
    * of their calendar (number of maximal consecutive-day runs, total
    * active days, longest streak) — the classic engagement feature, and
    * THE canonical SQL pattern for "consecutive" questions (the island
    * key day − row_number is constant exactly within a gap-free run).
    *
    * Plan: the log dedups to the user-day relation first (map-side
    * partial, ≤ |users|·|days| rows at any volume); the island window
    * partitions by user — parallel across users, sort amortized by the
    * grouping shuffle — and both downstream aggregates reuse that
    * user-hash partitioning (no second Exchange).
    *
    * Determinism: days are exact epoch-day BIGINTs (unix_micros DIV
    * 86400000000 — the q_linreg integer-DIV contract); every output is
    * an exact count.
    */
  def qStreaks(spark: SparkSession, d: String): DataFrame = {
    val ud = events(spark, d)
      .select(col("user_id"),
        expr("unix_micros(date_trunc('day', ts)) DIV 86400000000").as("dy"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("dy"))
    ud.withColumn("grp", col("dy") - row_number().over(w))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), sum(col("len")).as("active_days"),
        max(col("len")).as("longest_streak"))
      .orderBy(col("user_id"))
  }

  /** q_wau — rolling 7-day active users per day, plus the DAU/WAU
    * stickiness ratio — the engagement dashboard's second row, and the
    * canonical SLIDING-window distinct count ([[qCumUsers]] is the
    * unbounded cumulative case; a sliding distinct has no first-touch
    * shortcut because users leave the window again).
    *
    * Plan: the log dedups once to the user-day relation; each user-day
    * then contributes to exactly the 7 window ends it can serve
    * (sequence + explode — a BOUNDED ×7 fan-out, the window length,
    * never the data), deduped and counted per day. Everything after the
    * first pass is ≤ 7·|users|·|days| rows — calendar-bounded at any
    * volume. Phantom trailing days (windows ending past the last active
    * day) are dropped by joining back to the observed day spine.
    *
    * Determinism: days are exact epoch-day BIGINTs; counts exact; the
    * stickiness ratio is the single pinned double.
    */
  def qWau(spark: SparkSession, d: String): DataFrame = {
    val ud = events(spark, d)
      .select(col("user_id"),
        expr("unix_micros(date_trunc('day', ts)) DIV 86400000000").as("dy"))
      .distinct()
    val days = ud.select(col("dy")).distinct()
    val dau = ud.groupBy(col("dy")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("dy"), col("dy") + lit(6L))).as("td"))
      .distinct()
      .join(days.select(col("dy").as("td")), "td")
      .groupBy(col("td")).agg(count(lit(1)).as("wau"))
    dau.join(wau, col("dy") === col("td"))
      .select(
        tsSeconds(timestamp_micros(col("dy") * lit(86400000000L))).as("day_s"),
        col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
      .orderBy(col("day_s"))
  }

  /** q_mad — robust dispersion + outlier counts per type: the median
    * absolute deviation (MAD), its Gaussian-consistent σ estimate
    * (1.4826·MAD), and how many rows sit beyond the 3σ̂ fence. The
    * ROBUST twin of [[qAnomaly]]'s moment-based z-test: one glitch row
    * of 10⁹ drags a mean/σ fence (masking), but moves a median fence by
    * at most one rank — which is why robust fences are what production
    * data-quality monitors actually deploy.
    *
    * Plan: BOTH medians are rank-selected elements ([[qMedian]]'s
    * contract — selection, never interpolation), each a window over the
    * event_type partitioning; the per-type medians join back broadcast
    * (|types| rows). Two Exchanges total (the dev relation re-windows
    * after the broadcast join changes nothing about partitioning — it
    * reuses the type hash), all work parallel across types.
    *
    * Determinism: medians are exact element selections (ties by
    * event_id); deviations |x − med| are one IEEE op; the fence test
    * dev > (3.0·1.4826)·mad is a pinned literal chain, strict in both
    * engines.
    */
  def qMad(spark: SparkSession, d: String): DataFrame = {
    val byVal = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val all = Window.partitionBy(col("event_type"))
    val med = events(spark, d)
      .select(col("event_type"), col("value"),
        row_number().over(byVal).as("rn"), count(lit(1)).over(all).as("cnt"))
      .filter(col("rn") === expr("(cnt + 1) DIV 2"))
      .select(col("event_type"), col("value").as("med"))
    val dev = events(spark, d)
      .join(broadcast(med), "event_type")
      .select(col("event_type"), col("event_id"),
        abs(col("value") - col("med")).as("dev"), col("med"))
    val byDev = Window.partitionBy(col("event_type"))
      .orderBy(col("dev"), col("event_id"))
    val mad = dev
      .select(col("event_type"), col("dev"),
        row_number().over(byDev).as("rn"), count(lit(1)).over(all).as("cnt"))
      .filter(col("rn") === expr("(cnt + 1) DIV 2"))
      .select(col("event_type"), col("dev").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("median_v"), first(col("mad")).as("mad"),
        sum(when(col("dev") > (lit(3.0) * lit(1.4826)) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"), col("median_v"), col("mad"),
        (lit(1.4826) * col("mad")).as("sigma_hat"), col("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** q_twap — time-weighted average of `value` per user: each
    * observation holds until the user's next event (a step function) and
    * is weighted by that duration — the TWAP/TWA statistic finance and
    * IoT pipelines use wherever samples are IRREGULAR (a plain mean
    * over-weights bursts; q_rolling_avg's row frames can't express
    * duration weighting).
    *
    * Plan: ONE user-hash window (lead over (ts, event_id)) to pair each
    * event with its successor, then one aggregate on the SAME
    * partitioning — no second Exchange; parallel across users at any
    * scale.
    *
    * Determinism: durations are exact integer µs truncated to ms
    * (integer DIV, identical both engines); values enter as
    * floor(v·10⁶ + 0.5) micro-units (the fixed-point contract); each
    * weighted term is an exact BIGINT product (width: ≤ 5.6·10⁸ µv ×
    * span-ms — and the per-user SUM TELESCOPES to value_max·span, not
    * rows×span, so the fixture budget is ~1.5·10¹⁸ < 2⁶³ with the same
    * headroom at any event rate; the budget binds on SPAN, re-scale
    * beyond ~3 years per user). TWAP is ONE pinned double division at
    * the end.
    */
  def qTwap(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    events(spark, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("nxt", lead(col("us"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("user_id"),
        expr("(nxt - us) DIV 1000").as("dur_ms"),
        floor(col("value") * lit(1000000.0) + lit(0.5)).as("v_uv"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_holds"),
        sum(col("dur_ms")).as("span_ms"),
        sum(col("v_uv") * col("dur_ms")).as("swd"))
      .select(col("user_id"), col("n_holds"), col("span_ms"),
        (col("swd").cast("double") /
          (lit(1000000.0) * col("span_ms").cast("double"))).as("twap"))
      .orderBy(col("user_id"))
  }

  /** q_weighted_median — weighted lower median of unit price by QUANTITY
    * per return flag: the smallest price at which cumulative quantity
    * reaches half the total — "the price at which half the UNITS ship",
    * which an unweighted median (half the LINES) misstates whenever
    * quantity and price correlate. The selection form of weighted
    * quantiles: like [[qMedian]], an element is SELECTED, never
    * interpolated, so the gate is exact.
    *
    * Plan: one flag-hash window carries BOTH the running quantity sum
    * and the partition total (same Exchange, two frames); the selection
    * filter 2·cum ≥ tot keeps the suffix and ONE min-struct aggregate
    * picks its first row — no second shuffle, no self-join.
    *
    * Determinism: quantities are integral-valued doubles cast to exact
    * BIGINT; the cumulative frame is ordered by the total
    * (price, orderkey, linenumber) key; the ≥-half test is exact
    * integer arithmetic (2·cum, no division); min-of-struct aligns with
    * the frame order.
    */
  def qWeightedMedian(spark: SparkSession, d: String): DataFrame = {
    val byPrice = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val all = Window.partitionBy(col("l_returnflag"))
    lineitem(spark, d)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("w"))
      .withColumn("cum", sum(col("w")).over(
        byPrice.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("w")).over(all))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(struct(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))).as("sel"),
        first(col("tot")).as("total_qty"))
      .select(col("l_returnflag"), col("sel.l_extendedprice").as("wmedian_price"),
        col("total_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Session gap for [[qIntervalJoin]]'s per-user intervals (30 min). */
  val IvSessionGapUs = 1800000000L
  /** Burst gap for its per-type intervals (5 min). */
  val IvBurstGapUs = 300000000L
  /** Bucketization cell (1 h) — the fan-out knob: each interval lands in
    * (length / cell + 1) cells.
    */
  val IvCellUs = 3600000000L

  /** Gap-based closed intervals per key: maximal runs where consecutive
    * event gaps stay ≤ gapUs (lag + cumulative-flag sessionization — the
    * batch twin of session_window, exposed because [[qIntervalJoin]]
    * needs the intervals themselves, not windowed aggregates).
    */
  private def gapIntervals(df: DataFrame, key: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("us"), col("event_id"))
    df.select(col(key), col("us"), col("event_id"))
      .withColumn("new",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("sid"))
      .agg(min(col("us")).as("s"), max(col("us")).as("e"))
  }

  /** q_interval_join — interval OVERLAP join with NO equi-key: per-user
    * activity sessions (30-min gap) × per-type event bursts (5-min gap),
    * paired wherever the time intervals intersect — the genomics /
    * flight-schedule / "which incidents overlapped which deploys" join
    * that q_range_join's point-in-interval form can't express.
    *
    * Plan — the BINNING pattern, the standard scalable form: each
    * interval explodes into the 1-hour cells it spans (fan-out bounded
    * by interval LENGTH / [[IvCellUs]], a data property, not a corpus
    * size), candidates come from the cell EQUI-join (never the
    * quadratic theta join a naive `s.ss <= b.be AND b.bs <= s.se` plan
    * degrades to), multi-cell duplicates collapse in an all-BIGINT
    * DISTINCT, and the exact overlap predicate verifies candidates
    * only. The ORACLE runs the naive theta join — same result, the
    * plans differ, which is exactly the point (PlanSpec pins the
    * no-nested-loop shape). Per-type totals: pair count and exact
    * integer overlap mass.
    */
  def qIntervalJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val sessions = gapIntervals(ev, "user_id", IvSessionGapUs)
      .select(col("user_id"), col("s").as("ss"), col("e").as("se"))
    val bursts = gapIntervals(ev, "event_type", IvBurstGapUs)
      .select(col("event_type"), col("s").as("bs"), col("e").as("be"))
    val sCells = sessions.select(col("user_id"), col("ss"), col("se"),
      explode(sequence(expr(s"ss DIV $IvCellUs"), expr(s"se DIV $IvCellUs")))
        .as("cell"))
    val bCells = bursts.select(col("event_type"), col("bs"), col("be"),
      explode(sequence(expr(s"bs DIV $IvCellUs"), expr(s"be DIV $IvCellUs")))
        .as("cell"))
    sCells.join(bCells, "cell")
      .select(col("user_id"), col("ss"), col("se"),
        col("event_type"), col("bs"), col("be"))
      .distinct()
      .filter(col("ss") <= col("be") && col("bs") <= col("se"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("se"), col("be")) - greatest(col("ss"), col("bs")))
          .as("overlap_us"))
      .orderBy(col("event_type"))
  }

  /** q_rownum_global — GLOBAL dense row numbering in event-time order,
    * WITHOUT the single-partition window: `row_number() OVER (ORDER BY
    * …)` with no PARTITION BY collapses the whole table through one
    * task (Spark even warns) — the classic scale trap. The scalable
    * form is the two-pass: range-partition + sort by the total key,
    * count per partition, offset each partition by the prefix sum —
    * which is exactly RDD `zipWithIndex` (pass 1 counts, pass 2 adds
    * offsets), the one genuinely-RDD escape hatch in the registry
    * (the DataFrame API cannot express "my partition's global offset";
    * SURVEY §2's (d)-tier criterion).
    *
    * Determinism: indices depend only on the TOTAL order (ts µs,
    * event_id — unique), not on where range boundaries land: any range
    * partitioning yields the same (row, index) pairs, so the
    * sampling-based partitioner underneath orderBy cannot perturb the
    * result. Gate: the oracle's single-threaded
    * `row_number() OVER (ORDER BY …)` must reproduce the distributed
    * two-pass exactly.
    */
  def qRownumGlobal(spark: SparkSession, d: String): DataFrame = {
    val session = spark
    import session.implicits._
    events(spark, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy(col("us"), col("event_id"))
      .as[(Long, Long)]
      .rdd.zipWithIndex()
      .map { case ((eventId, _), idx) => (eventId, idx + 1L) }
      .toDF("event_id", "rn")
      .orderBy(col("event_id"))
  }

  /** q_nearest_event — NEAREST-neighbor time join within a key: for
    * every purchase, the user's closest `error` event in EITHER
    * direction (|Δt|, ties → the earlier one) — sensor alignment /
    * "was there an error near this purchase" root-causing.
    * [[qAsofJoin]] is the backward half; nearest needs BOTH, and the
    * naive form is a per-row scan of the other stream.
    *
    * Plan: the single-shuffle union trick extended to two frames — tag
    * both event sets, union, ONE user-hash window, and read the
    * backward neighbor with `last_value(ignoreNulls) OVER (… PRECEDING)`
    * and the forward one with `first_value(ignoreNulls) OVER
    * (… FOLLOWING)` — two frames on the SAME partitioning and sort, one
    * Exchange, no join at all. The pick-closer is a per-row pinned
    * comparison on exact µs integers.
    *
    * Determinism: the window sort key (us, tag, event_id) is total (tag
    * orders an error before a co-timestamped purchase, making the
    * backward frame's "≤" inclusive in BOTH engines); Δt and the
    * direction flag are exact integer arithmetic; rows with no error on
    * either side surface NULLs.
    */
  /** q_geo_distance — great-circle (haversine) proximity ranking: the 10
    * events nearest to the reference's own anchor point (London,
    * 51.5072 / −0.1276 — its open_meteo constant, app.py:43; the
    * lat/lon surface itself is the ISS feed, app.py:179-180). The
    * fixture has no coordinates, so a deterministic position is
    * synthesized per event from integer columns (construction shared
    * verbatim with the oracle — the gate exercises the DISTANCE MATH,
    * same contract as q_url_parse's synthesized URLs).
    *
    * Float-determinism is the interesting part, and trig changes the
    * rules: JVM `Math.sin/cos/asin` are NOT bit-identical to libm
    * (measured on this box: sin/cos diverge by 1 ulp on ~0.2% of inputs,
    * asin on ~5%), so unlike every ln/sqrt path in the engine the raw
    * double can differ between Spark and DuckDB. Three defenses: (a)
    * degrees→radians through one shared LITERAL (0.017453292519943295 —
    * `radians()` parenthesizes differently per engine and would add
    * avoidable ulps); (b) the emitted distance is floor(meters) BIGINT —
    * a 1-2 ulp trig divergence moves a ~10⁶ m value by ~1e-9 m, so the
    * floor flips only within ~2e-9 m of an integer boundary (P ≈ 1e-9
    * per row; the gate verifies the fixture has no straddler, and the
    * spec's margin tripwire asserts every emitted value sits ≥ 1e-6 m
    * from its boundary); (c) ordering is on the quantized BIGINT with an
    * event_id tie-break — total and ulp-immune.
    *
    * Plan: per-row expressions + one global top-10 —
    * TakeOrderedAndProject, no sort shuffle; at 100 TB this is the
    * classic "nearest stations" scan, and the production refinement
    * (geohash/S2 cell prefilter, exactly q_interval_join's binning
    * stance on the sphere) composes in front of the same formula.
    */
  def qGeoDistance(spark: SparkSession, d: String): DataFrame = {
    val degToRad = lit(0.017453292519943295)
    // event_id is reduced mod m BEFORE the multiply: (e*k) mod m ==
    // ((e mod m)*k) mod m, so values are identical, but the product is
    // bounded by m*k (~4.5e15) instead of overflowing BIGINT (ANSI throw)
    // once event_id reaches ~3.47e9 — a real id at 100 TB.
    val lat = (pmod(pmod(col("event_id"), lit(1700000L)) * lit(2654435761L),
      lit(1700000L))
      .cast("double") / lit(10000.0)) - lit(85.0)
    val lon = (pmod(pmod(col("event_id"), lit(3600000L)) * lit(40503L) +
      col("user_id"), lit(3600000L))
      .cast("double") / lit(10000.0)) - lit(180.0)
    val (lat0, lon0) = (lit(51.5072), lit(-0.1276))
    val phi1 = lat0 * degToRad
    val phi2 = lat * degToRad
    val dphiH = (lat - lat0) * degToRad / lit(2.0)
    val dlamH = (lon - lon0) * degToRad / lit(2.0)
    val a = sin(dphiH) * sin(dphiH) +
      cos(phi1) * cos(phi2) * (sin(dlamH) * sin(dlamH))
    // near-antipodal rounding can push a to 1+ulp: asin(sqrt) would go NaN
    // here but ERROR in DuckDB — clamp on both engines.
    val distM = lit(2.0) * lit(6371000.0) * asin(sqrt(least(a, lit(1.0))))
    events(spark, d)
      .select(col("event_id"), col("event_type"),
        floor(distM).cast("long").as("dist_m"))
      .orderBy(col("dist_m"), col("event_id"))
      .limit(10)
  }

  /** q_geo_join — cell-bucketed nearest-anchor spatial join: the
    * geohash/S2 prefilter [[qGeoDistance]]'s scaladoc names as the
    * 100 TB refinement, actually implemented. 1000 synthetic anchor
    * points (stations/POIs) are bucketed into 1° lat/lon cells; each
    * event probes the 3×3 cell ring around its own cell (bounded
    * 9-way in-plan explode — [[qRangeJoin]]'s binning stance on the
    * sphere), candidates meet through a plain EQUI-join on the cell key,
    * and min_by picks the nearest candidate. Output: the 10 closest
    * (event, anchor) assignments. The contract is the standard
    * bounded-radius one — "nearest anchor within one cell ring" (≥ 1°
    * ≈ 111 km at the equator), the semantics a production spatial join
    * ships because an unbounded nearest degenerates to all-pairs.
    *
    * Plan: anchors are ~10³ rows → broadcast; events explode ×9 then
    * equi-join the broadcast cell index — zero shuffle of the event
    * side, aggregate state is one (dist, anchor) pair per event. At
    * 100 TB with 10⁸ anchors the same plan shuffles on the cell key
    * instead of broadcasting — candidate work stays Σ cell² like every
    * banded join in the engine, never all-pairs.
    *
    * Determinism: longitude cells wrap mod 360 on BOTH sides; distances
    * ride [[qGeoDistance]]'s quantized floor(meters) BIGINT contract
    * (same ulp-margin defense, spec-tripwired), and min_by ties break on
    * (dist_m, anchor_id) — total everywhere.
    */
  def qGeoJoin(spark: SparkSession, d: String): DataFrame = {
    val degToRad = lit(0.017453292519943295)
    def haversineM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
      val phi1 = lat1 * degToRad
      val phi2 = lat2 * degToRad
      val dphiH = (lat2 - lat1) * degToRad / lit(2.0)
      val dlamH = (lon2 - lon1) * degToRad / lit(2.0)
      val a = sin(dphiH) * sin(dphiH) +
        cos(phi1) * cos(phi2) * (sin(dlamH) * sin(dlamH))
      floor(lit(2.0) * lit(6371000.0) * asin(sqrt(least(a, lit(1.0)))))
        .cast("long")
    }
    val anchors = spark.range(1000).toDF("anchor_id")
      .select(col("anchor_id"),
        (pmod(col("anchor_id") * lit(97L), lit(1700L)).cast("double") /
          lit(10.0) - lit(85.0) + lit(0.05)).as("alat"),
        (pmod(col("anchor_id") * lit(131L), lit(3600L)).cast("double") /
          lit(10.0) - lit(180.0) + lit(0.05)).as("alon"))
      .select(col("anchor_id"), col("alat"), col("alon"),
        floor(col("alat")).cast("long").as("cr"),
        floor(col("alon")).cast("long").as("cc"))
    // event_id is reduced mod m BEFORE the multiply: (e*k) mod m ==
    // ((e mod m)*k) mod m, so values are identical, but the product is
    // bounded by m*k (~4.5e15) instead of overflowing BIGINT (ANSI throw)
    // once event_id reaches ~3.47e9 — a real id at 100 TB.
    val lat = (pmod(pmod(col("event_id"), lit(1700000L)) * lit(2654435761L),
      lit(1700000L))
      .cast("double") / lit(10000.0)) - lit(85.0)
    val lon = (pmod(pmod(col("event_id"), lit(3600000L)) * lit(40503L) +
      col("user_id"), lit(3600000L))
      .cast("double") / lit(10000.0)) - lit(180.0)
    val probes = events(spark, d)
      .select(col("event_id"), lat.as("lat"), lon.as("lon"))
      .select(col("event_id"), col("lat"), col("lon"),
        explode(expr("sequence(-1L, 1L)")).as("dr"))
      .select(col("event_id"), col("lat"), col("lon"),
        (floor(col("lat")).cast("long") + col("dr")).as("cr"),
        explode(expr("sequence(-1L, 1L)")).as("dc"))
      // Longitude wraps: cell column re-centered into [-180, 180).
      .select(col("event_id"), col("lat"), col("lon"), col("cr"),
        (pmod(floor(col("lon")).cast("long") + col("dc") + lit(180L),
          lit(360L)) - lit(180L)).as("cc"))
    probes
      .join(broadcast(anchors), Seq("cr", "cc"))
      .select(col("event_id"),
        struct(haversineM(col("lat"), col("lon"), col("alat"), col("alon"))
            .as("dist_m"),
          col("anchor_id")).as("cand"))
      .groupBy(col("event_id"))
      .agg(min(col("cand")).as("best"))
      .select(col("event_id"), col("best.anchor_id").as("anchor_id"),
        col("best.dist_m").as("dist_m"))
      .orderBy(col("dist_m"), col("event_id"))
      .limit(10)
  }

  def qNearestEvent(spark: SparkSession, d: String): DataFrame = {
    val tagged = events(spark, d)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        (col("event_type") === "error").cast("int").as("is_err"))
      .select(col("user_id"), col("event_id"), col("us"), col("is_err"),
        when(col("is_err") === 1, col("us")).as("err_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("is_err").desc, col("event_id"))
    val back = last(col("err_us"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    val fwd = first(col("err_us"), ignoreNulls = true)
      .over(w.rowsBetween(0, Window.unboundedFollowing))
    tagged
      .withColumn("b", back).withColumn("f", fwd)
      .filter(col("is_err") === 0)
      .select(col("user_id"), col("event_id"), col("us"),
        when(col("b").isNull && col("f").isNull, lit(null))
          .when(col("f").isNull || (col("b").isNotNull &&
            (col("us") - col("b")) <= (col("f") - col("us"))),
            col("us") - col("b"))
          .otherwise(col("f") - col("us")).as("dt_us"),
        when(col("b").isNull && col("f").isNull, lit(null))
          .when(col("f").isNull || (col("b").isNotNull &&
            (col("us") - col("b")) <= (col("f") - col("us"))),
            lit("before"))
          .otherwise(lit("after")).as("direction"))
      .orderBy(col("event_id"))
  }

  /** q_cusum — changepoint LOCALIZATION on the hourly count series: the
    * hour t maximizing |S_t|, S_t = Σ_{i≤t}(x_i − x̄) (the CUSUM
    * statistic) — where [[graft.operators.Mining.qKsTest]]/
    * [[graft.operators.Mining.qPsi]] DETECT that a distribution moved,
    * CUSUM points at WHEN the level shifted. Output per type: the
    * argmax hour, its index, and the normalized max deviation.
    *
    * Plan: the log collapses to the calendar-bounded hourly histogram
    * first (the q_autocorr stance); the cumulative/total/ranking frames
    * all ride ONE event_type hash partition.
    *
    * Determinism: the argmax is decided on EXACT integers — n·S_t =
    * n·cum_t − t·Σx needs no division (width ≤ |hours|²·max-count ≪
    * 2⁶³) — with ties broken by earliest hour; only the reported s_max
    * divides, once, in a pinned double.
    */
  def qCusum(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val all = Window.partitionBy(col("event_type"))
    val scored = events(spark, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .withColumn("cum", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("sx", sum(col("x")).over(all))
      .withColumn("absd", abs(col("n") * col("cum") - col("t") * col("sx")))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("absd").desc, col("h"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), tsSeconds(col("h")).as("cp_hour"),
        col("t").as("cp_index"), col("n").as("n_hours"),
        (col("absd").cast("double") / col("n").cast("double")).as("s_max"))
      .orderBy(col("event_type"))
  }

  /** q_wow — week-over-week growth of the daily count per type: each
    * day paired with the SAME WEEKDAY one week earlier (7-day lag kills
    * the weekly seasonality a 1-day lag conflates with trend) — the
    * dashboard growth-rate row. A ROW-offset lag silently lies on
    * sparse series (lag(7 rows) ≠ 7 days if days are missing), so the
    * pairing is an exact calendar EQUI-join of the daily histogram with
    * its +7-day shift — the q_autocorr treatment; missing comparisons
    * surface NULL, never a wrong pair.
    *
    * Plan: one calendar-bounded daily aggregate, self-equi-joined —
    * |types|·|days| rows at any volume. Growth is one pinned double
    * division on exact counts.
    */
  def qWow(spark: SparkSession, d: String): DataFrame = {
    val daily = events(spark, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    daily
      .join(daily.select(col("event_type"),
          (col("day") + expr("INTERVAL 7 DAYS")).as("day"),
          col("x").as("x_prev")),
        Seq("event_type", "day"), "left")
      .select(col("event_type"), tsSeconds(col("day")).as("day_s"),
        col("x"), col("x_prev"),
        ((col("x") - col("x_prev")).cast("double") /
          col("x_prev").cast("double")).as("wow_growth"))
      .orderBy(col("event_type"), col("day_s"))
  }

  /** q_listagg — deterministic string aggregation: each user's distinct
    * event types as ONE ordered, comma-joined string — the
    * LISTAGG/STRING_AGG reporting surface (export rows, audit columns,
    * feature crosses). Bare LISTAGG is arrival-order nondeterministic —
    * same trap as built-in mode() ([[qMode]]) — so the gateable form
    * pins BOTH an explicit sort and in-row dedup:
    * array_join(array_sort(collect_set(…))). collect_set state is
    * bounded by the value DOMAIN (|types|), not the group's row count —
    * safe where an unbounded collect_list would OOM a hot key.
    */
  def qListagg(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("user_id"))
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
          .as("types_csv"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("user_id"))

  /** q_null_safe_join — NULL-safe equality join (`<=>` / SQL's
    * IS NOT DISTINCT FROM): the semantic corner every pipeline with
    * nullable keys hits — under plain `=`, NULL keys match NOTHING and
    * silently vanish from an inner join; under null-safe equality they
    * match each other, so a dimension can carry an explicit NULL-keyed
    * "unmapped" row that catches them. Here `error` events are nulled
    * into exactly that bucket: a plain-= plan would report zero
    * incidents and no error at all — the worst kind of wrong.
    *
    * Plan: the dimension is a 5-row literal relation, broadcast; `<=>`
    * is a legal hash-join key (null-safe equality hashes NULL as a
    * value), so this stays a broadcast HASH join — no nested-loop
    * penalty for the null semantics. Exact counts; ordering total.
    */
  def qNullSafeJoin(spark: SparkSession, d: String): DataFrame = {
    val session = spark
    import session.implicits._
    val mapping = Seq(
      (Option("view"), "browse"), (Option("click"), "browse"),
      (Option("purchase"), "commerce"), (Option("signup"), "account"),
      (Option.empty[String], "incident")).toDF("mk", "category")
    events(spark, d)
      .select(expr("nullif(event_type, 'error')").as("k"))
      .join(broadcast(mapping), col("k") <=> col("mk"))
      .groupBy(col("category")).agg(count(lit(1)).as("n"))
      .orderBy(col("category"))
  }

  /** q_seasonality — two-way additive decomposition of the traffic
    * matrix: per (weekday, hour-of-day) cell, total events split into
    * grand mean + weekday effect + hour effect + residual (the ANOVA /
    * "classic seasonal profile" view) — how a capacity planner separates
    * "Mondays are busy" from "9am is busy" from "Monday 9am is SPECIAL
    * (residual)". Complements [[qCusum]]/[[graft.operators.Mining
    * .qLinreg]]: those find level shifts and trend, this isolates the
    * periodic structure.
    *
    * Plan: the log collapses to the 7×24 cell matrix in ONE map-side-
    * partial agg; margins are re-aggregations OVER that constant-sized
    * matrix (the q_mutual_info stance), joined back broadcast.
    *
    * Determinism: all counts exact BIGINT; each mean is ONE division of
    * exact integers; the residual is one pinned chain
    * (cell − dow̄ − hod̄ + grand) mirrored verbatim in the oracle.
    */
  def qSeasonality(spark: SparkSession, d: String): DataFrame = {
    val cells = events(spark, d)
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("c"))
    val dowM = cells.groupBy(col("dow"))
      .agg(sum(col("c")).as("sd"), count(lit(1)).as("nd"))
    val hodM = cells.groupBy(col("hod"))
      .agg(sum(col("c")).as("sh"), count(lit(1)).as("nh"))
    val grand = cells.agg(sum(col("c")).as("sg"), count(lit(1)).as("ng"))
    val dMean = col("sd").cast("double") / col("nd").cast("double")
    val hMean = col("sh").cast("double") / col("nh").cast("double")
    val gMean = col("sg").cast("double") / col("ng").cast("double")
    cells
      .join(broadcast(dowM), "dow")
      .join(broadcast(hodM), "hod")
      .crossJoin(broadcast(grand))
      .select(col("dow"), col("hod"), col("c"),
        dMean.as("dow_mean"), hMean.as("hod_mean"), gMean.as("grand_mean"),
        (col("c").cast("double") - dMean - hMean + gMean).as("residual"))
      .orderBy(col("dow"), col("hod"))
  }

  /** q_time_to_convert — the product metric behind every activation
    * funnel: per user, the delay from FIRST signup to the FIRST
    * purchase after it, summarized per signup-weekday cohort as
    * (n converted, lower-median delay, max delay). Composes the
    * engine's contracts — first-touch ([[qCumUsers]]), forward-asof
    * pairing ([[qNearestEvent]]'s frame trick degenerates to a min over
    * a filtered join here), selection median ([[qMedian]]).
    *
    * Plan: two per-user aggregates (first signup, first qualifying
    * purchase via min over a filtered equi-join on user — never a
    * time-range theta join), then a |users|-row relation carries the
    * cohort split and the rank-selected median. Delays are exact µs.
    */
  def qTimeToConvert(spark: SparkSession, d: String): DataFrame = {
    val signup = events(spark, d).filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("s_us"))
    val purch = events(spark, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    val delays = signup.join(purch, "user_id")
      .filter(col("p_us") >= col("s_us"))
      .groupBy(col("user_id"), col("s_us"))
      .agg(min(col("p_us") - col("s_us")).as("delay_us"))
      .select(col("user_id"),
        dayofweek(timestamp_micros(col("s_us"))).cast("long").as("dow"),
        col("delay_us"))
    val byDelay = Window.partitionBy(col("dow"))
      .orderBy(col("delay_us"), col("user_id"))
    val all = Window.partitionBy(col("dow"))
    delays
      .withColumn("rn", row_number().over(byDelay))
      .withColumn("cnt", count(lit(1)).over(all))
      .withColumn("mx", max(col("delay_us")).over(all))
      .filter(col("rn") === expr("(cnt + 1) DIV 2"))
      .select(col("dow"), col("cnt").as("n_converted"),
        col("delay_us").as("median_delay_us"), col("mx").as("max_delay_us"))
      .orderBy(col("dow"))
  }

  /** q_multi_distinct — several COUNT(DISTINCT …) over different columns
    * in ONE aggregate: the dashboard header row (rows / users / types /
    * active days) and a real planner story — Catalyst compiles N
    * distinct aggregates into a single EXPAND (each input row fans into
    * N tagged copies, one per distinct column) + one aggregation tree,
    * ONE pass over the data instead of N self-reads. The ×N expand is
    * the honest cost of multi-distinct exactness; the sketch path
    * (q_approx_distinct / q_hll_merge) is the documented escape when N
    * distincts over 100 TB don't justify it. PlanSpec pins the Expand.
    */
  def qMultiDistinct(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        countDistinct(date_trunc("day", col("ts"))).as("n_days"))

  /** q_decile_lift — the gains/lift table: users scored by engagement
    * (event count), deciled, and each decile read against the share of
    * purchase VALUE it captures — "the top 10% of users by activity
    * drive X% of revenue", the chart every targeting/model-eval
    * conversation starts from. Lift(d) = value-share(d) / 0.1; the
    * cumulative column is the gains curve.
    *
    * Plan: one per-user aggregate (score + value in the same pass),
    * ntile over the |users|-sized relation (the [[qNtile]] stance —
    * ntile is rank-arithmetic, parallel after one sort shuffle), one
    * 10-row re-aggregate, and the cumulative window runs over TEN rows.
    *
    * Determinism: the ntile order is total ((score, user_id) desc/asc);
    * value mass via exactSum; shares and lift are pinned divisions; the
    * cumulative share sums the 10 exact decimal-backed doubles in rank
    * order (ROWS frame over a deterministic 10-row relation).
    */
  def qDecileLift(spark: SparkSession, d: String): DataFrame = {
    val perUser = events(spark, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("score"),
        graft.Tables.exactSum(
          when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0.0))).as("revenue"))
    val w = Window.orderBy(col("score").desc, col("user_id"))
    val tot = perUser.agg(graft.Tables.exactSum(col("revenue")).as("tot_rev"),
      count(lit(1)).as("n_users"))
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    perUser
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users_d"),
        graft.Tables.exactSum(col("revenue")).as("rev_d"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_users_d"),
        (col("rev_d") / col("tot_rev")).as("rev_share"),
        ((col("rev_d") / col("tot_rev")) / lit(0.1)).as("lift"))
      .withColumn("cum_share", sum(col("rev_share")).over(cum))
      .orderBy(col("decile"))
  }

  /** q_mode — per-user modal event type, DETERMINISTICALLY: the most
    * frequent value with ties broken by the smallest value, expressed as
    * one `min_by` over a (−count, value) struct — lexicographic struct
    * ordering makes (highest count, then smallest value) a single
    * aggregate, no window, no second shuffle. The built-in `mode()` is
    * unusable under an oracle gate (its tie-break is
    * arrival-order-nondeterministic in BOTH engines); this form is the
    * deterministic mode a reproducible pipeline needs.
    */
  def qMode(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(min_by(col("event_type"),
        struct((-col("n")).as("negn"), col("event_type").as("t"))).as("mode_type"),
        max(col("n")).as("top_n"))
      .orderBy(col("user_id"))

  /** q_median — per-group lower median by ELEMENT SELECTION (the value at
    * rank ⌈n/2⌉), not interpolation: interpolated quantiles differ across
    * engines in the last ulp, a selected element cannot. Rank + count are
    * windowed in one pass; ties broken by event_id for a total order.
    */
  def qMedian(spark: SparkSession, d: String): DataFrame = {
    val byValue = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val all = Window.partitionBy(col("event_type"))
    events(spark, d)
      .select(col("event_type"), col("value"),
        row_number().over(byValue).as("rn"),
        count(lit(1)).over(all).as("cnt"))
      .filter(col("rn") === expr("(cnt + 1) DIV 2"))
      .select(col("event_type"), col("value").as("median_v"))
      .orderBy(col("event_type"))
  }

  /** q_winsorize — IQR outlier clipping (Tukey fences), the standard
    * numeric-cleaning transform before training-data aggregation: per
    * group, values outside [p25 − 1.5·IQR, p75 + 1.5·IQR] are clamped to
    * the fence. ONE shuffle: the rank window, the quantile extraction
    * (`max(when(rn = k))` as a second window over the SAME partitioning —
    * no new Exchange), and the per-row clamp all ride the event_type
    * partition. Quantiles are selected elements (E29's contract) and the
    * fences are assembled in one literal parenthesization
    * (p25 − (1.5·(p75 − p25))), so clamped values hash-match the oracle
    * bit-for-bit.
    */
  def qWinsorize(spark: SparkSession, d: String): DataFrame = {
    val byValue = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val all = Window.partitionBy(col("event_type"))
    val iqr = col("p75") - col("p25")
    val lo  = col("p25") - (lit(1.5) * iqr)
    val hi  = col("p75") + (lit(1.5) * iqr)
    events(spark, d)
      .select(col("event_type"), col("event_id"), col("value"),
        row_number().over(byValue).as("rn"),
        count(lit(1)).over(all).as("cnt"))
      .select(col("event_type"), col("event_id"), col("value"),
        max(when(col("rn") === expr("(cnt + 3) DIV 4"), col("value")))
          .over(all).as("p25"),
        max(when(col("rn") === expr("(3 * cnt + 3) DIV 4"), col("value")))
          .over(all).as("p75"))
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("value") < lo, lo)
          .when(col("value") > hi, hi)
          .otherwise(col("value")).as("clipped"))
      .orderBy(col("event_id"))
  }

  /** q_percentile_cont — INTERPOLATED per-group quantiles (p50/p90), made
    * oracle-gateable: builtin `percentile_cont`/`quantile_cont` differ
    * across engines in the last ulp because each writes the lerp in its
    * own order, so [[qQuantiles]] deliberately selects elements instead.
    * This query shows interpolation IS bit-stable when the arithmetic is
    * explicit: rank the group once (same single-shuffle window pass as
    * E29b), pull out the two bracketing elements v_lo = value@⌊pos⌋ and
    * v_hi = value@min(⌊pos⌋+1, n) by conditional aggregation, and
    * evaluate pos = 1.0 + q·(n−1), frac = pos − ⌊pos⌋, and
    * v_lo + ((v_hi − v_lo)·frac) in ONE literal parenthesization
    * mirrored in the oracle — every step correctly rounded in IEEE
    * double, hence identical bits. (`least(lo+1, n)` keeps the hi rank
    * in range when frac = 0 at the group maximum.)
    */
  def qPercentileCont(spark: SparkSession, d: String): DataFrame = {
    val byValue = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val all = Window.partitionBy(col("event_type"))
    val ranked = events(spark, d)
      .select(col("event_type"), col("value"),
        row_number().over(byValue).as("rn"),
        count(lit(1)).over(all).as("cnt"))
    def pos(q: Double) = lit(1.0) + (lit(q) * (col("cnt") - 1).cast("double"))
    def lo(q: Double)  = floor(pos(q))                 // LongType in Spark
    def hi(q: Double)  = least(lo(q) + 1, col("cnt"))
    def pick(q: Double, tag: String) = Seq(
      max(when(col("rn") === lo(q), col("value"))).as(s"v_lo$tag"),
      max(when(col("rn") === hi(q), col("value"))).as(s"v_hi$tag"),
      max(pos(q) - lo(q).cast("double")).as(s"frac$tag"))
    def lerp(tag: String) =
      col(s"v_lo$tag") + ((col(s"v_hi$tag") - col(s"v_lo$tag")) * col(s"frac$tag"))
    val m = pick(0.5, "50") ++ pick(0.9, "90")
    ranked.groupBy(col("event_type"))
      .agg(m.head, m.tail: _*)
      .select(col("event_type"),
        lerp("50").as("p50_c"), lerp("90").as("p90_c"))
      .orderBy(col("event_type"))
  }

  /** q_running_sum — cumulative per-user sum over event time (the window
    * FRAME surface: ROWS UNBOUNDED PRECEDING). The accumulation is decimal
    * so every prefix is exact — a double running sum would drift from the
    * oracle in the last ulp at some prefix length. State per key is the
    * frame's single accumulator; the total order (ts, event_id) makes
    * every prefix deterministic.
    */
  def qRunningSum(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, d)
      .select(col("user_id"), col("event_id"),
        sum(col("value").cast(DecimalType(38, 6))).over(w)
          .cast("double").as("run"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q_quantiles — exact per-group p25/p50/p75 by the same element-
    * selection contract as [[qMedian]] (the value at rank ⌈q·n⌉; selected
    * elements are engine-exact where interpolation is not). One windowed
    * pass ranks every row, a pivot-style conditional aggregation pulls the
    * three ranks out — the whole query is ONE shuffle on the group key.
    * At 100 TB exact quantiles per group require the per-group sort this
    * window does; the sketch alternative (approx_percentile / KLL) is the
    * cheaper-but-inexact path, which `q_approx_distinct` already
    * represents for cardinality.
    */
  def qQuantiles(spark: SparkSession, d: String): DataFrame = {
    val byValue = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val all = Window.partitionBy(col("event_type"))
    val ranked = events(spark, d)
      .select(col("event_type"), col("value"),
        row_number().over(byValue).as("rn"),
        count(lit(1)).over(all).as("cnt"))
    ranked
      .groupBy(col("event_type"))
      .agg(
        max(when(col("rn") === expr("(cnt + 3) DIV 4"), col("value"))).as("p25"),
        max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("value"))).as("p50"),
        max(when(col("rn") === expr("(3 * cnt + 3) DIV 4"), col("value"))).as("p75"))
      .orderBy(col("event_type"))
  }

  /** q_approx_quantiles — the SKETCH path beside [[qQuantiles]] (as
    * [[qApproxDistinct]] is beside [[qDistinct]]): Greenwald-Khanna
    * approximate percentiles with accuracy 10000 (error ≤ 1/accuracy of
    * rank). Mergeable sketch, map-side partial — one row per group
    * crosses the shuffle regardless of group size, where exact element
    * selection must move every row.
    *
    * Like [[qApproxTopk]], the gate rides the sketch's EXACT domain: a
    * GK summary never compresses while a group's sample count stays
    * under the accuracy (10⁴), so at the driver's sf0.01 (~2 k values
    * per event_type) every sample is retained, merges concatenate, and
    * the estimate is the exact element at rank ⌈p·n⌉ — the same element
    * DuckDB's `quantile_disc` selects, hence a full hash-match oracle
    * proving the sketch path end-to-end (verified identical at both
    * fixture SFs and under 4- vs 32-partition shuffles). Beyond the
    * exact domain the gate would weaken to the AnalyticsSpec rank-error
    * bound, which still pins the 100 TB contract.
    */
  def qApproxQuantiles(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"))
      .select(col("event_type"),
        col("qs").getItem(0).as("p25"),
        col("qs").getItem(1).as("p50"),
        col("qs").getItem(2).as("p75"))
      .orderBy(col("event_type"))

  /** q_asof_join — temporal AS-OF join, an operator Spark has no built-in
    * for: each event is matched to the most recent order of the same
    * customer at or before the event's timestamp (ties on order time
    * broken by highest order key; customers with no prior order get
    * NULL).
    *
    * Implementation is the single-shuffle union trick, NOT a range join:
    * order rows and event rows are unioned into one stream tagged by
    * side, shuffled ONCE on the customer key, and a running
    * `last(order_key, ignoreNulls)` over (ts, side, order_key) row order
    * carries each customer's latest order forward onto every subsequent
    * event row. At 100 TB this is one shuffle of |orders|+|events| rows
    * and a linear per-partition pass — the naive inequality join is a
    * per-customer cross product that explodes on active customers, and
    * Spark would plan it as BroadcastNestedLoop if not equi-keyed. Orders
    * sort before events at the same timestamp, so an order placed exactly
    * at the event's ts qualifies (the `<=` contract).
    */
  def qAsofJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .select(col("user_id"), col("ts"), lit(1).as("is_event"),
              col("event_id"), lit(null).cast("long").as("o_orderkey"))
    // o_orderdate is TIMESTAMP_NTZ in the parquet; cast to TimestampType
    // (session TZ is UTC, so wall time == instant) to union with events.ts.
    val ord = orders(spark, d)
      .select(col("o_custkey").as("user_id"),
              col("o_orderdate").cast("timestamp").as("ts"),
              lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
              col("o_orderkey"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_event"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("asof_order_key",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("user_id"), col("asof_order_key"))
      .orderBy(col("event_id"))
  }

  /** q_topk_group — per-group top-k through the CUSTOM OPERATOR tier
    * ([[graft.plans.TopKPerGroupPlan]] + strategy + exec): the top 3
    * events per event type by (value desc, event_id). The window-function
    * form sorts every partition in full; the custom exec keeps an
    * O(k) heap per group after one hash shuffle — see the scaladoc on
    * [[graft.plans.TopKPerGroup]]. The oracle is the window form, so the
    * two strategies must produce identical rows.
    */
  def qTopkGroup(spark: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    val e = events(spark, d)
      .select(col("event_type"), col("event_id"), col("value"))
    graft.plans.TopKPerGroup(e,
        Seq(e("event_type")),
        Seq((e("value"), true), (e("event_id"), false)), 3)
      .orderBy(col("event_type"), col("value").desc, col("event_id"))
  }

  /** q_topk_rewrite — [[qTopkGroup]]'s OPTIMIZER-TIER twin: the query is
    * written as the ubiquitous WINDOW IDIOM (`row_number().over(...)`,
    * `filter(rn <= 3)`, `drop("rn")`) and the registered
    * [[graft.plans.RowNumberTopKRewrite]] rule rewrites it to the same
    * O(k)-heap [[graft.plans.TopKPerGroupPlan]] operator — so a user who
    * never heard of the custom operator still gets the heap instead of
    * WindowExec's full partition sort. qTopkGroup gate-verifies the
    * OPERATOR; this verifies the REWRITE end to end (TopKSpec pins the
    * plan shape: TopKPerGroup exec present, no Window, one shuffle).
    * Same oracle as qTopkGroup — the two plans must agree row-for-row.
    */
  def qTopkRewrite(spark: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    events(spark, d)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("event_type"), col("value").desc, col("event_id"))
  }

  /** q_range_join — interval/range join: same-user event pairs within ±1
    * hour of each other. The naive inequality join is not equi-keyed, so
    * Spark would plan a nested loop (quadratic per user at 100 TB);
    * instead the time axis is BUCKETIZED to the range width: a pair
    * within 1 hour spans at most adjacent hour buckets, so one side
    * explodes to its 3 candidate buckets (bounded 3× blowup), the join is
    * a plain (user, bucket) equi-join, and the exact interval predicate
    * filters the candidates. The DuckDB oracle states the naive
    * inequality form (its IEJoin handles it) — two engines, two plans,
    * identical rows. PlanSpec asserts the Spark side stays an equi-join.
    */
  def qRangeJoin(spark: SparkSession, d: String): DataFrame = {
    val e = events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("CAST(ts AS LONG) DIV 3600").as("bkt"))
    val a = e.select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("ts").as("a_ts"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("jb"))
    val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("b_ts"), col("bkt").as("b_bkt"))
    a.join(b,
        col("a_user") === col("b_user") && col("jb") === col("b_bkt") &&
          col("a_id") < col("b_id") &&
          col("b_ts") >= col("a_ts") - expr("INTERVAL 1 HOUR") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("a_id"), col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q_profile — per-column table profiling (row counts, null counts,
    * distinct counts, min/max, exact sums for the four lineitem measure
    * columns): the data-quality summary every ingestion pipeline runs.
    *
    * Plan shape: the non-distinct statistics for ALL four columns come
    * from ONE scan (a single aggregate with 4×4 expressions, map-side
    * partial), pivoted to per-column rows with `inline`. The four
    * distinct counts deliberately do NOT join that aggregate: multiple
    * `countDistinct`s in one aggregate plan as an Expand that multiplies
    * every input row ×4 and re-aggregates the other 16 statistics over
    * the expanded stream — measured 2× slower than running each ndv as
    * its own column-pruned scan (parquet reads exactly one column) whose
    * distinct shuffle carries only the distinct values. Sums are
    * decimal-exact, so partition order can't move the result.
    */
  def qProfile(spark: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
          min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"),
          exactSum(col(c)).as(s"sum_$c"))
    }
    val stats = lineitem(spark, d)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), inline(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(s"nn_$c").as("n_nonnull"),
          col(s"min_$c").as("min_v"), col(s"max_$c").as("max_v"),
          col(s"sum_$c").as("sum_v"))
      }: _*)))
    val ndvs = cols.map { c =>
      lineitem(spark, d).select(col(c)).distinct()
        .agg(count(col(c)).as("ndv"))
        .select(lit(c).as("col_name"), col("ndv"))
    }.reduce(_ unionByName _)
    stats.join(ndvs, "col_name")
      .select(col("col_name"), col("n_rows"), col("n_nonnull"), col("ndv"),
        col("min_v"), col("max_v"), col("sum_v"))
      .orderBy(col("col_name"))
  }

  /** q_sample_hash — DETERMINISTIC sampling, the way a training-data
    * pipeline actually samples: keep rows whose key-hash lands in the
    * sample bucket (md5(event_id) mod 20 == 0 → 5%), then aggregate the
    * sample. `df.sample()` draws from a per-partition RNG stream, so its
    * result changes with partitioning/AQE and can't be verified or
    * reproduced; hash-mod sampling is partition-invariant, stable across
    * engines, and trivially stratifiable (mod per stratum). Per-row
    * expression + hash agg — nothing to shuffle but the sample.
    */
  def qSampleHash(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .filter(expr(
        // conv() returns STRING; the cast makes the mod run in exact int64
        // by declaration instead of relying on implicit string→numeric
        // coercion (whose target type is ANSI-mode-dependent — a DOUBLE
        // coercion would round values above 2^53 and silently shift the
        // sample set).
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 20 = 0"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_v"))
      .orderBy(col("event_type"))

  /** q_unpivot — wide→long melt (the inverse of [[qPivot]]): the four
    * lineitem measures become (measure, val) rows keyed by the line id.
    * Spark's `unpivot` plans as a single Expand — one scan, 4× row
    * generation, no shuffle before the presentation sort.
    */
  def qUnpivot(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "val")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))

  /** q_custom_agg — the typed [[graft.functions.ArgMaxLong]] Aggregator
    * (E12) finding each event type's highest-value event.
    */
  def qCustomAgg(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        argMaxLong(col("event_id"), col("value")).as("best_id"),
        max(col("value")).as("best_value"))
      .orderBy(col("event_type"))

  /** q_ntile — per-language length quartiles over `documents` (the
    * stratification step before length-balanced sampling in a training
    * pipeline): ntile(4) within each language ordered by (n_chars,
    * doc_id) — the doc_id tie-break makes bucket assignment total-order
    * deterministic, so both engines agree exactly.
    *
    * Scale: the window partitions by `lang`, so each language's rows sort
    * independently — never a single global window partition (a global
    * NTILE funnels the whole table through one task; the production
    * global form cuts on approx-quantile boundaries instead).
    */
  def qNtile(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    documents(spark, d)
      .select(col("lang"), col("n_chars"), ntile(4).over(w).as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** Rows kept per stratum by [[qSampleBalanced]]. */
  val BalancedPerStratum = 200

  /** q_sample_balanced — deterministic class-balanced subsampling: keep
    * the first [[BalancedPerStratum]] rows per event_type in md5-hash
    * order (a reproducible shuffle), the way a training pipeline
    * downsamples majority classes. Hash order (not ts or id order) makes
    * the kept set a uniform draw that is identical across engines,
    * partitionings, and reruns; the event_id tie-break closes the
    * (improbable) hash-collision hole.
    *
    * Scale: one window per stratum key — per-key parallel — and
    * row_number's sort is bounded per key by Spark's WindowGroupLimit
    * pushdown (rank-limit filter pushed below the sort at the shuffle
    * map side).
    */
  def qSampleBalanced(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
    events(spark, d)
      .select(col("event_type"), col("value"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= BalancedPerStratum)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_v"))
      .orderBy(col("event_type"))
  }

  /** Sequence length cap in [[qEventSeq]]. */
  val SeqLen = 10

  /** q_event_seq — training-sequence construction: each user's first
    * [[SeqLen]] event types in (ts, event_id) order, joined into one
    * string — the per-entity ordered-history shape every
    * sequence-model / session-embedding dataset is built from.
    *
    * Scale: collect_list + sort_array keeps per-user state bounded by the
    * user's event count (and the emitted column by [[SeqLen]]); the
    * aggregation is a single hash agg keyed by user — map-side partial,
    * one row per user across the shuffle. A pipeline with unbounded
    * per-user history would pre-truncate with a windowed row_number
    * (the [[qSampleBalanced]] shape) before collecting.
    */
  def qEventSeq(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          slice(transform(
            sort_array(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), 1, SeqLen),
          "|").as("seq"))
      .orderBy(col("user_id"))

  /** q_corr — per-event-type Pearson correlation of value vs hour-of-day,
    * the feature-correlation profiling step of dataset curation — computed
    * BIT-STABLY: Spark's builtin `corr` accumulates co-moments in double
    * (partitioning-dependent last-ulp), so instead the five sums are
    * exact decimal aggregations ([[graft.Tables.exactSum]], order-
    * invariant) and the textbook formula
    * (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²))
    * is then evaluated in IEEE double in the same literal order in both
    * engines. Map-side-partial agg; one 6-value row per group shuffles.
    */
  def qCorr(spark: SparkSession, d: String): DataFrame = {
    val x = col("value")
    val y = hour(col("ts")).cast("double")
    val stats = events(spark, d)
      .select(col("event_type"), x.as("x"), y.as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        exactSum(col("x")).as("sx"), exactSum(col("y")).as("sy"),
        exactSum(col("x") * col("x")).as("sxx"),
        exactSum(col("y") * col("y")).as("syy"),
        exactSum(col("x") * col("y")).as("sxy"))
    // Zero-variance guard, written IDENTICALLY in the oracle: a constant
    // column makes the radicand 0 (or a tiny negative after the decimal
    // rounding of the sums) — Spark would yield NaN/Infinity where DuckDB
    // ERRORS on sqrt(negative) and NULLs float division by zero. Both
    // engines agree on NULL through the same CASE.
    val radX = col("n") * col("sxx") - col("sx") * col("sx")
    val radY = col("n") * col("syy") - col("sy") * col("sy")
    stats.select(col("event_type"), col("n").cast("long").as("n"),
        when(radX > 0 && radY > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(radX) * sqrt(radY))).as("corr_vh"))
      .orderBy(col("event_type"))
  }

  /** q_first_last — the remaining window ACCESSORS (first_value,
    * last_value, nth_value) in one per-user summary: each user's entry
    * event, latest event, and second event (the onboarding-analysis
    * triple — what did they do first, what are they doing now, what
    * followed acquisition). One row per user via a single window whose
    * frame is pinned to the WHOLE partition (unbounded both ways):
    * last_value over the default frame (unbounded→current) is the
    * classic silent bug — it returns the CURRENT row — so the explicit
    * frame is the semantic, not a flourish. All three accessors share
    * the one user_id shuffle + sort; `distinct` after projecting the
    * (constant-per-user) triple collapses to one row per user without a
    * second aggregate pass over the detail.
    *
    * Determinism: the frame orders by the (ts, event_id) total order,
    * and the accessor outputs are exact strings/ints.
    */
  def qFirstLast(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(spark, d)
      .select(col("user_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .distinct()
      .orderBy(col("user_id"))
  }

  /** q_event_gap — lag/lead analytics: each event's seconds-since-previous
    * and seconds-to-next within its user's (ts, event_id)-ordered history
    * — the inter-arrival feature behind sessionization-gap tuning and
    * bot/burst detection. Both offsets come from ONE window (one shuffle
    * on user_id, one per-key sort serving lag and lead); second-precision
    * epoch arithmetic keeps the values engine-exact integers.
    */
  def qEventGap(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .select(col("user_id"), col("event_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .as("gap_prev_s"),
        (unix_timestamp(lead(col("ts"), 1).over(w)) - unix_timestamp(col("ts")))
          .as("gap_next_s"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q_doc_dedup — exact DOCUMENT dedup by content fingerprint: group by
    * the md5 of the text, keep the smallest doc_id (the canonical copy) —
    * [[qDedup]]'s keep-min-id contract applied to the documents table,
    * the first stage of every corpus dedup pipeline (exact dups are free
    * to kill before any near-dup machinery runs). Hash agg on the
    * fingerprint: map-side partial, one row per distinct content.
    */
  def qDocDedup(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** q_scd2 — slowly-changing-dimension (type 2) interval building from
    * the event log: each user's runs of consecutive identical event types
    * collapse to one row with [valid_from, valid_to) — valid_to = the
    * next run's start, NULL while current. The CDC shape every
    * dimension-table pipeline derives from a change stream.
    *
    * Plan: one shuffle on user_id serves both windows (the change-flag
    * lag on the full set and the lead over the surviving run heads —
    * Catalyst reuses the partitioning; the second window re-sorts only).
    * Per-user state is one row either side of the cursor — no
    * gaps-and-islands grouping pass needed because run HEADS alone
    * define the intervals.
    */
  /** Run heads of an event set: the first row of each per-user run of
    * consecutive identical event types, in (ts, event_id) order. Shared by
    * [[qScd2]] (full rebuild) and [[qScd2Apply]] (incremental MERGE) — in
    * the merge it also performs the boundary dedup, because a change run
    * continuing the dimension's current type is just a non-head row once
    * the two head sets are unioned.
    */
  private[graft] def scd2Heads(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
  }

  /** [valid_from, valid_to) intervals from run heads: valid_to = the next
    * head's start, NULL while current. Microsecond-precision bounds:
    * second truncation would let two heads in the same second tie the
    * sort key (the sf0.1 fixture has such a pair) and make row order —
    * and the spec's chain check — ambiguous.
    */
  private def scd2Intervals(heads: DataFrame): DataFrame = {
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    def tsMicros(c: org.apache.spark.sql.Column) =
      date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    heads
      .select(col("user_id"), col("event_type"),
        tsMicros(col("ts")).as("valid_from"),
        tsMicros(lead(col("ts"), 1).over(w2)).as("valid_to"))
  }

  def qScd2(spark: SparkSession, d: String): DataFrame =
    scd2Intervals(scd2Heads(events(spark, d)))
      .orderBy(col("user_id"), col("valid_from"), col("event_type"))

  /** q_scd2_apply — batch CDC MERGE: apply a change set (the final day of
    * the event log) to the SCD2 dimension built from everything before
    * it — close the affected open intervals, insert the new ones — the
    * Load stage every warehouse pipeline runs against a mutable dimension
    * table (the reference's persisted Load frame, app.py:274, as a MERGE
    * target instead of a render).
    *
    * MERGE shape, not a rebuild: the inputs are the DIMENSION TABLE
    * (one row per interval — orders of magnitude smaller than the event
    * history at 100 TB) and the CHANGE SET; raw history is never
    * re-read. Untouched users' intervals pass through by anti-join;
    * touched users (semi-join against the distinct change users — a
    * small broadcastable set) have their interval heads unioned with the
    * change-set run heads and re-deduped at the single possible
    * boundary (dimension's current type == first change type) by the
    * same lag-filter that built the heads, then valid_to is re-derived.
    * Work is O(|dim| + |changes|), windows run only over touched users'
    * heads. The oracle is the FULL-HISTORY rebuild SQL (q_scd2's, over
    * the unioned input), so the correctness gate proves
    * merge(dim, changes) == rebuild(history + changes) exactly.
    *
    * The change-set cutoff (start of the day containing the newest
    * event) is computed as a 1-row broadcast inside the plan — no
    * driver-side collect; a production run would pass the load date as a
    * literal and let it prune partitions at the scan.
    */
  def qScd2Apply(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
    val cutoff = ev.agg(date_trunc("DAY", max(col("ts"))).as("day0"))
    val tagged = ev.crossJoin(broadcast(cutoff))
    val historic = tagged.filter(col("ts") < col("day0")).drop("day0")
    val changes = tagged.filter(col("ts") >= col("day0")).drop("day0")

    // `changes` and `dimHeads` each feed two consumers, but their
    // duplicated subtrees sit under identical window/agg exchanges that
    // ReuseExchange dedups at runtime — caching them measured SLOWER
    // (materialization overhead for no saved compute). A production SCD2
    // job materializes the dim as a real table; inside one plan, reuse
    // is the engine's job.
    val dimHeads = scd2Heads(historic)
    val changeHeads = scd2Heads(changes)
    val touched = changes.select(col("user_id")).distinct()

    val untouched = scd2Intervals(dimHeads.join(touched, Seq("user_id"), "left_anti"))
    val merged = scd2Intervals(scd2Heads(
      dimHeads.join(touched, Seq("user_id"), "left_semi").unionByName(changeHeads)))
    untouched.unionByName(merged)
      .orderBy(col("user_id"), col("valid_from"), col("event_type"))
  }

  /** q_snapshot_diff — CDC changelog EXTRACTION: diff two per-user
    * weekly activity snapshots (count + exact value total over
    * [T−7d, T), at T = Jan 15 and T = Jan 29) into the insert / update /
    * delete changelog that transforms the first into the second — the
    * standard move when an upstream table publishes NO changelog: diff
    * consecutive snapshots into one. The inverse of [[qScd2Apply]],
    * which CONSUMES a change set.
    *
    * Plan: each snapshot is a date-pruned aggregate (the window
    * predicate pushes to the parquet scan, so at 100 TB each side reads
    * one week, not the table); the diff is ONE full-outer join on the
    * key — the honest key shuffle, which at-rest bucketing
    * (q_write_bucketed's layout) makes co-partitioned and shuffle-free.
    * Classification is pure projection over null-ness; unchanged rows
    * are dropped so changelog volume is O(churn), not O(keys).
    *
    * Determinism: counts are BIGINT; totals go through exactSum (the
    * identical decimal cast in the oracle), so the changed-vs-unchanged
    * comparison compares bit-identical doubles in both engines.
    */
  def qSnapshotDiff(spark: SparkSession, d: String): DataFrame = {
    def snap(from: String, to: String) =
      events(spark, d)
        .filter(col("ts") >= lit(from).cast("timestamp") &&
                col("ts") < lit(to).cast("timestamp"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"),
          graft.Tables.exactSum(col("value")).as("total"))
    val a = snap("2024-01-08 00:00:00", "2024-01-15 00:00:00")
      .select(col("user_id"), col("cnt").as("old_cnt"), col("total").as("old_total"))
    val b = snap("2024-01-22 00:00:00", "2024-01-29 00:00:00")
      .select(col("user_id"), col("cnt").as("new_cnt"), col("total").as("new_total"))
    a.join(b, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("old_cnt").isNull, lit("I"))
          .when(col("new_cnt").isNull, lit("D"))
          .otherwise(lit("U")).as("op"),
        col("old_cnt"), col("old_total"), col("new_cnt"), col("new_total"))
      .filter(col("op") =!= "U" ||
        col("old_cnt") =!= col("new_cnt") || col("old_total") =!= col("new_total"))
      .orderBy(col("user_id"))
  }

  /** q_cogroup — the TYPED per-key merge API (`KeyValueGroupedDataset
    * .cogroup`): both inputs co-shuffle ONCE on the key and an arbitrary
    * Scala function sees each key's two iterators side by side — the
    * escape hatch for per-key merge logic joins + aggregates can't
    * express (custom reconciliation, ordered two-stream merges, per-key
    * state machines). Here the merge logic is deliberately
    * oracle-expressible — per-user event count/total against order
    * count/total — so the hash gate proves the typed path computes
    * exactly what the declarative full-outer-join path would.
    *
    * Scale: one hash co-partitioning per side (the same shuffle a join
    * would pay), then streaming per-key iterators — state is one
    * accumulator pair per side, never a materialized group. Determinism:
    * counts are Long; totals accumulate setScale(6) BigDecimals
    * iterator-side (exact, order-independent addition — the exactSum
    * contract moved into typed code) and convert to double once.
    */
  def qCogroup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, d).select(col("user_id"), col("value"))
      .as[(Long, Double)]
    val or = orders(spark, d).select(col("o_custkey"), col("o_totalprice"))
      .as[(Long, Double)]
    def fold(it: Iterator[(Long, Double)]): (Long, Option[Double]) = {
      var n = 0L
      var s = BigDecimal(0)
      it.foreach { case (_, v) =>
        n += 1
        s += BigDecimal(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
      }
      (n, if (n == 0) None else Some(s.toDouble))
    }
    ev.groupByKey(_._1).cogroup(or.groupByKey(_._1)) { (k, evs, ors) =>
      val (ne, sv) = fold(evs)
      val (no, so) = fold(ors)
      Iterator((k, ne, sv, no, so))
    }.toDF("user_id", "n_events", "sum_v", "n_orders", "sum_o")
      .orderBy(col("user_id"))
  }

  /** q_funnel — conversion-funnel analysis: per event type, how many
    * users ever reached it, and how many converted through the canonical
    * view → click → purchase ORDER (first-touch timestamps must be
    * non-decreasing). One conditional-aggregation pass — three `min(case
    * …)` columns per user (map-side partial), then a count — no joins,
    * no self-unions; the 100 TB plan is the same two hash aggs.
    */
  def qFunnel(spark: SparkSession, d: String): DataFrame = {
    def firstTouch(t: String) =
      min(when(col("event_type") === t, col("ts"))).as(s"t_$t")
    val perUser = events(spark, d)
      .groupBy(col("user_id"))
      .agg(firstTouch("view"), firstTouch("click"), firstTouch("purchase"))
    perUser.agg(
        count(col("t_view")).as("n_view"),
        count(when(col("t_view") <= col("t_click"), true)).as("n_view_click"),
        count(when(col("t_view") <= col("t_click") &&
                   col("t_click") <= col("t_purchase"), true))
          .as("n_view_click_purchase"))
  }

  /** q_freshness — per-feed staleness monitor: each event type's last
    * event time and its lag behind the freshest feed — the first page of
    * every ingestion dashboard ("which source stopped"), and the
    * Spark-native analog of the reference's 60 s refresh loop's implicit
    * promise (/root/reference/app.py:37: data is only as fresh as the
    * last fetch). Times ride epoch-µs BIGINTs end to end (the
    * [[graft.sources.FileSources]] round-trip stance — no timestamp
    * formatting ambiguity), lag in whole seconds via integer div.
    *
    * Plan: ONE map-side-partial min/max aggregate to |types| rows; the
    * global watermark is a 1-row broadcast re-aggregated FROM those
    * |types| rows (the corpus is scanned once, the q_unigram_lm
    * re-aggregation stance).
    */
  def qFreshness(spark: SparkSession, d: String): DataFrame = {
    val perType = graft.Tables.cacheForSelfJoin(
      events(spark, d)
        .groupBy(col("event_type"))
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("n_events")))
    val global = perType.agg(max(col("last_us")).as("global_us"))
    perType.crossJoin(broadcast(global))
      .select(col("event_type"), col("last_us"),
        expr("(global_us - last_us) div 1000000").as("lag_sec"),
        col("n_events"))
      .orderBy(col("event_type"))
  }

  /** Keys reported by [[qSkewReport]]. */
  val SkewTopK = 20

  /** q_skew_report — hot-key audit of the event log: the top-
    * [[SkewTopK]] user_ids by row count with each key's share and the
    * cumulative share — the diagnostic run BEFORE launching any
    * user-keyed join/agg at scale, because its output is precisely the
    * decision input for the engine's own skew levers (`q_salted_agg`/
    * `q_salted_join` when the head is heavy, plain hash partitioning
    * when it isn't). Companion summary columns put each count in
    * context: ratio_to_mean = cnt·n_keys/n.
    *
    * Plan: ONE map-side-partial count to |keys| rows, TakeOrdered heap
    * for the top-K, then windows/joins only over the CONSTANT-sized
    * top-K relation (cum share is a K-row ordered prefix — the q_ks_test
    * domain-sized-tail stance). Exact BIGINTs everywhere; shares are
    * pinned double divisions.
    */
  def qSkewReport(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.Tables.cacheForSelfJoin(
      events(spark, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt")))
    val tot = counts.agg(sum(col("cnt")).as("n"),
      count(lit(1)).as("n_keys"))
    val w = Window.orderBy(col("cnt").desc, col("user_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    counts.orderBy(col("cnt").desc, col("user_id")).limit(SkewTopK)
      .crossJoin(broadcast(tot))
      .withColumn("cum_cnt", sum(col("cnt")).over(w))
      .select(col("user_id"), col("cnt"),
        (col("cnt").cast("double") / col("n").cast("double")).as("share"),
        (col("cum_cnt").cast("double") / col("n").cast("double"))
          .as("cum_share"),
        (col("cnt").cast("double") * col("n_keys").cast("double") /
          col("n").cast("double")).as("ratio_to_mean"))
      .orderBy(col("cnt").desc, col("user_id"))
  }

  /** q_heatmap — the (7-day phase × hour-of-day) activity matrix: counts
    * and share of total per cell — the classic ops calendar heatmap
    * ("when does traffic arrive"), and the visual twin of
    * [[Stats.qCramersV]]'s association test over the same axes. Phase =
    * epoch-day mod 7, the engine-shared integer weekday definition
    * (E161's stance).
    *
    * Plan: ONE map-side-partial aggregate to ≤ 168 rows; total is
    * re-aggregated from those rows (single scan). Integer counts +
    * pinned share division.
    */
  def qHeatmap(spark: SparkSession, d: String): DataFrame = {
    val cells = graft.Tables.cacheForSelfJoin(
      events(spark, d)
        .select(expr("(unix_micros(ts) div 86400000000) % 7").as("dw"),
          hour(col("ts")).cast("long").as("hr"))
        .groupBy(col("dw"), col("hr")).agg(count(lit(1)).as("n")))
    val tot = cells.agg(sum(col("n")).as("total"))
    cells.crossJoin(broadcast(tot))
      .select(col("dw"), col("hr"), col("n"),
        (col("n").cast("double") / col("total").cast("double")).as("share"))
      .orderBy(col("dw"), col("hr"))
  }

  /** q_union_by_name — schema-evolution-tolerant union (`unionByName`
    * with `allowMissingColumns`): two feeds of the same logical table
    * whose physical schemas drifted — columns in different ORDER, one
    * feed missing a column — combined by NAME with nulls filled, the
    * everyday multi-source ingest shape positional UNION silently
    * corrupts (it would zip mismatched columns; the engine's q_union
    * covers the aligned case). Verdict columns: per-feed row count and
    * how many rows carry the drift-filled null.
    *
    * Plan: unions are metadata-only; the aggregate is one
    * map-side-partial pass over both scans.
    */
  def qUnionByName(spark: SparkSession, d: String): DataFrame = {
    val full = events(spark, d)
      .filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("event_type"), col("value"),
        lit("feed_a").as("feed"))
    val drifted = events(spark, d)
      .filter(col("event_id") % 2 === 1)
      .select(lit("feed_b").as("feed"), col("event_type"), col("event_id"))
    full.unionByName(drifted, allowMissingColumns = true)
      .groupBy(col("feed"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"))
      .orderBy(col("feed"))
  }

  /** q_seq3 — third-order behavioral sequence mining: the top-20
    * time-ordered event-type TRIGRAMS across user journeys —
    * [[qMarkov]]'s first-order transitions can't see "view→click→
    * purchase vs view→click→error", which is exactly the signal funnel
    * debugging needs. Counts per distinct 3-step pattern, top-20.
    *
    * Plan: two `lag` windows per user partition (parallel across users,
    * sort amortized by the partitioning shuffle — the qMarkov shape),
    * one vocabulary³-bounded hash aggregate, TakeOrdered heap.
    * All-integer counts; (ts, event_id) total order.
    */
  def qSeq3(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, d)
      .select(col("user_id"),
        lag(col("event_type"), 2).over(w).as("e1"),
        lag(col("event_type"), 1).over(w).as("e2"),
        col("event_type").as("e3"))
      .filter(col("e1").isNotNull && col("e2").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  /** q_tpch_q6 — the TPC-H Q6 forecasting-revenue-change shape: one
    * filtered scan, one global aggregate — the canonical predicate-
    * pushdown benchmark (year band + discount band + quantity cap all
    * land in `PushedFilters`), and the simplest query whose revenue
    * expression is a PRODUCT of two decimals. Exactness: cents ×
    * discount-percent = one BIGINT per row (10⁻⁴-dollar units), so the
    * sum is exact under any partitioning — the double product the
    * spec-sheet query would sum is order-dependent.
    */
  def qTpchQ6(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_rows"),
        sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long") *
          floor(col("l_discount") * lit(100.0) + lit(0.5)).cast("long"))
          .as("revenue_e4"))

  /** q_tpch_q13 — the TPC-H Q13 customer-distribution shape: orders per
    * customer INCLUDING zero-order customers (the left join no inner
    * aggregate can express), then the histogram of that count — the
    * engagement-distribution readout every CRM audit starts with.
    *
    * Plan: left join customer→orders (AQE picks the build side),
    * count(o_orderkey) ignores the null-padded rows, and the histogram
    * re-aggregates the \|customers\|-sized relation. All-integer.
    */
  def qTpchQ13(spark: SparkSession, d: String): DataFrame =
    customer(spark, d)
      .join(orders(spark, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** q_tpch_q3 — the TPC-H Q3 shipping-priority shape: top-10 not-yet-
    * shipped orders of one market segment by discounted revenue — the
    * canonical fact⋈fact⋈dim join with HALF-pushed date predicates (the
    * order-side date filters `orders`, the ship-side date filters
    * `lineitem` — each lands in its OWN scan's PushedFilters) and a
    * TakeOrdered top-k instead of a global sort.
    *
    * Plan: customer (segment-filtered, broadcast) ⋈ orders ⋈ lineitem;
    * the only full shuffle is the (orderkey) revenue aggregate, whose
    * output is order-cardinality. Revenue is exact discounted cents —
    * BIGINT under any partitioning.
    */
  def qTpchQ3(spark: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("timestamp")
    val lineCents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
      .join(orders(spark, d).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(spark, d).filter(col("l_shipdate") > cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(lineCents).as("revenue_cents"))
      .select(col("l_orderkey"), col("revenue_cents"),
        tsSeconds(col("o_orderdate")).as("o_orderdate_s"),
        col("o_orderpriority"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q_tpch_q18 — the TPC-H Q18 large-volume-customer shape: orders whose
    * total line quantity exceeds a threshold, with their customer — the
    * canonical HAVING-on-aggregate-then-join-back pattern (the aggregate
    * must run BEFORE the customer join; filtering after a pre-join would
    * re-scan the fact per customer).
    *
    * Plan: ONE lineitem aggregate to order grain, the HAVING cut shrinks
    * it to the tail (threshold-selective at every sf), and only that tail
    * joins back to orders/customer — AQE broadcasts the survivors.
    * Quantities are integral doubles (1..50) cast to BIGINT: exact.
    */
  def qTpchQ18(spark: SparkSession, d: String): DataFrame = {
    val bigOrders = lineitem(spark, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 300L)
    bigOrders
      .join(orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        tsSeconds(col("o_orderdate")).as("o_orderdate_s"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("total_cents"),
        col("total_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  /** q_tpch_q5 — the TPC-H Q5 local-supplier-volume shape: revenue per
    * nation of one region, counting only lineitems whose supplier sits in
    * the CUSTOMER'S nation — the canonical 6-way star-with-a-twist join
    * (the c_nationkey = s_nationkey equality ties two dimension arms
    * together, so no single join order is "the" star order; Catalyst must
    * carry the nation key through the fact).
    *
    * Plan: region ⋈ nation collapses to a ≤|nations| broadcast LUT before
    * anything large moves; customer and supplier each join it broadcast;
    * the year predicate lands in the orders scan's PushedFilters; the only
    * big shuffles are fact⋈fact on the order key and the final ≤|nations|-
    * row aggregate (map-side partial). Exact discounted cents → BIGINT.
    */
  def qTpchQ5(spark: SparkSession, d: String): DataFrame = {
    val lineCents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    val asiaNations = broadcast(
      nation(spark, d)
        .join(broadcast(region(spark, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
    val custs = customer(spark, d)
      .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ords = orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"), lineCents.as("cents"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(custs, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(spark, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("n_name"))
  }

  /** q_tpch_q10 — the TPC-H Q10 returned-item-reporting shape: the top-20
    * customers by revenue LOST to returns in one quarter — the
    * "who should account management call" join+agg with a selective fact
    * predicate (`l_returnflag = 'R'`) that reaches the lineitem scan's
    * PushedFilters and a quarter band on the orders scan.
    *
    * Plan: both fact filters push down; customer and nation ride broadcast
    * joins; the single full shuffle is the customer-grain aggregate;
    * TakeOrdered cuts to 20. Account balance is emitted as half-up cents
    * (the same fixed-point contract as revenue) so the row is all-BIGINT.
    */
  def qTpchQ10(spark: SparkSession, d: String): DataFrame = {
    val lineCents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    val ords = orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    lineitem(spark, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), lineCents.as("cents"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
            .as("acctbal_cents")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(spark, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("acctbal_cents"),
        col("n_name"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)
  }

  /** q_tpch_q19 — the TPC-H Q19 disjunctive-predicate shape: revenue from
    * three (brand, size-band, quantity-band) channels expressed as ONE
    * OR-of-ANDs that references BOTH join sides — the canonical test of
    * disjunction pushdown. Catalyst must split the OR into its side-local
    * implications (the quantity-band disjunction reaches the lineitem
    * scan's PushedFilters, the brand/size disjunction the part scan's)
    * without being told — the query states only the business predicate.
    *
    * Plan: part is a broadcast dim; after both scans are pre-cut by their
    * pushed disjunctions, the residual OR evaluates post-join on the
    * survivors; ONE 1-row aggregate. Exact discounted cents.
    */
  def qTpchQ19(spark: SparkSession, d: String): DataFrame = {
    val lineCents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    val qty = col("l_quantity")
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        qty.between(1.0, 11.0)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        qty.between(10.0, 20.0)) ||
      (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
        qty.between(20.0, 30.0))
    lineitem(spark, d)
      .join(broadcast(part(spark, d)),
        col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(sum(lineCents).as("revenue_cents"), count(lit(1)).as("n_lines"))
  }

  /** q_tpch_q11 — the TPC-H Q11 important-stock shape: keys whose
    * aggregate exceeds a FRACTION of the global aggregate — the
    * HAVING-against-scalar-subquery pattern (per-part revenue > 0.1% of
    * total revenue). The global total must come from the SAME aggregate
    * relation, not a second fact scan.
    *
    * Plan: one fact shuffle to part grain; the cut compares against the
    * 1-row total re-aggregated from the CACHED part-grain relation
    * (broadcast back). TPC-H's literal 0.0001 fraction is vacuous on a
    * near-uniform synthetic part distribution, so the cut is scale-FREE:
    * parts above 1.5× the MEAN part revenue, as the EXACT integer
    * comparison 2·rev·n_parts > 3·total — no double enters the decision
    * (the [[qPareto]] stance). Bound: rev·n_parts < 2⁶² holds through
    * ~10⁶ parts × 10¹² cents; beyond, widen to DECIMAL(38,0).
    */
  def qTpchQ11(spark: SparkSession, d: String): DataFrame = {
    val lineCents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    val perPart = graft.Tables.cacheForSelfJoin(
      lineitem(spark, d)
        .groupBy(col("l_partkey"))
        .agg(sum(lineCents).as("rev_cents")))
    val total = perPart.agg(sum(col("rev_cents")).as("total_cents"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      .filter(lit(2L) * col("rev_cents") * col("n_parts") >
        lit(3L) * col("total_cents"))
      .select(col("l_partkey").as("partkey"), col("rev_cents"))
      .orderBy(col("rev_cents").desc, col("partkey"))
  }

  /** q_tpch_q4 — the TPC-H Q4 order-priority-checking shape: how many
    * orders of one quarter-year had at least one LATE line (shipped more
    * than 60 days after the order date — the fixture's proxy for Q4's
    * commitdate < receiptdate, which the schema lacks), counted per
    * priority. The shape under test is EXISTS-as-semi-join with a
    * NON-equi conjunct: the date comparison rides the join condition, so
    * the probe emits each order AT MOST once — a rewrite to inner-join +
    * distinct would shuffle the full match multiset first.
    *
    * Plan: the year band lands in the orders scan's PushedFilters; one
    * semi-join (AQE broadcasts the filtered order side if small enough)
    * and a ≤5-row aggregate. All-integer.
    */
  def qTpchQ4(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(lineitem(spark, d),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** q_tpch_q12 — the TPC-H Q12 shipping-priority-distribution shape:
    * per return flag (the fixture's stand-in for Q12's ship mode), how
    * many lines of one ship-year belong to high-priority orders
    * (URGENT/HIGH) vs the rest — the canonical conditional-aggregation-
    * after-join readout (two CASE sums in ONE pass; a per-class
    * re-scan would double the fact traffic).
    *
    * Plan: the ship-year band lands in the lineitem scan, the order join
    * carries only (o_orderkey, o_orderpriority), and the output is
    * ≤|flags| rows. All-integer.
    */
  def qTpchQ12(spark: SparkSession, d: String): DataFrame = {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(orders(spark, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** q_tpch_q17 — the TPC-H Q17 small-quantity-order-revenue shape: the
    * revenue locked in lines whose quantity is below 20% of their part's
    * average order quantity — the canonical CORRELATED-SCALAR-AVG
    * decorrelation (the per-part average must become one aggregate
    * relation joined back, never a per-row subquery).
    *
    * Exactness: the 0.2·avg comparison is the EXACT integer cross-
    * multiplication 5·qty·n < Σqty (quantities are integral 1..50 —
    * the [[qPareto]]/[[qTpchQ11]] no-doubles-in-the-decision stance).
    * Plan: ONE fact pass builds the part-grain (Σqty, n) relation; the
    * fact re-joins it on the part key (both sides already part-keyed;
    * AQE broadcasts the aggregate side when it fits) and the survivors
    * collapse to one row. The fact subtree is cached for its self-join.
    */
  def qTpchQ17(spark: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.cacheForSelfJoin(
      lineitem(spark, d)
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
            .as("cents")))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("sq"), count(lit(1)).as("nq"))
    li.join(perPart, "l_partkey")
      .filter(lit(5L) * col("qty") * col("nq") < col("sq"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("cents")).as("small_rev_cents"))
  }

  /** q_tpch_q22 — the TPC-H Q22 global-opportunity shape: DORMANT
    * customers with above-average (positive) account balance — money
    * parked with no order since 1999 (every fixture customer has SOME
    * order, so Q22's "never ordered" is read as Q22's own 7-years-idle
    * spirit: no RECENT order) — counted and summed per nation (the
    * fixture's country code). The canonical scalar-subquery-threshold +
    * NOT-EXISTS-anti-join pair in one query.
    *
    * Exactness: the above-average cut is the integer cross-multiplication
    * cents·n > Σcents over exact balance cents — no double enters the
    * decision. Plan: the 1-row positive-balance average broadcasts onto
    * the customer scan; the anti-join probes the DATE-FILTERED orders
    * (the recency band lands in the orders scan's PushedFilters) on the
    * customer key — the only fact shuffle; output is ≤|nations| rows.
    */
  def qTpchQ22(spark: SparkSession, d: String): DataFrame = {
    val cust = graft.Tables.cacheForSelfJoin(
      customer(spark, d)
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
            .as("bal_cents")))
    val avgPos = cust.filter(col("bal_cents") > 0L)
      .agg(sum(col("bal_cents")).as("s"), count(lit(1)).as("n"))
    cust.crossJoin(broadcast(avgPos))
      .filter(col("bal_cents") * col("n") > col("s"))
      .join(orders(spark, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("totbal_cents"))
      .orderBy(col("c_nationkey"))
  }

  /** q_tpch_q2 — the TPC-H Q2 minimum-cost-supplier shape re-expressed on
    * the fixture schema (no partsupp table): for each small part
    * (p_size < 10), the supplier offering its cheapest line price — the
    * canonical ARGMIN-within-group-then-enrich pattern, where the
    * correlated `= (SELECT MIN ...)` subquery must decorrelate to one
    * per-group aggregate with a deterministic tie-break, never a per-part
    * probe.
    *
    * Plan: one fact pass to (part, supplier) offer grain; the per-part
    * argmin is a window row_number over that part-keyed relation (same
    * partitioning — no extra shuffle); winners join the supplier dim
    * broadcast and the size-filtered part dim. Tie-break (best_cents,
    * suppkey) is total, so the winner is partitioning-independent.
    */
  def qTpchQ2(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val offer = lineitem(spark, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
        .cast("long")).as("best_cents"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("best_cents"), col("l_suppkey"))
    offer.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(part(spark, d).filter(col("p_size") < 10)
        .select(col("p_partkey"), col("p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(spark, d)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("partkey"), col("p_name"),
        col("l_suppkey").as("suppkey"), col("s_name"), col("best_cents"))
      .orderBy(col("best_cents"), col("partkey"))
      .limit(100)
  }

  /** q_tpch_q7 — the TPC-H Q7 volume-shipping shape: bilateral trade —
    * revenue between one NATION PAIR in both directions, per supplier
    * nation × customer nation × ship year. The planner story is the
    * DOUBLE dimension arm: the supplier side and the customer side each
    * need their own nation decode, and the pair predicate is a
    * disjunction across the two arms that must NOT block pushing the
    * single-nation membership filter into each arm (members of {n1,n2}
    * prune each dim broadcast BEFORE the fact joins; only the
    * cross-arm pairing runs post-join).
    *
    * Plan: both nation-filtered dim maps broadcast; the year band lands
    * in the lineitem scan; the one big shuffle is fact⋈fact on the
    * order key; output is ≤ 2×years rows. Exact discounted cents.
    */
  def qTpchQ7(spark: SparkSession, d: String): DataFrame = {
    val lineCents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    val nat = nation(spark, d)
      .filter(col("n_name").isin("NATION_3", "NATION_8"))
      .select(col("n_nationkey"), col("n_name"))
    val suppN = supplier(spark, d)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custN = customer(spark, d)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(orders(spark, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(lineCents).as("revenue_cents"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** q_tpch_q8 — the TPC-H Q8 national-market-share shape: of all
    * revenue that one region's customers generated per order year, the
    * share supplied by ONE nation — the canonical conditional-sum RATIO
    * (numerator and denominator from the SAME aggregate pass; running
    * the fact twice for a ratio is the classic waste).
    *
    * Plan: region⋈nation collapses to a broadcast membership list that
    * prunes customers before the fact joins; supplier decode rides
    * broadcast; ONE fact⋈fact shuffle; the ratio divides two exact
    * BIGINT cent sums once per year row.
    */
  def qTpchQ8(spark: SparkSession, d: String): DataFrame = {
    val lineCents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    val asiaNations = nation(spark, d)
      .join(broadcast(region(spark, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val custAsia = customer(spark, d)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    lineitem(spark, d)
      .join(orders(spark, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"), "semi")
      .join(broadcast(supplier(spark, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(when(col("s_nationkey") === 3, lineCents).otherwise(0L))
        .as("nation_cents"),
        sum(lineCents).as("total_cents"))
      .select(col("o_year"), col("nation_cents"), col("total_cents"),
        (col("nation_cents").cast("double") / col("total_cents").cast("double"))
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** q_tpch_q9 — the TPC-H Q9 product-profit shape: profit per supplier
    * nation × order year over one part family (name-infix filter — the
    * non-sargable LIKE that must still prune the part dim BEFORE the
    * fact join), profit = discounted revenue − a 10%-of-retail cost
    * proxy (the schema has no partsupp.ps_supplycost; the SHAPE — a
    * 5-way join with a computed measure mixing columns of three tables
    * — is what's under test).
    *
    * Exactness: revenue in half-up cents, cost = qty × floor(retail·10
    * + 0.5) (10% of retail in exact cents) — the profit is a BIGINT
    * difference, order-independent. Plan: part (infix-filtered) and
    * supplier/nation broadcast; ONE fact⋈fact shuffle on the order key;
    * output is nations × years.
    */
  def qTpchQ9(spark: SparkSession, d: String): DataFrame = {
    val profitCents =
      floor((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        * lit(100.0) + lit(0.5)).cast("long") -
        col("l_quantity").cast("long") *
          floor(col("p_retailprice") * lit(10.0) + lit(0.5)).cast("long")
    lineitem(spark, d)
      .join(broadcast(part(spark, d).filter(col("p_name").contains("widget"))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(spark, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(spark, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(orders(spark, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(profitCents).as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** q_tpch_q16 — the TPC-H Q16 parts-supplier-relationship shape: how
    * many distinct suppliers can provide each (brand, type, size) part
    * bucket, excluding one brand and excluding flagged suppliers via
    * NOT IN — the count-distinct-by-attributes + anti-list pair. The
    * schema has no partsupp, so the part↔supplier relationship is
    * RECONSTRUCTED as `SELECT DISTINCT l_partkey, l_suppkey FROM
    * lineitem` (who actually shipped what — the materialization a real
    * warehouse without a catalog table derives); "customer complaints"
    * is read as negative account balance.
    *
    * Plan: the distinct pair relation is ONE fact hash-aggregate; the
    * anti-list and the attribute-filtered part dim ride broadcast; the
    * count-distinct re-aggregates the pair-sized relation. All-integer.
    */
  def qTpchQ16(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(supplier(spark, d).filter(col("s_acctbal") < 0.0)
        .select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part(spark, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_size") < 15)
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))

  /** q_tpch_q20 — the TPC-H Q20 excess-inventory shape re-expressed
    * without partsupp.availqty: suppliers whose 1997 shipped quantity of
    * the widget part family exceeds 1.5× the family's corpus-wide share
    * of shipping — the "who is long on this part family" screen, built
    * from the same nested-aggregate-then-threshold skeleton as Q20
    * (per-supplier family aggregate, per-supplier total aggregate, a
    * global scalar, one HAVING-style cut, then the supplier/nation
    * decode join).
    *
    * Exactness: the share cut is the integer cross-multiplication
    * 2·wq·GT > 3·t·GW (no double in the decision — [[qTpchQ11]]'s
    * stance; width: wq·GT < 2⁶² through ~10⁹ total units, beyond which
    * DECIMAL(38,0) — documented). Plan: ONE year-banded fact pass
    * cached; family and total aggregates are both supplier-grain reads
    * of it; the 1-row global broadcasts; survivors join the supplier
    * dim broadcast.
    */
  def qTpchQ20(spark: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.cacheForSelfJoin(
      lineitem(spark, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty")))
    val widgets = part(spark, d).filter(col("p_name").contains("widget"))
      .select(col("p_partkey"))
    val tot = li.groupBy(col("l_suppkey")).agg(sum(col("qty")).as("t"))
    val wid = li.join(broadcast(widgets),
      col("l_partkey") === col("p_partkey"), "semi")
      .groupBy(col("l_suppkey")).agg(sum(col("qty")).as("wq"))
    val global = wid.join(tot, "l_suppkey")
      .agg(sum(col("wq")).as("gw"), sum(col("t")).as("gt"))
    wid.join(tot, "l_suppkey")
      .crossJoin(broadcast(global))
      .filter(lit(2L) * col("wq") * col("gt") > lit(3L) * col("t") * col("gw"))
      .join(broadcast(supplier(spark, d)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(spark, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("suppkey"), col("s_name"),
        col("n_name").as("nation"), col("wq").as("widget_qty"),
        col("t").as("total_qty"))
      .orderBy(col("suppkey"))
  }

  /** q_target_encode — leave-one-out smoothed target encoding of the
    * event-type categorical against the value target: each row's encoding
    * is the mean of its category EXCLUDING the row itself, shrunk toward
    * the global prior with pseudo-count k=20 — the leakage-aware
    * categorical encoder every tabular-ML pipeline materializes (naive
    * per-category means leak the row's own label into its feature;
    * LOO + shrinkage is the standard fix).
    *
    * Plan: category moments (n, Σcents — BIGINT, map-side partial) come
    * from ONE pass over the cached base relation; every row then encodes
    * map-side against the |categories|-row broadcast — the fact shuffles
    * ZERO times beyond the moment aggregate. The prior stays global
    * (shrinkage target, standard practice). One pinned double chain,
    * mirrored verbatim in the oracle.
    */
  def qTargetEncode(spark: SparkSession, d: String): DataFrame = {
    val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    val base = graft.Tables.cacheForSelfJoin(
      events(spark, d)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"), cents.as("c")))
    val stats = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_g"), sum(col("c")).as("s_g"))
    val tot = stats.agg(sum(col("n_g")).as("n"), sum(col("s_g")).as("s"))
    base.join(broadcast(stats), "event_type")
      .crossJoin(broadcast(tot))
      .select(col("event_id"), col("event_type"),
        expr("(CAST(s_g - c AS DOUBLE) + 20.0 * (CAST(s AS DOUBLE)" +
          " / CAST(n AS DOUBLE))) / (CAST(n_g - 1 AS DOUBLE) + 20.0)")
          .as("enc_loo"))
      .orderBy(col("event_id"))
  }

  /** q_yoy — year-over-year growth of monthly order revenue: each month
    * joined to the SAME month one year earlier (a calendar join on
    * month-index − 12, robust to gaps where a 12-row LAG silently slips),
    * growth as the pinned (c − p)/p. [[qWow]] reads the week axis of the
    * events stream; this is the finance-calendar axis of the orders fact
    * — the pair every reporting layer ships.
    *
    * Plan: the fact collapses to the ~80-row monthly series (exact cents,
    * one hash agg, cached for its self-join) and everything after is
    * calendar-sized.
    */
  def qYoy(spark: SparkSession, d: String): DataFrame = {
    val monthly = graft.Tables.cacheForSelfJoin(
      orders(spark, d)
        .select((year(col("o_orderdate")) * lit(12L) +
          (month(col("o_orderdate")) - lit(1L))).as("mi"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("c"))
        .groupBy(col("mi")).agg(sum(col("c")).as("cents")))
    monthly
      .join(monthly.select((col("mi") + 12L).as("mi"),
        col("cents").as("prev_cents")), "mi")
      .select(col("mi"), col("cents"), col("prev_cents"),
        ((col("cents") - col("prev_cents")).cast("double") /
          col("prev_cents").cast("double")).as("yoy"))
      .orderBy(col("mi"))
  }

  /** q_sole_supplier — the TPC-H Q21 planner shape: suppliers ranked by
    * how many orders they fulfilled ALONE (an order with no line from
    * any other supplier) — a correlated NOT EXISTS whose subquery
    * re-references the outer fact table. The decorrelation story is the
    * point: Catalyst must rewrite the correlated anti-condition
    * (l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey ≠ l1.l_suppkey)
    * into a LEFT ANTI self-join on the order key — never a per-row
    * subquery loop — which is what makes the shape runnable at fact-
    * table scale. Written as SQL text because the surface under test IS
    * the correlated-subquery SQL form ([[Relational.qExists]] covers the
    * positive EXISTS half).
    */
  def qSoleSupplier(spark: SparkSession, d: String): DataFrame = {
    supplier(spark, d).createOrReplaceTempView("graft_supplier")
    lineitem(spark, d).createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT s.s_suppkey, s.s_name,
        |       COUNT(DISTINCT l1.l_orderkey) AS n_sole
        |FROM graft_supplier s
        |JOIN graft_lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM graft_lineitem l2
        |  WHERE l2.l_orderkey = l1.l_orderkey
        |    AND l2.l_suppkey <> l1.l_suppkey)
        |GROUP BY s.s_suppkey, s.s_name
        |ORDER BY n_sole DESC, s_suppkey
        |LIMIT 10""".stripMargin)
  }

  /** q_bloom_join — the EXPLICIT bloom-filter semi-join: the selective
    * dimension's key set (urgent orders) is sketched into ONE bloom
    * filter (Spark's own `BloomFilterAggregate`, the sketch
    * `InjectRuntimeFilter` builds internally — RuntimeFilterSpec pins
    * the automatic path; this query constructs it deliberately), pushed
    * into the fact scan as a `might_contain` predicate, and the handful
    * of false positives die in the exact join behind it. This is the
    * 100 TB join discipline written out: at scale the filter is built
    * ONCE and reused across every consumer of the same dimension cut
    * (a materialized runtime filter), and the fact side sheds ~4/5 of
    * its rows BEFORE the shuffle instead of after.
    *
    * Plan: the bloom is a 1-row scalar subquery (one pass over the
    * dimension, map-side merged sketches); the fact scan evaluates
    * xxhash64 + might_contain per row inside codegen — zero extra
    * shuffles; the exact join then carries only surviving rows. The
    * bloom is pure PRUNING — correctness never depends on it (false
    * positives are removed by the equi-join, false negatives are
    * impossible), which is why the oracle is the plain join SQL.
    */
  def qBloomJoin(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val sel = orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // The bloom predicate is version-fragile Catalyst internals,
    // quarantined in GraftSqlBridge; None ⇒ the plain (still correct,
    // just unpruned) equi-join — pruning is optional by construction.
    val mightContain = GraftSqlBridge.bloomMightContain(
      sel, xxhash64(col("o_orderkey")), xxhash64(col("l_orderkey")))
    val cents = floor(
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).cast("long")
    mightContain.fold(lineitem(spark, d))(lineitem(spark, d).filter(_))
      .join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"), sum(cents).as("revenue_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** Bloom geometry for [[qBloomFpr]]: 1024 words × 63 usable bits,
    * 4 hashes, 5000 guaranteed-non-member probes.
    */
  val BloomWords  = 1024
  val BloomHashes = 4
  val BloomProbes = 5000

  /** q_bloom_fpr — MEASURED false-positive-rate calibration of a Bloom
    * filter over the customer key set: build an m = [[BloomWords]]·63-bit
    * filter with [[BloomHashes]] portable md5 hash functions, probe it
    * with [[BloomProbes]] keys chosen ABOVE the key domain (guaranteed
    * non-members), and report the observed FPR plus the fill ratio it
    * derives from. [[qBloomJoin]] USES an engine bloom filter and trusts
    * its advertised error; this query is the calibration harness that
    * checks a filter design against reality before a pipeline bets a
    * 100 TB scan's pruning rate on it — measured FPR tracks the
    * (1 − e^(−kn/m))^k curve, and the fill ratio is the early-warning
    * number (past ~50% fill the filter is degrading).
    *
    * Determinism: hashes are the portable 60-bit md5 of `key#i` mod the
    * bit space; the filter is (word → `bit_or` of 63-bit masks) — the
    * [[graft.operators.Behavior]] bitmap-word scheme; probes test
    * bits with pure integer masks. Counts exact; the two ratios are
    * pinned divisions.
    *
    * Plan: build = one explode(×k) + word aggregate over the MEMBER set
    * (dimension-sized); the word table ([[BloomWords]] rows) BROADCASTS
    * to the probe side — probing any stream is a broadcast hash join on
    * word index + a mask test, which is exactly how the engine's own
    * runtime bloom pushdown consumes it.
    */
  def qBloomFpr(spark: SparkSession, d: String): DataFrame = {
    val m = BloomWords * 63
    def hash(key: Column, i: Int): Column =
      graft.operators.TextOps.md5Long(
        concat(key.cast("string"), lit("#"), lit(i.toString)), 15) % m
    val members = customer(spark, d).select(col("c_custkey").as("key"))
    val words = members
      .select(explode(array((1 to BloomHashes).map(i =>
        hash(col("key"), i)): _*)).as("h"))
      .groupBy(expr("h DIV 63").as("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(h % 63 AS INT)))")
        .as("mask"))
    val probes = members.agg(max(col("key")).as("mk"))
      .select(explode(sequence(col("mk") + 1L,
        col("mk") + lit(BloomProbes.toLong))).as("key"))
    val tests = probes
      .select(col("key"), explode(array((1 to BloomHashes).map(i =>
        hash(col("key"), i)): _*)).as("h"))
      .join(broadcast(words), expr("h DIV 63") === col("word"),
        "left")
      .select(col("key"),
        when(coalesce(col("mask"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 63 AS INT))"))
          =!= 0L, 1L).otherwise(0L).as("hit"))
    val perProbe = tests.groupBy(col("key"))
      .agg(sum(col("hit")).as("n_hit"))
    val fill = words.agg(sum(expr("bit_count(mask)")).as("bits_set"))
    perProbe
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("n_hit") === BloomHashes.toLong, 1L).otherwise(0L))
          .as("n_false_pos"))
      .crossJoin(broadcast(fill))
      .select(col("n_probes"), col("n_false_pos"),
        (col("n_false_pos").cast("double") / col("n_probes").cast("double"))
          .as("fpr"),
        col("bits_set"),
        (col("bits_set").cast("double") / lit(m.toDouble)).as("fill_ratio"))
  }

  /** q_hits — HITS hubs & authorities (Kleinberg 1999) on the bipartite
    * customer→part purchase graph, two unnormalized power iterations:
    * auth₁(p) = in-degree, hub₁(c) = Σ auth₁ over c's parts, auth₂(p) =
    * Σ hub₁ over p's buyers — "important parts are bought by important
    * customers, important customers buy important parts." The
    * mutual-reinforcement ranking [[qPagerank]]'s single-score walk
    * can't express on a bipartite graph; in a catalog this is the
    * influence ranking behind "anchor products".
    *
    * Determinism: normalization is deliberately DROPPED for the fixed
    * two-iteration readout, so every score is an EXACT BIGINT degree
    * convolution — the ranking is identical to the normalized one
    * (normalization is a positive global scalar per iteration) and the
    * hash gate compares integers, not float ulps. A converged solver
    * adds per-round normalization and the [[TextOps]] driver-loop
    * convergence contract.
    *
    * Plan: the edge list (distinct customer–part pairs) is built once
    * and reused for all three convolutions ([[graft.Tables
    * .cacheForSelfJoin]]); each iteration is an edge-keyed equi-join +
    * hash agg with map-side partials — edges never fan out, scores are
    * node-grain. Top-20 via TakeOrderedAndProject.
    */
  def qHits(spark: SparkSession, d: String): DataFrame = {
    val edges = graft.Tables.cacheForSelfJoin(
      orders(spark, d).select(col("o_custkey"), col("o_orderkey"))
        .join(lineitem(spark, d).select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct())
    val auth1 = edges.groupBy(col("p")).agg(count(lit(1)).as("a1"))
    val hub1 = edges.join(auth1, "p")
      .groupBy(col("c")).agg(sum(col("a1")).as("h1"))
    val auth2 = edges.join(hub1, "c")
      .groupBy(col("p")).agg(sum(col("h1")).as("a2"))
    auth2.join(auth1, "p")
      .select(col("p").as("partkey"), col("a1").as("in_deg"),
        col("a2").as("authority2"))
      .orderBy(col("authority2").desc, col("partkey"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_join"      -> qBloomJoin _,
    "q_bloom_fpr"       -> qBloomFpr _,
    "q_hits"            -> qHits _,
    "q_yoy"             -> qYoy _,
    "q_sole_supplier"   -> qSoleSupplier _,
    "q_freshness"       -> qFreshness _,
    "q_skew_report"     -> qSkewReport _,
    "q_heatmap"         -> qHeatmap _,
    "q_union_by_name"   -> qUnionByName _,
    "q_seq3"            -> qSeq3 _,
    "q_tpch_q2"         -> qTpchQ2 _,
    "q_tpch_q7"         -> qTpchQ7 _,
    "q_tpch_q16"        -> qTpchQ16 _,
    "q_tpch_q20"        -> qTpchQ20 _,
    "q_tpch_q8"         -> qTpchQ8 _,
    "q_tpch_q9"         -> qTpchQ9 _,
    "q_tpch_q4"         -> qTpchQ4 _,
    "q_tpch_q12"        -> qTpchQ12 _,
    "q_tpch_q17"        -> qTpchQ17 _,
    "q_tpch_q22"        -> qTpchQ22 _,
    "q_tpch_q6"         -> qTpchQ6 _,
    "q_tpch_q13"        -> qTpchQ13 _,
    "q_tpch_q3"         -> qTpchQ3 _,
    "q_tpch_q18"        -> qTpchQ18 _,
    "q_tpch_q5"         -> qTpchQ5 _,
    "q_tpch_q10"        -> qTpchQ10 _,
    "q_tpch_q19"        -> qTpchQ19 _,
    "q_tpch_q11"        -> qTpchQ11 _,
    "q_target_encode"   -> qTargetEncode _,
    "q_scd2"            -> qScd2 _,
    "q_scd2_apply"      -> qScd2Apply _,
    "q_snapshot_diff"   -> qSnapshotDiff _,
    "q_cogroup"         -> qCogroup _,
    "q_funnel"          -> qFunnel _,
    "q_event_gap"       -> qEventGap _,
    "q_doc_dedup"       -> qDocDedup _,
    "q_ntile"           -> qNtile _,
    "q_sample_balanced" -> qSampleBalanced _,
    "q_event_seq"       -> qEventSeq _,
    "q_corr"            -> qCorr _,
    "q_groupby_agg"     -> qGroupbyAgg _,
    "q_pricing"         -> qPricing _,
    "q_market_share"    -> qMarketShare _,
    "q_big_spenders"    -> qBigSpenders _,
    "q_except_all"      -> qExceptAll _,
    "q_intersect_all"   -> qIntersectAll _,
    "q_lateral"         -> qLateral _,
    "q_revenue_topn"    -> qRevenueTopn _,
    "q_regional_revenue" -> qRegionalRevenue _,
    "q_top_supplier"    -> qTopSupplier _,
    "q_promo_share"     -> qPromoShare _,
    "q_markov"          -> qMarkov _,
    "q_constraint_check" -> qConstraintCheck _,
    "q_incremental_agg" -> qIncrementalAgg _,
    "q_first_last"      -> qFirstLast _,
    "q_distinct"        -> qDistinct _,
    "q_approx_distinct" -> qApproxDistinct _,
    "q_approx_topk"   -> qApproxTopk _,
    "q_hll_merge"       -> qHllMerge _,
    "q_join_inner"      -> qJoinInner _,
    "q_join_left"       -> qJoinLeft _,
    "q_join_semi"       -> qJoinSemi _,
    "q_join_anti"       -> qJoinAnti _,
    "q_join_full"       -> qJoinFull _,
    "q_grouping_sets"   -> qGroupingSets _,
    "q_window_rank"     -> qWindowRank _,
    "q_percent_rank"    -> qPercentRank _,
    "q_zscore"          -> qZscore _,
    "q_skyline"         -> qSkyline _,
    "q_union"           -> qUnion _,
    "q_intersect"       -> qIntersect _,
    "q_except"          -> qExcept _,
    "q_rollup"          -> qRollup _,
    "q_cube"            -> qCube _,
    "q_dedup"           -> qDedup _,
    "q_multimodal_join" -> qMultimodalJoin _,
    "q_custom_agg"      -> qCustomAgg _,
    "q_asof_join"       -> qAsofJoin _,
    "q_quantiles"       -> qQuantiles _,
    "q_percentile_cont" -> qPercentileCont _,
    "q_winsorize"       -> qWinsorize _,
    "q_approx_quantiles" -> qApproxQuantiles _,
    "q_range_join"      -> qRangeJoin _,
    "q_profile"         -> qProfile _,
    "q_topk_group"      -> qTopkGroup _,
    "q_topk_rewrite"    -> qTopkRewrite _,
    "q_sample_hash"     -> qSampleHash _,
    "q_unpivot"         -> qUnpivot _,
    "q_salted_agg"      -> qSaltedAgg _,
    "q_salted_join"     -> qSaltedJoin _,
    "q_features"        -> qFeatures _,
    "q_pivot"           -> qPivot _,
    "q_collect_list"    -> qCollectList _,
    "q_histogram"       -> qHistogram _,
    "q_gapfill"         -> qGapfill _,
    "q_rolling_avg"     -> qRollingAvg _,
    "q_range_window"    -> qRangeWindow _,
    "q_locf"            -> qLocf _,
    "q_calendar_dim"    -> qCalendarDim _,
    "q_grouping_id"     -> qGroupingId _,
    "q_percentile_disc" -> qPercentileDisc _,
    "q_cume_dist"       -> qCumeDist _,
    "q_rolling_zscore"  -> qRollingZscore _,
    "q_anomaly"         -> qAnomaly _,
    "q_retention"       -> qRetention _,
    "q_cum_users"       -> qCumUsers _,
    "q_streaks"         -> qStreaks _,
    "q_wau"             -> qWau _,
    "q_mad"             -> qMad _,
    "q_twap"            -> qTwap _,
    "q_weighted_median" -> qWeightedMedian _,
    "q_interval_join"   -> qIntervalJoin _,
    "q_rownum_global"   -> qRownumGlobal _,
    "q_nearest_event"   -> qNearestEvent _,
    "q_geo_distance"    -> qGeoDistance _,
    "q_geo_join"        -> qGeoJoin _,
    "q_cusum"           -> qCusum _,
    "q_wow"             -> qWow _,
    "q_listagg"         -> qListagg _,
    "q_null_safe_join"  -> qNullSafeJoin _,
    "q_seasonality"     -> qSeasonality _,
    "q_time_to_convert" -> qTimeToConvert _,
    "q_multi_distinct"  -> qMultiDistinct _,
    "q_decile_lift"     -> qDecileLift _,
    "q_mode"            -> qMode _,
    "q_median"          -> qMedian _,
    "q_running_sum"     -> qRunningSum _,
  )

  private val decSum = "CAST(SUM(CAST(%s AS DECIMAL(38,6))) AS DOUBLE)"

  val oracle: Map[String, String] = Map(
    "q_bloom_fpr" -> {
      val m = BloomWords * 63
      val is = (1 to BloomHashes).mkString(", ")
      s"""WITH members AS (SELECT c_custkey AS key FROM customer),
         |h AS (
         |  SELECT ('0x' || substr(md5(CAST(key AS VARCHAR) || '#'
         |           || CAST(i AS VARCHAR)), 1, 15))::BIGINT % $m AS h
         |  FROM (SELECT key, unnest([$is]) AS i FROM members)
         |), words AS (
         |  SELECT h // 63 AS word,
         |         bit_or(CAST(1 AS BIGINT) << CAST(h % 63 AS INT)) AS mask
         |  FROM h GROUP BY word
         |), probes AS (
         |  SELECT unnest(generate_series(mk + 1, mk + $BloomProbes)) AS key
         |  FROM (SELECT MAX(key) AS mk FROM members)
         |), ph AS (
         |  SELECT key, ('0x' || substr(md5(CAST(key AS VARCHAR) || '#'
         |           || CAST(i AS VARCHAR)), 1, 15))::BIGINT % $m AS h
         |  FROM (SELECT key, unnest([$is]) AS i FROM probes)
         |), tests AS (
         |  SELECT ph.key,
         |         CASE WHEN COALESCE(w.mask, 0)
         |                & (CAST(1 AS BIGINT) << CAST(ph.h % 63 AS INT)) <> 0
         |           THEN 1 ELSE 0 END AS hit
         |  FROM ph LEFT JOIN words w ON ph.h // 63 = w.word
         |), per AS (
         |  SELECT key, CAST(SUM(hit) AS BIGINT) AS n_hit
         |  FROM tests GROUP BY key
         |), fill AS (
         |  SELECT CAST(SUM(bit_count(mask)) AS BIGINT) AS bits_set FROM words
         |)
         |SELECT COUNT(*) AS n_probes,
         |       CAST(SUM(CASE WHEN n_hit = $BloomHashes THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_false_pos,
         |       CAST(SUM(CASE WHEN n_hit = $BloomHashes THEN 1 ELSE 0 END)
         |         AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fpr,
         |       MAX(bits_set) AS bits_set,
         |       CAST(MAX(bits_set) AS DOUBLE) / $m.0 AS fill_ratio
         |FROM per, fill""".stripMargin
    },
    "q_bloom_join" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |         * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_hits" ->
      """WITH edges AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), auth1 AS (
        |  SELECT p, CAST(COUNT(*) AS BIGINT) AS a1 FROM edges GROUP BY p
        |), hub1 AS (
        |  SELECT c, CAST(SUM(a1) AS BIGINT) AS h1
        |  FROM edges JOIN auth1 USING (p) GROUP BY c
        |), auth2 AS (
        |  SELECT p, CAST(SUM(h1) AS BIGINT) AS a2
        |  FROM edges JOIN hub1 USING (c) GROUP BY p
        |)
        |SELECT p AS partkey, a1 AS in_deg, a2 AS authority2
        |FROM auth2 JOIN auth1 USING (p)
        |ORDER BY authority2 DESC, partkey LIMIT 20""".stripMargin,
    "q_yoy" ->
      """WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1)
        |              AS BIGINT) AS mi,
        |         CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |)
        |SELECT a.mi, a.cents, b.cents AS prev_cents,
        |       CAST(a.cents - b.cents AS DOUBLE)
        |         / CAST(b.cents AS DOUBLE) AS yoy
        |FROM monthly a JOIN monthly b ON a.mi = b.mi + 12
        |ORDER BY a.mi""".stripMargin,
    "q_sole_supplier" ->
      """SELECT s.s_suppkey, s.s_name,
        |       CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS n_sole
        |FROM supplier s
        |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem l2
        |  WHERE l2.l_orderkey = l1.l_orderkey
        |    AND l2.l_suppkey <> l1.l_suppkey)
        |GROUP BY s.s_suppkey, s.s_name
        |ORDER BY n_sole DESC, s_suppkey
        |LIMIT 10""".stripMargin,
    "q_heatmap" ->
      """WITH cells AS (
        |  SELECT (epoch_us(ts) // 86400000000) % 7 AS dw,
        |         CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
        |SELECT dw, hr, n,
        |       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |FROM cells CROSS JOIN t ORDER BY dw, hr""".stripMargin,
    "q_union_by_name" ->
      """WITH u AS (
        |  SELECT event_id, event_type, value, 'feed_a' AS feed
        |  FROM events WHERE event_id % 2 = 0
        |  UNION ALL
        |  SELECT event_id, event_type, NULL AS value, 'feed_b' AS feed
        |  FROM events WHERE event_id % 2 = 1
        |)
        |SELECT feed, COUNT(*) AS n,
        |       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_null_value
        |FROM u GROUP BY feed ORDER BY feed""".stripMargin,
    "q_seq3" ->
      """WITH seq AS (
        |  SELECT lag(event_type, 2) OVER (PARTITION BY user_id
        |                                  ORDER BY ts, event_id) AS e1,
        |         lag(event_type, 1) OVER (PARTITION BY user_id
        |                                  ORDER BY ts, event_id) AS e2,
        |         event_type AS e3
        |  FROM events
        |)
        |SELECT e1, e2, e3, COUNT(*) AS n
        |FROM seq WHERE e1 IS NOT NULL AND e2 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size < 15
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q20" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |), tot AS (
        |  SELECT l_suppkey, CAST(SUM(qty) AS BIGINT) AS t
        |  FROM li GROUP BY l_suppkey
        |), wid AS (
        |  SELECT l_suppkey, CAST(SUM(qty) AS BIGINT) AS wq
        |  FROM li WHERE l_partkey IN (
        |    SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        |  GROUP BY l_suppkey
        |), g AS (
        |  SELECT CAST(SUM(wq) AS BIGINT) AS gw, CAST(SUM(t) AS BIGINT) AS gt
        |  FROM wid JOIN tot USING (l_suppkey)
        |)
        |SELECT s_suppkey AS suppkey, s_name, n_name AS nation,
        |       wq AS widget_qty, t AS total_qty
        |FROM wid JOIN tot USING (l_suppkey), g
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE 2 * wq * gt > 3 * t * gw
        |ORDER BY suppkey""".stripMargin,
    "q_tpch_q7" ->
      """WITH nat AS (
        |  SELECT n_nationkey, n_name FROM nation
        |  WHERE n_name IN ('NATION_3', 'NATION_8')
        |)
        |SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |         * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nat cn ON c_nationkey = cn.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nat sn ON s_nationkey = sn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND sn.n_name <> cn.n_name
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_tpch_q8" ->
      """WITH asia AS (
        |  SELECT n_nationkey FROM nation JOIN region
        |    ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |)
        |SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(SUM(CASE WHEN s_nationkey = 3 THEN
        |         CAST(floor((l_extendedprice * (1.0 - l_discount))
        |           * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
        |         AS nation_cents,
        |       CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |         * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
        |       CAST(SUM(CASE WHEN s_nationkey = 3 THEN
        |         CAST(floor((l_extendedprice * (1.0 - l_discount))
        |           * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
        |         / CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |           * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer JOIN asia
        |    ON c_nationkey = asia.n_nationkey)
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q_tpch_q9" ->
      """SELECT n_name AS nation,
        |       CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |           * 100.0 + 0.5) AS BIGINT)
        |         - CAST(l_quantity AS BIGINT)
        |           * CAST(floor(p_retailprice * 10.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY n_name, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority,
        |       CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem
        |), pp AS (
        |  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sq,
        |         CAST(COUNT(*) AS BIGINT) AS nq
        |  FROM li GROUP BY l_partkey
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(cents) AS BIGINT) AS small_rev_cents
        |FROM li JOIN pp USING (l_partkey)
        |WHERE 5 * qty * nq < sq""".stripMargin,
    "q_tpch_q22" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer
        |), avgpos AS (
        |  SELECT CAST(SUM(bal_cents) AS BIGINT) AS s,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM cust WHERE bal_cents > 0
        |)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |       CAST(SUM(bal_cents) AS BIGINT) AS totbal_cents
        |FROM cust, avgpos
        |WHERE bal_cents * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q_tpch_q2" ->
      """WITH offer AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(MIN(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
        |           AS BIGINT) AS best_cents
        |  FROM lineitem GROUP BY l_partkey, l_suppkey
        |), ranked AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY l_partkey ORDER BY best_cents, l_suppkey) AS rn
        |  FROM offer
        |)
        |SELECT r.l_partkey AS partkey, p_name, r.l_suppkey AS suppkey,
        |       s_name, best_cents
        |FROM ranked r
        |JOIN part ON r.l_partkey = p_partkey
        |JOIN supplier ON r.l_suppkey = s_suppkey
        |WHERE rn = 1 AND p_size < 10
        |ORDER BY best_cents, partkey LIMIT 100""".stripMargin,
    "q_tpch_q6" ->
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |                * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
        |            AS BIGINT) AS revenue_e4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q13" ->
      """WITH per_cust AS (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey
        |)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM per_cust GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |         * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        |       o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate_s, o_orderpriority
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
        |)
        |SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        |       CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents,
        |       total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_cents DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |         * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |       CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents,
        |       n_name,
        |       CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |         * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, acctbal_cents, n_name
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |         * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_tpch_q11" ->
      """WITH pp AS (
        |  SELECT l_partkey AS partkey,
        |         CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount))
        |           * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem GROUP BY l_partkey
        |), t AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
        |                COUNT(*) AS n_parts FROM pp)
        |SELECT partkey, rev_cents
        |FROM pp CROSS JOIN t
        |WHERE 2 * rev_cents * n_parts > 3 * total_cents
        |ORDER BY rev_cents DESC, partkey""".stripMargin,
    "q_target_encode" ->
      """WITH b AS (
        |  SELECT event_id, event_type,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, COUNT(*) AS n_g, CAST(SUM(c) AS BIGINT) AS s_g
        |  FROM b GROUP BY event_type
        |), t AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s
        |  FROM g
        |)
        |SELECT event_id, b.event_type,
        |       (CAST(s_g - c AS DOUBLE) + 20.0 * (CAST(s AS DOUBLE)
        |         / CAST(n AS DOUBLE))) / (CAST(n_g - 1 AS DOUBLE) + 20.0)
        |         AS enc_loo
        |FROM b JOIN g ON b.event_type = g.event_type CROSS JOIN t
        |ORDER BY event_id""".stripMargin,
    "q_freshness" ->
      """WITH pt AS (
        |  SELECT event_type, CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us,
        |         COUNT(*) AS n_events
        |  FROM events GROUP BY event_type
        |), g AS (SELECT CAST(MAX(last_us) AS BIGINT) AS global_us FROM pt)
        |SELECT event_type, last_us,
        |       (global_us - last_us) // 1000000 AS lag_sec,
        |       n_events
        |FROM pt CROSS JOIN g ORDER BY event_type""".stripMargin,
    "q_skew_report" ->
      """WITH counts AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
        |), tot AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS n_keys FROM counts
        |), top AS (
        |  SELECT user_id, cnt FROM counts
        |  ORDER BY cnt DESC, user_id LIMIT 20
        |), cum AS (
        |  SELECT user_id, cnt,
        |         CAST(SUM(cnt) OVER (ORDER BY cnt DESC, user_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS cum_cnt
        |  FROM top
        |)
        |SELECT user_id, cnt,
        |       CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS share,
        |       CAST(cum_cnt AS DOUBLE) / CAST(n AS DOUBLE) AS cum_share,
        |       CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |         / CAST(n AS DOUBLE) AS ratio_to_mean
        |FROM cum CROSS JOIN tot ORDER BY cnt DESC, user_id""".stripMargin,
    "q_geo_join" ->
      """WITH anchors AS (
        |  SELECT a AS anchor_id,
        |         CAST((a * 97) % 1700 AS DOUBLE) / 10.0 - 85.0 + 0.05 AS alat,
        |         CAST((a * 131) % 3600 AS DOUBLE) / 10.0 - 180.0 + 0.05 AS alon
        |  FROM (SELECT unnest(range(0, 1000)) AS a)
        |), acell AS (
        |  SELECT anchor_id, alat, alon,
        |         CAST(floor(alat) AS BIGINT) AS cr,
        |         CAST(floor(alon) AS BIGINT) AS cc
        |  FROM anchors
        |), pos AS (
        |  SELECT event_id,
        |         CAST((((event_id % 1700000) * 2654435761) % 1700000 + 1700000) % 1700000
        |              AS DOUBLE) / 10000.0 - 85.0 AS lat,
        |         CAST((((event_id % 3600000) * 40503 + user_id) % 3600000 + 3600000) % 3600000
        |              AS DOUBLE) / 10000.0 - 180.0 AS lon
        |  FROM events
        |), probes AS (
        |  SELECT event_id, lat, lon,
        |         CAST(floor(lat) AS BIGINT) + dr AS cr,
        |         ((CAST(floor(lon) AS BIGINT) + dc + 180) % 360 + 360) % 360 - 180
        |           AS cc
        |  FROM pos,
        |       (SELECT unnest(range(-1, 2)) AS dr),
        |       (SELECT unnest(range(-1, 2)) AS dc)
        |), cand AS (
        |  SELECT p.event_id,
        |         CAST(floor(2.0 * 6371000.0 * asin(sqrt(least(
        |           sin((alat - lat) * 0.017453292519943295 / 2.0)
        |             * sin((alat - lat) * 0.017453292519943295 / 2.0)
        |           + cos(lat * 0.017453292519943295)
        |             * cos(alat * 0.017453292519943295)
        |             * (sin((alon - lon) * 0.017453292519943295 / 2.0)
        |                * sin((alon - lon) * 0.017453292519943295 / 2.0)),
        |           1.0)))) AS BIGINT) AS dist_m,
        |         anchor_id
        |  FROM probes p JOIN acell a ON p.cr = a.cr AND p.cc = a.cc
        |)
        |SELECT event_id, anchor_id, dist_m FROM (
        |  SELECT event_id, anchor_id, dist_m,
        |         row_number() OVER (PARTITION BY event_id
        |                            ORDER BY dist_m, anchor_id) AS rn
        |  FROM cand
        |) WHERE rn = 1
        |ORDER BY dist_m, event_id LIMIT 10""".stripMargin,
    "q_geo_distance" ->
      """WITH pos AS (
        |  SELECT event_id, event_type,
        |         (CAST((((event_id % 1700000) * 2654435761) % 1700000 + 1700000) % 1700000
        |               AS DOUBLE) / 10000.0) - 85.0 AS lat,
        |         (CAST((((event_id % 3600000) * 40503 + user_id) % 3600000 + 3600000) % 3600000
        |               AS DOUBLE) / 10000.0) - 180.0 AS lon
        |  FROM events
        |), h AS (
        |  SELECT event_id, event_type,
        |         sin((lat - 51.5072) * 0.017453292519943295 / 2.0)
        |           * sin((lat - 51.5072) * 0.017453292519943295 / 2.0)
        |         + cos(51.5072 * 0.017453292519943295)
        |           * cos(lat * 0.017453292519943295)
        |           * (sin((lon - -0.1276) * 0.017453292519943295 / 2.0)
        |              * sin((lon - -0.1276) * 0.017453292519943295 / 2.0)) AS a
        |  FROM pos
        |)
        |SELECT event_id, event_type,
        |       CAST(floor(2.0 * 6371000.0 * asin(sqrt(least(a, 1.0)))) AS BIGINT) AS dist_m
        |FROM h ORDER BY dist_m, event_id LIMIT 10""".stripMargin,
    "q_approx_topk" ->
      """SELECT event_type AS item, COUNT(*) AS cnt
        |FROM events GROUP BY event_type
        |ORDER BY cnt DESC, item""".stripMargin,
    "q_scd2" ->
      """SELECT user_id, event_type,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |       strftime(lead(ts, 1) OVER (PARTITION BY user_id
        |         ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S.%f') AS valid_to
        |FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |         lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |WHERE prev_type IS NULL OR prev_type <> event_type
        |ORDER BY user_id, valid_from, event_type""".stripMargin,
    // Deliberately the SAME rebuild SQL as q_scd2: the merge path must
    // reproduce the full-history rebuild bit-for-bit, which is exactly
    // the MERGE contract (close affected intervals, insert new ones,
    // leave the rest untouched).
    "q_scd2_apply" ->
      """SELECT user_id, event_type,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |       strftime(lead(ts, 1) OVER (PARTITION BY user_id
        |         ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S.%f') AS valid_to
        |FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |         lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |WHERE prev_type IS NULL OR prev_type <> event_type
        |ORDER BY user_id, valid_from, event_type""".stripMargin,
    "q_snapshot_diff" ->
      s"""WITH a AS (
         |  SELECT user_id, COUNT(*) AS old_cnt,
         |         ${decSum.format("value")} AS old_total
         |  FROM events
         |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
         |    AND ts <  TIMESTAMP '2024-01-15 00:00:00'
         |  GROUP BY user_id
         |), b AS (
         |  SELECT user_id, COUNT(*) AS new_cnt,
         |         ${decSum.format("value")} AS new_total
         |  FROM events
         |  WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'
         |    AND ts <  TIMESTAMP '2024-01-29 00:00:00'
         |  GROUP BY user_id
         |)
         |SELECT COALESCE(a.user_id, b.user_id) AS user_id,
         |       CASE WHEN a.user_id IS NULL THEN 'I'
         |            WHEN b.user_id IS NULL THEN 'D'
         |            ELSE 'U' END AS op,
         |       old_cnt, old_total, new_cnt, new_total
         |FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
         |WHERE a.user_id IS NULL OR b.user_id IS NULL
         |   OR old_cnt <> new_cnt OR old_total <> new_total
         |ORDER BY user_id""".stripMargin,
    "q_cogroup" ->
      s"""WITH e AS (
         |  SELECT user_id, COUNT(*) AS n_events,
         |         ${decSum.format("value")} AS sum_v
         |  FROM events GROUP BY user_id
         |), o AS (
         |  SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
         |         ${decSum.format("o_totalprice")} AS sum_o
         |  FROM orders GROUP BY o_custkey
         |)
         |SELECT COALESCE(e.user_id, o.user_id) AS user_id,
         |       COALESCE(n_events, 0) AS n_events, sum_v,
         |       COALESCE(n_orders, 0) AS n_orders, sum_o
         |FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
         |ORDER BY user_id""".stripMargin,
    "q_funnel" ->
      """SELECT COUNT(t_view) AS n_view,
        |       COUNT(CASE WHEN t_view <= t_click THEN TRUE END) AS n_view_click,
        |       COUNT(CASE WHEN t_view <= t_click AND t_click <= t_purchase
        |             THEN TRUE END) AS n_view_click_purchase
        |FROM (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)""".stripMargin,
    "q_event_gap" ->
      """SELECT user_id, event_id,
        |       (epoch_ms(ts) // 1000) - (epoch_ms(lag(ts, 1) OVER w) // 1000) AS gap_prev_s,
        |       (epoch_ms(lead(ts, 1) OVER w) // 1000) - (epoch_ms(ts) // 1000) AS gap_next_s
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_doc_dedup" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "q_ntile" ->
      """SELECT lang, bucket, COUNT(*) AS n,
        |       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM (
        |  SELECT lang, n_chars,
        |         ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS bucket
        |  FROM documents)
        |GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,
    "q_sample_balanced" ->
      s"""SELECT event_type, COUNT(*) AS n, ${decSum.format("value")} AS sum_v
         |FROM (
         |  SELECT event_type, value,
         |         row_number() OVER (PARTITION BY event_type
         |           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
         |  FROM events)
         |WHERE rn <= $BalancedPerStratum
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_event_seq" ->
      s"""SELECT user_id, COUNT(*) AS n_events,
         |       array_to_string(
         |         (list(event_type ORDER BY ts, event_id))[1:$SeqLen], '|') AS seq
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_corr" ->
      """SELECT event_type, CAST(n AS BIGINT) AS n,
        |       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        |            THEN (n * sxy - sx * sy) /
        |              (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |       END AS corr_vh
        |FROM (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |         CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy,
        |         CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        |  FROM (SELECT event_type, value AS x,
        |               CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS y
        |        FROM events)
        |  GROUP BY event_type)
        |ORDER BY event_type""".stripMargin,
    "q_groupby_agg" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |       ${decSum.format("l_quantity")} AS sum_qty,
         |       ${decSum.format("l_extendedprice")} AS sum_price,
         |       ${decSum.format("l_discount")} / COUNT(l_discount) AS avg_disc
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_lateral" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |)
        |SELECT c.c_custkey, l.o_orderkey, l.cents
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, cents FROM o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY cents DESC, o_orderkey LIMIT 2) l
        |ORDER BY c.c_custkey, l.cents DESC, l.o_orderkey""".stripMargin,
    "q_except_all" ->
      """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 0),
        |b AS (SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 1)
        |SELECT l_partkey, COUNT(*) AS n_surplus
        |FROM (SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM b)
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    "q_intersect_all" ->
      """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 0),
        |b AS (SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 1)
        |SELECT l_partkey, COUNT(*) AS n_common
        |FROM (SELECT l_partkey FROM a INTERSECT ALL SELECT l_partkey FROM b)
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    "q_market_share" ->
      """WITH sn AS (
        |  SELECT s_suppkey, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |), cells AS (
        |  SELECT strftime(date_trunc('month', o.o_orderdate),
        |           '%Y-%m-%d %H:%M:%S') AS month_s,
        |         sn.n_name,
        |         CAST(SUM(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount))
        |               * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN sn ON l.l_suppkey = sn.s_suppkey
        |  GROUP BY month_s, sn.n_name
        |)
        |SELECT month_s, n_name, rev_cents,
        |       CAST(rev_cents AS DOUBLE) /
        |         CAST(SUM(rev_cents) OVER (PARTITION BY month_s) AS DOUBLE)
        |         AS share
        |FROM cells ORDER BY month_s, n_name""".stripMargin,
    "q_big_spenders" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, o_custkey, o_orderdate,
         |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders
         |), sp AS (
         |  SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS total_cents FROM o
         |  GROUP BY o_custkey HAVING SUM(cents) > $BigSpenderCents
         |)
         |SELECT c.c_name, o.o_custkey, sp.total_cents, o.o_orderkey,
         |       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date_s,
         |       o.cents AS order_cents
         |FROM o JOIN sp ON o.o_custkey = sp.o_custkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |ORDER BY sp.total_cents DESC, o.o_custkey, o.o_orderkey""".stripMargin,
    "q_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       ${decSum.format("l_quantity")} AS sum_qty,
         |       ${decSum.format("l_extendedprice")} AS sum_base_price,
         |       ${decSum.format("l_extendedprice * (1.0 - l_discount)")}
         |         AS sum_disc_price,
         |       ${decSum.format(
                   "(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)")}
         |         AS sum_charge,
         |       ${decSum.format("l_quantity")} / COUNT(l_quantity) AS avg_qty,
         |       ${decSum.format("l_extendedprice")} / COUNT(l_extendedprice)
         |         AS avg_price,
         |       ${decSum.format("l_discount")} / COUNT(l_discount) AS avg_disc,
         |       COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_regional_revenue" ->
      s"""SELECT n_name,
         |       ${decSum.format("l_extendedprice * (1.0 - l_discount)")}
         |         AS revenue,
         |       COUNT(*) AS n_items
         |FROM lineitem, orders, customer, supplier, nation, region
         |WHERE l_orderkey = o_orderkey
         |  AND o_custkey = c_custkey
         |  AND l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey
         |  AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |                  AS DECIMAL(38,6))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_promo_share" ->
      """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                THEN CAST(l_extendedprice * (1.0 - l_discount)
        |                          AS DECIMAL(38,6)) END) AS DOUBLE)
        |       * 100.0 /
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |                     AS DECIMAL(38,6))) AS DOUBLE) AS promo_share,
        |       COUNT(*) AS n_items
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'""".stripMargin,
    "q_markov" ->
      """WITH seq AS (
        |  SELECT event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events
        |), trans AS (
        |  SELECT prev, event_type AS cur, COUNT(*) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur
        |)
        |SELECT prev, cur, n,
        |       CAST(n AS DOUBLE) /
        |       CAST(SUM(n) OVER (PARTITION BY prev) AS DOUBLE) AS p
        |FROM trans ORDER BY prev, cur""".stripMargin,
    "q_constraint_check" ->
      """WITH uniq AS (
        |  SELECT 'unique_o_orderkey' AS "constraint",
        |         CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 END), 0)
        |              AS BIGINT) AS n_violations,
        |         COUNT(*) AS n_checked
        |  FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders
        |        GROUP BY o_orderkey)
        |), fk AS (
        |  SELECT 'fk_lineitem_orders' AS "constraint",
        |         (SELECT COUNT(*) FROM lineitem
        |          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |           AS n_violations,
        |         (SELECT COUNT(*) FROM lineitem) AS n_checked
        |), rng AS (
        |  SELECT 'range_l_discount_0_1' AS "constraint",
        |         CAST(COALESCE(SUM(CASE WHEN l_discount < 0.0
        |                OR l_discount > 1.0 THEN 1 END), 0)
        |              AS BIGINT) AS n_violations,
        |         COUNT(*) AS n_checked
        |  FROM lineitem
        |), nn AS (
        |  SELECT 'notnull_c_custkey' AS "constraint",
        |         COUNT(*) - COUNT(c_custkey) AS n_violations,
        |         COUNT(*) AS n_checked
        |  FROM customer
        |)
        |SELECT * FROM uniq UNION ALL SELECT * FROM fk
        |UNION ALL SELECT * FROM rng UNION ALL SELECT * FROM nn
        |ORDER BY "constraint"""".stripMargin,
    "q_incremental_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
        |       MIN(value) AS min_v, MAX(value) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_first_last" ->
      """SELECT DISTINCT user_id,
        |       first_value(event_type) OVER w AS first_type,
        |       last_value(event_type) OVER w AS last_type,
        |       nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin,
    "q_revenue_topn" ->
      s"""SELECT o_orderkey,
         |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
         |       o_orderpriority,
         |       ${decSum.format("l_extendedprice * (1.0 - l_discount)")}
         |         AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING'
         |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_join_inner" ->
      s"""SELECT n_name, COUNT(*) AS n_orders,
         |       ${decSum.format("o_totalprice")} AS revenue
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_left" ->
      s"""SELECT c_custkey, c_name, COUNT(o_custkey) AS n_orders,
         |       COALESCE(${decSum.format("o_totalprice")}, 0) AS spend
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_full" ->
      """SELECT c_custkey, c_name, o_orderkey
        |FROM customer
        |FULL OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
        |                 WHERE o_totalprice > 450000) o
        |  ON c_custkey = o.o_custkey
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |       ${decSum.format("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |                        (l_returnflag), ())
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""".stripMargin,
    "q_window_rank" ->
      """SELECT event_id, user_id,
        |       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
        |       LAG(value, 1) OVER w AS lag_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_percent_rank" ->
      """SELECT event_id, event_type, value,
        |       PERCENT_RANK() OVER w AS pr,
        |       CUME_DIST() OVER w AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value)
        |ORDER BY event_id""".stripMargin,
    "q_zscore" ->
      """SELECT e.event_id, e.event_type, e.value,
        |       CASE WHEN (n * sxx - sx * sx) > 0
        |            THEN (e.value - sx / n)
        |                   / (sqrt(n * sxx - sx * sx) / n)
        |       END AS z
        |FROM events e JOIN (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
        |           AS sxx
        |  FROM events GROUP BY event_type) s
        |  ON e.event_type = s.event_type
        |ORDER BY e.event_id""".stripMargin,
    "q_skyline" ->
      s"""WITH pu AS (
         |  SELECT user_id, COUNT(*) AS n, ${decSum.format("value")} AS sum_v
         |  FROM events GROUP BY user_id
         |)
         |SELECT user_id, n, sum_v FROM pu u
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM pu w
         |  WHERE w.n >= u.n AND w.sum_v >= u.sum_v
         |    AND (w.n > u.n OR w.sum_v > u.sum_v))
         |ORDER BY n DESC, sum_v DESC, user_id""".stripMargin,
    "q_union" ->
      """SELECT event_id FROM events WHERE event_type = 'purchase'
        |UNION
        |SELECT event_id FROM events WHERE value > 400
        |ORDER BY event_id""".stripMargin,
    "q_intersect" ->
      """SELECT event_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT event_id FROM events WHERE value > 200
        |ORDER BY event_id""".stripMargin,
    "q_except" ->
      """SELECT event_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT event_id FROM events WHERE value > 200
        |ORDER BY event_id""".stripMargin,
    "q_rollup" ->
      s"""SELECT CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
         |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
         |       COALESCE(l_returnflag, 'ALL') AS flag,
         |       COALESCE(l_linestatus, 'ALL') AS status,
         |       COUNT(*) AS n, ${decSum.format("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY g_flag, g_status, flag, status""".stripMargin,
    "q_cube" ->
      s"""SELECT CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
         |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
         |       COALESCE(l_returnflag, 'ALL') AS flag,
         |       COALESCE(l_linestatus, 'ALL') AS status,
         |       COUNT(*) AS n, ${decSum.format("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY g_flag, g_status, flag, status""".stripMargin,
    "q_dedup" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_event_id
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q_multimodal_join" ->
      """SELECT doc_id, lang, label, CAST(len(embedding) AS INTEGER) AS dim,
        |       embedding[1] AS f0, n_chars
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
    "q_salted_agg" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |       ${decSum.format("value")} AS sum_v
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_features" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |       COUNT(CASE WHEN event_type = 'purchase' THEN TRUE END) AS n_purchase,
        |       COUNT(CASE WHEN event_type = 'error' THEN TRUE END) AS n_error,
        |       epoch_ms(MIN(ts)) // 1000 AS first_s,
        |       epoch_ms(MAX(ts)) // 1000 AS last_s,
        |       CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS mean_v
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // The UNSALTED join — proves the salted rewrite preserves semantics.
    "q_salted_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |       ${decSum.format("value")} AS sum_v
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |       COUNT(*) FILTER (event_type = 'click') AS click,
        |       COUNT(*) FILTER (event_type = 'error') AS error,
        |       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |       COUNT(*) FILTER (event_type = 'signup') AS signup,
        |       COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_collect_list" ->
      """SELECT user_id,
        |       array_to_string(list(event_id ORDER BY event_id), ',') AS ids
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(FLOOR(value / 50) AS INTEGER) AS bucket, COUNT(*) AS n
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_gapfill" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        |  FROM events GROUP BY event_type, h
        |), s AS (
        |  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM c GROUP BY event_type
        |), g AS (
        |  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM s
        |)
        |SELECT g.event_type, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS h_s,
        |       COALESCE(n, 0) AS n
        |FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h
        |ORDER BY g.event_type, h_s""".stripMargin,
    "q_locf" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value
        |  FROM events
        |)
        |SELECT user_id, event_id, value,
        |       last_value(value IGNORE NULLS) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff
        |FROM e ORDER BY user_id, event_id""".stripMargin,
    "q_calendar_dim" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |           AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY day
        |), spine AS (
        |  SELECT unnest(generate_series(
        |    (SELECT date_trunc('day', MIN(o_orderdate)) FROM orders),
        |    (SELECT date_trunc('day', MAX(o_orderdate)) FROM orders),
        |    INTERVAL 1 DAY)) AS day
        |)
        |SELECT strftime(s.day, '%Y-%m-%d %H:%M:%S') AS day_s,
        |       CAST(((date_diff('day', DATE '1995-01-02', s.day) % 7) + 7) % 7
        |         AS BIGINT) AS dow,
        |       ((date_diff('day', DATE '1995-01-02', s.day) % 7) + 7) % 7 >= 5
        |         AS is_weekend,
        |       CAST(month(s.day) AS BIGINT) AS month,
        |       CAST(quarter(s.day) AS BIGINT) AS quarter,
        |       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
        |       CAST(COALESCE(rev_cents, 0) AS BIGINT) AS rev_cents
        |FROM spine s LEFT JOIN daily d ON s.day = d.day
        |ORDER BY day_s""".stripMargin,
    "q_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS rev_cents,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
        |         AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q_rolling_zscore" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |), m AS (
        |  SELECT event_type, event_id, c,
        |         CAST(COUNT(*) OVER w AS BIGINT) AS n,
        |         CAST(SUM(c) OVER w AS BIGINT) AS s,
        |         CAST(SUM(c * c) OVER w AS BIGINT) AS ss
        |  FROM e
        |  WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id
        |               ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, event_id, c, n,
        |       CASE WHEN n >= 30 AND n * ss > s * s THEN
        |         (CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |           / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
        |               * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |             / CAST(n AS DOUBLE))
        |       END AS z
        |FROM m ORDER BY event_type, event_id""".stripMargin,
    "q_cume_dist" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL
        |)
        |SELECT event_type, event_id, cents,
        |       cume_dist() OVER (PARTITION BY event_type ORDER BY cents) AS cd
        |FROM e ORDER BY event_type, event_id""".stripMargin,
    "q_percentile_disc" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events WHERE value IS NOT NULL
        |)
        |SELECT event_type,
        |       MAX(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
        |                THEN value END) AS p50,
        |       MAX(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT)
        |                THEN value END) AS p90,
        |       MAX(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT)
        |                THEN value END) AS p99
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_range_window" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |)
        |SELECT event_type, event_id, us,
        |       CAST(SUM(c) OVER w AS BIGINT) AS hour_cents,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_hour
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, event_id""".stripMargin,
    "q_rolling_avg" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        |  FROM events GROUP BY event_type, h
        |), s AS (
        |  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM c GROUP BY event_type
        |), g AS (
        |  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM s
        |), dense AS (
        |  SELECT g.event_type, g.h, COALESCE(n, 0) AS n
        |  FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h
        |)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS h_s, n,
        |       CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg7h
        |FROM dense
        |WINDOW w AS (PARTITION BY event_type ORDER BY h
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, h_s""".stripMargin,
    "q_anomaly" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        |  FROM events GROUP BY event_type, h
        |), s AS (
        |  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM c GROUP BY event_type
        |), g AS (
        |  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM s
        |), dense AS (
        |  SELECT g.event_type, g.h, COALESCE(n, 0) AS n
        |  FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h
        |), stats AS (
        |  SELECT event_type, h, n,
        |         SUM(n) OVER w AS sx, SUM(n*n) OVER w AS sxx,
        |         COUNT(*) OVER w AS cnt
        |  FROM dense WINDOW w AS (PARTITION BY event_type)
        |)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS h_s, n,
        |       CAST(n*cnt - sx AS DOUBLE)
        |         / SQRT(CAST(cnt*sxx - sx*sx AS DOUBLE)) AS z
        |FROM stats
        |WHERE (n*cnt - sx)*(n*cnt - sx) > 9*(cnt*sxx - sx*sx)
        |ORDER BY event_type, h_s""".stripMargin,
    "q_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        |), c AS (
        |  SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id
        |)
        |SELECT strftime(c.cohort, '%Y-%m-%d %H:%M:%S') AS cohort_s,
        |       CAST(date_diff('day', c.cohort, ud.day) AS BIGINT) AS day_offset,
        |       COUNT(*) AS n_users
        |FROM ud JOIN c ON ud.user_id = c.user_id
        |GROUP BY cohort_s, day_offset
        |ORDER BY cohort_s, day_offset""".stripMargin,
    "q_cum_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        |), dau AS (
        |  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
        |), fi AS (
        |  SELECT user_id, MIN(day) AS day FROM ud GROUP BY user_id
        |), nw AS (
        |  SELECT day, COUNT(*) AS new_users FROM fi GROUP BY day
        |)
        |SELECT strftime(dau.day, '%Y-%m-%d %H:%M:%S') AS day_s, dau.dau AS dau,
        |       COALESCE(nw.new_users, 0) AS new_users,
        |       CAST(SUM(COALESCE(nw.new_users, 0))
        |         OVER (ORDER BY dau.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |         AS cum_users
        |FROM dau LEFT JOIN nw ON dau.day = nw.day
        |ORDER BY day_s""".stripMargin,
    "q_decile_lift" ->
      """WITH pu AS (
        |  SELECT user_id, COUNT(*) AS score,
        |         CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
        |                            THEN value ELSE 0.0 END
        |                       AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |  FROM events GROUP BY user_id
        |), t AS (
        |  SELECT CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE) AS tot_rev,
        |         COUNT(*) AS n_users
        |  FROM pu
        |), dd AS (
        |  SELECT CAST(ntile(10) OVER (ORDER BY score DESC, user_id) AS BIGINT)
        |           AS decile,
        |         revenue
        |  FROM pu
        |), agg AS (
        |  SELECT decile, COUNT(*) AS n_users_d,
        |         CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE) AS rev_d
        |  FROM dd GROUP BY decile
        |)
        |SELECT decile, n_users_d,
        |       rev_d / tot_rev AS rev_share,
        |       (rev_d / tot_rev) / 0.1 AS lift,
        |       SUM(rev_d / tot_rev) OVER (ORDER BY decile
        |         ROWS UNBOUNDED PRECEDING) AS cum_share
        |FROM agg CROSS JOIN t ORDER BY decile""".stripMargin,
    "q_multi_distinct" ->
      """SELECT COUNT(*) AS n_rows,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(DISTINCT event_type) AS n_types,
        |       COUNT(DISTINCT date_trunc('day', ts)) AS n_days
        |FROM events""".stripMargin,
    "q_seasonality" ->
      """WITH cells AS (
        |  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |         CAST(hour(ts) AS BIGINT) AS hod, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2
        |), dm AS (SELECT dow, CAST(SUM(c) AS BIGINT) AS sd, COUNT(*) AS nd
        |          FROM cells GROUP BY dow),
        |hm AS (SELECT hod, CAST(SUM(c) AS BIGINT) AS sh, COUNT(*) AS nh
        |       FROM cells GROUP BY hod),
        |g AS (SELECT CAST(SUM(c) AS BIGINT) AS sg, COUNT(*) AS ng FROM cells)
        |SELECT dow, hod, c,
        |       CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE) AS dow_mean,
        |       CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE) AS hod_mean,
        |       CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS grand_mean,
        |       CAST(c AS DOUBLE)
        |         - CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE)
        |         - CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE)
        |         + CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS residual
        |FROM cells JOIN dm USING (dow) JOIN hm USING (hod) CROSS JOIN g
        |ORDER BY dow, hod""".stripMargin,
    "q_time_to_convert" ->
      """WITH s AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS s_us
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), p AS (
        |  SELECT user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'
        |), d AS (
        |  SELECT s.user_id, s.s_us,
        |         CAST(MIN(p.p_us - s.s_us) AS BIGINT) AS delay_us
        |  FROM s JOIN p ON s.user_id = p.user_id
        |  WHERE p.p_us >= s.s_us
        |  GROUP BY s.user_id, s.s_us
        |), dd AS (
        |  SELECT user_id,
        |         CAST(dayofweek(make_timestamp(s_us)) + 1 AS BIGINT) AS dow,
        |         delay_us
        |  FROM d
        |), r AS (
        |  SELECT dow, delay_us, user_id,
        |         row_number() OVER (PARTITION BY dow
        |           ORDER BY delay_us, user_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY dow) AS cnt,
        |         CAST(MAX(delay_us) OVER (PARTITION BY dow) AS BIGINT) AS mx
        |  FROM dd
        |)
        |SELECT dow, cnt AS n_converted, delay_us AS median_delay_us,
        |       mx AS max_delay_us
        |FROM r WHERE rn = (cnt + 1) // 2 ORDER BY dow""".stripMargin,
    "q_null_safe_join" ->
      """WITH m(mk, category) AS (
        |  VALUES ('view', 'browse'), ('click', 'browse'),
        |         ('purchase', 'commerce'), ('signup', 'account'),
        |         (NULL, 'incident')
        |), e AS (
        |  SELECT nullif(event_type, 'error') AS k FROM events
        |)
        |SELECT category, COUNT(*) AS n
        |FROM e JOIN m ON e.k IS NOT DISTINCT FROM m.mk
        |GROUP BY category ORDER BY category""".stripMargin,
    "q_listagg" ->
      """SELECT user_id,
        |       string_agg(DISTINCT event_type, ',' ORDER BY event_type)
        |         AS types_csv,
        |       COUNT(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_cusum" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, date_trunc('hour', ts)
        |), scored AS (
        |  SELECT event_type, h,
        |         SUM(x) OVER (PARTITION BY event_type ORDER BY h
        |                      ROWS UNBOUNDED PRECEDING) AS cum,
        |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
        |              AS BIGINT) AS t,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n,
        |         SUM(x) OVER (PARTITION BY event_type) AS sx
        |  FROM hourly
        |), d AS (
        |  SELECT event_type, h, t, n,
        |         ABS(n * cum - t * sx) AS absd,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY ABS(n * cum - t * sx) DESC, h) AS rn
        |  FROM scored
        |)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS cp_hour,
        |       t AS cp_index, n AS n_hours,
        |       CAST(absd AS DOUBLE) / CAST(n AS DOUBLE) AS s_max
        |FROM d WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_wow" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |         COUNT(*) AS x
        |  FROM events GROUP BY event_type, date_trunc('day', ts)
        |)
        |SELECT a.event_type,
        |       strftime(a.day, '%Y-%m-%d %H:%M:%S') AS day_s,
        |       a.x AS x, b.x AS x_prev,
        |       CAST(a.x - b.x AS DOUBLE) / CAST(b.x AS DOUBLE) AS wow_growth
        |FROM daily a LEFT JOIN daily b
        |  ON a.event_type = b.event_type AND a.day = b.day + INTERVAL 7 DAY
        |ORDER BY a.event_type, day_s""".stripMargin,
    "q_nearest_event" ->
      """WITH tagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(event_type = 'error' AS INTEGER) AS is_err,
        |         CASE WHEN event_type = 'error' THEN epoch_us(ts) END AS err_us
        |  FROM events WHERE event_type IN ('purchase', 'error')
        |), fr AS (
        |  SELECT user_id, event_id, us, is_err,
        |         last_value(err_us IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY us, is_err DESC, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b,
        |         first_value(err_us IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY us, is_err DESC, event_id
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f
        |  FROM tagged
        |)
        |SELECT user_id, event_id, us,
        |       CASE WHEN b IS NULL AND f IS NULL THEN NULL
        |            WHEN f IS NULL OR (b IS NOT NULL AND (us - b) <= (f - us))
        |              THEN us - b
        |            ELSE f - us END AS dt_us,
        |       CASE WHEN b IS NULL AND f IS NULL THEN NULL
        |            WHEN f IS NULL OR (b IS NOT NULL AND (us - b) <= (f - us))
        |              THEN 'before'
        |            ELSE 'after' END AS direction
        |FROM fr WHERE is_err = 0 ORDER BY event_id""".stripMargin,
    "q_rownum_global" ->
      """SELECT event_id,
        |       row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn
        |FROM events ORDER BY event_id""".stripMargin,
    "q_interval_join" ->
      s"""WITH ue AS (
         |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
         |), sf AS (
         |  SELECT user_id, us, event_id,
         |         CASE WHEN us - lag(us) OVER (PARTITION BY user_id
         |                ORDER BY us, event_id) > $IvSessionGapUs
         |              THEN 1 ELSE 0 END AS new
         |  FROM ue
         |), sg AS (
         |  SELECT user_id, us,
         |         SUM(new) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                        ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM sf
         |), sessions AS (
         |  SELECT user_id, MIN(us) AS ss, MAX(us) AS se
         |  FROM sg GROUP BY user_id, sid
         |), bf AS (
         |  SELECT event_type, us, event_id,
         |         CASE WHEN us - lag(us) OVER (PARTITION BY event_type
         |                ORDER BY us, event_id) > $IvBurstGapUs
         |              THEN 1 ELSE 0 END AS new
         |  FROM ue
         |), bg AS (
         |  SELECT event_type, us,
         |         SUM(new) OVER (PARTITION BY event_type ORDER BY us, event_id
         |                        ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM bf
         |), bursts AS (
         |  SELECT event_type, MIN(us) AS bs, MAX(us) AS be
         |  FROM bg GROUP BY event_type, sid
         |)
         |SELECT event_type, COUNT(*) AS n_pairs,
         |       CAST(SUM(least(se, be) - greatest(ss, bs)) AS BIGINT)
         |         AS overlap_us
         |FROM sessions s JOIN bursts b
         |  ON s.ss <= b.be AND b.bs <= s.se
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_weighted_median" ->
      """WITH w AS (
        |  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
        |         CAST(l_quantity AS BIGINT) AS w,
        |         SUM(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |           ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag) AS tot
        |  FROM lineitem
        |), sel AS (
        |  SELECT l_returnflag, l_extendedprice, tot,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
        |  FROM w WHERE cum * 2 >= tot
        |)
        |SELECT l_returnflag, l_extendedprice AS wmedian_price,
        |       CAST(tot AS BIGINT) AS total_qty
        |FROM sel WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "q_twap" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, value,
        |         lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS nxt
        |  FROM events
        |), h AS (
        |  SELECT user_id, (nxt - us) // 1000 AS dur_ms,
        |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_uv
        |  FROM o WHERE nxt IS NOT NULL
        |)
        |SELECT user_id, COUNT(*) AS n_holds,
        |       CAST(SUM(dur_ms) AS BIGINT) AS span_ms,
        |       CAST(CAST(SUM(v_uv * dur_ms) AS BIGINT) AS DOUBLE)
        |         / (1000000.0 * CAST(CAST(SUM(dur_ms) AS BIGINT) AS DOUBLE)) AS twap
        |FROM h GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_mad" ->
      """WITH med AS (
        |  SELECT event_type, value AS med FROM (
        |    SELECT event_type, value, event_id,
        |           row_number() OVER (PARTITION BY event_type
        |                              ORDER BY value, event_id) AS rn,
        |           COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM events
        |  ) WHERE rn = (cnt + 1) // 2
        |), dev AS (
        |  SELECT e.event_type, e.event_id, ABS(e.value - m.med) AS dev, m.med
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |), mad AS (
        |  SELECT event_type, dev AS mad FROM (
        |    SELECT event_type, dev, event_id,
        |           row_number() OVER (PARTITION BY event_type
        |                              ORDER BY dev, event_id) AS rn,
        |           COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM dev
        |  ) WHERE rn = (cnt + 1) // 2
        |)
        |SELECT d.event_type, COUNT(*) AS n,
        |       MIN(d.med) AS median_v, MIN(a.mad) AS mad,
        |       1.4826 * MIN(a.mad) AS sigma_hat,
        |       CAST(SUM(CASE WHEN d.dev > (3.0 * 1.4826) * a.mad
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad a ON d.event_type = a.event_type
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "q_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(date_trunc('day', ts)) // 86400000000 AS dy
        |  FROM events
        |), days AS (SELECT DISTINCT dy FROM ud),
        |dau AS (SELECT dy, COUNT(*) AS dau FROM ud GROUP BY dy),
        |contrib AS (
        |  SELECT DISTINCT user_id, dy + o AS td
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o)
        |), wau AS (
        |  SELECT td, COUNT(*) AS wau
        |  FROM contrib JOIN days ON contrib.td = days.dy
        |  GROUP BY td
        |)
        |SELECT strftime(make_timestamp(dau.dy * 86400000000),
        |         '%Y-%m-%d %H:%M:%S') AS day_s,
        |       dau.dau AS dau, wau.wau AS wau,
        |       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON dau.dy = wau.td
        |ORDER BY day_s""".stripMargin,
    "q_streaks" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(date_trunc('day', ts)) // 86400000000 AS dy
        |  FROM events
        |), g AS (
        |  SELECT user_id, dy,
        |         dy - row_number() OVER (PARTITION BY user_id ORDER BY dy) AS grp
        |  FROM ud
        |), i AS (
        |  SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY user_id, grp
        |)
        |SELECT user_id, COUNT(*) AS n_islands,
        |       CAST(SUM(len) AS BIGINT) AS active_days,
        |       CAST(MAX(len) AS BIGINT) AS longest_streak
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_mode" ->
      """SELECT user_id, event_type AS mode_type, n AS top_n FROM (
        |  SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY user_id, event_type)
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
        |                           ORDER BY n DESC, event_type) = 1
        |ORDER BY user_id""".stripMargin,
    "q_median" ->
      """SELECT event_type, value AS median_v FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
        |                           ORDER BY value, event_id)
        |        = (COUNT(*) OVER (PARTITION BY event_type) + 1) // 2
        |ORDER BY event_type""".stripMargin,
    "q_running_sum" ->
      """SELECT user_id, event_id,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_custom_agg" ->
      """SELECT event_type, event_id AS best_id, value AS best_value
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
        |                           ORDER BY value DESC, event_id ASC) = 1
        |ORDER BY event_type""".stripMargin,
    "q_sample_hash" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |       ${decSum.format("value")} AS sum_v
         |FROM events
         |WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 20 = 0
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "q_topk_group" ->
      """SELECT event_type, event_id, value FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
        |                           ORDER BY value DESC, event_id) <= 3
        |ORDER BY event_type, value DESC, event_id""".stripMargin,
    "q_topk_rewrite" ->
      """SELECT event_type, event_id, value FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
        |                           ORDER BY value DESC, event_id) <= 3
        |ORDER BY event_type, value DESC, event_id""".stripMargin,
    "q_range_join" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a_id, b_id""".stripMargin,
    "q_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = "COUNT(*) AS n_rows, " + cols.map { c =>
        s"COUNT($c) AS nn_$c, COUNT(DISTINCT $c) AS ndv_$c, " +
        s"MIN($c) AS min_$c, MAX($c) AS max_$c, ${decSum.format(c)} AS sum_$c"
      }.mkString(", ")
      val rows = cols.map { c =>
        s"SELECT '$c' AS col_name, n_rows, nn_$c AS n_nonnull, ndv_$c AS ndv, " +
        s"min_$c AS min_v, max_$c AS max_v, sum_$c AS sum_v FROM s"
      }.mkString("\nUNION ALL\n")
      s"WITH s AS (SELECT $aggs FROM lineitem)\n$rows\nORDER BY col_name"
    },
    // Exact-domain gate (see qApproxQuantiles scaladoc): under the GK
    // accuracy the sketch retains every sample and returns the exact
    // rank-⌈p·n⌉ element — quantile_disc's selection rule.
    "q_approx_quantiles" ->
      """SELECT event_type,
        |       quantile_disc(value, 0.25) AS p25,
        |       quantile_disc(value, 0.5) AS p50,
        |       quantile_disc(value, 0.75) AS p75
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_quantiles" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events)
        |SELECT event_type,
        |       MAX(CASE WHEN rn = (cnt + 3) // 4 THEN value END) AS p25,
        |       MAX(CASE WHEN rn = (cnt + 1) // 2 THEN value END) AS p50,
        |       MAX(CASE WHEN rn = (3 * cnt + 3) // 4 THEN value END) AS p75
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_percentile_cont" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events
        |), m AS (
        |  SELECT event_type,
        |    MAX(CASE WHEN rn = CAST(FLOOR(1.0 + 0.5 * CAST(cnt - 1 AS DOUBLE))
        |                            AS BIGINT) THEN value END) AS v_lo50,
        |    MAX(CASE WHEN rn = LEAST(CAST(FLOOR(1.0 + 0.5 * CAST(cnt - 1 AS DOUBLE))
        |                                  AS BIGINT) + 1, cnt) THEN value END) AS v_hi50,
        |    MAX((1.0 + 0.5 * CAST(cnt - 1 AS DOUBLE))
        |        - FLOOR(1.0 + 0.5 * CAST(cnt - 1 AS DOUBLE))) AS frac50,
        |    MAX(CASE WHEN rn = CAST(FLOOR(1.0 + 0.9 * CAST(cnt - 1 AS DOUBLE))
        |                            AS BIGINT) THEN value END) AS v_lo90,
        |    MAX(CASE WHEN rn = LEAST(CAST(FLOOR(1.0 + 0.9 * CAST(cnt - 1 AS DOUBLE))
        |                                  AS BIGINT) + 1, cnt) THEN value END) AS v_hi90,
        |    MAX((1.0 + 0.9 * CAST(cnt - 1 AS DOUBLE))
        |        - FLOOR(1.0 + 0.9 * CAST(cnt - 1 AS DOUBLE))) AS frac90
        |  FROM ranked GROUP BY event_type
        |)
        |SELECT event_type,
        |       v_lo50 + ((v_hi50 - v_lo50) * frac50) AS p50_c,
        |       v_lo90 + ((v_hi90 - v_lo90) * frac90) AS p90_c
        |FROM m ORDER BY event_type""".stripMargin,
    "q_winsorize" ->
      """WITH ranked AS (
        |  SELECT event_type, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events
        |), q AS (
        |  SELECT event_type, event_id, value,
        |         MAX(CASE WHEN rn = (cnt + 3) // 4 THEN value END)
        |           OVER (PARTITION BY event_type) AS p25,
        |         MAX(CASE WHEN rn = (3 * cnt + 3) // 4 THEN value END)
        |           OVER (PARTITION BY event_type) AS p75
        |  FROM ranked
        |)
        |SELECT event_id, event_type, value,
        |       CASE WHEN value < p25 - (1.5 * (p75 - p25))
        |              THEN p25 - (1.5 * (p75 - p25))
        |            WHEN value > p75 + (1.5 * (p75 - p25))
        |              THEN p75 + (1.5 * (p75 - p25))
        |            ELSE value END AS clipped
        |FROM q ORDER BY event_id""".stripMargin,
    // The oracle states the AS-OF contract declaratively (latest qualifying
    // order date, then highest key at that date) — deliberately NOT the
    // union-window rewrite, so the two engines reach the same answer by
    // different plans.
    "q_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |       (SELECT MAX(o.o_orderkey) FROM orders o
        |        WHERE o.o_custkey = e.user_id
        |          AND o.o_orderdate =
        |              (SELECT MAX(o2.o_orderdate) FROM orders o2
        |               WHERE o2.o_custkey = e.user_id
        |                 AND o2.o_orderdate <= e.ts)) AS asof_order_key
        |FROM events e ORDER BY e.event_id""".stripMargin,
  )
}
