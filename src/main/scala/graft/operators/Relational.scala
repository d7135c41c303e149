package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators — the reference's "Agent 1" analytic surface
  * (SURVEY.md §2c) plus scan/limit (§2a S1/S5/S7).
  *
  * Reference provenance (all /root/reference/app.py): equality filter +
  * projection (app.py:204-205), scalar cast (app.py:204), null-drop
  * (app.py:211), sort-desc (app.py:211,217), top-1 argmax (app.py:211,217),
  * row count (app.py:196), tail-k chart series (app.py:287), client-side
  * limit (app.py:144), keyed chart projection (app.py:281-287), insight
  * string formatting (app.py:206,218,225).
  *
  * Scale notes: every query here is a single parquet scan with
  * filter/projection pushdown (verified via explain: PushedFilters +
  * ReadSchema) and either no shuffle (filter/limit) or a top-k that Spark
  * plans as TakeOrderedAndProject — O(k) per partition + O(k·parts) on the
  * driver, no global sort shuffle. At 100 TB the same plans hold: limits are
  * pushed to the scan, top-k never materializes a total order.
  */
object Relational {

  /** q_scan — full projection scan, the ELT "Extract" step (app.py:67-81)
    * replayed from parquet. Column pruning: only 4 of 11 lineitem columns
    * are read.
    */
  def qScan(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q_sql — the SQL TEXT surface: the same engine driven entirely
    * through `spark.sql(...)` over a registered view, no DataFrame
    * combinators at all — proving a user can bring plain ANSI SQL
    * (CTE + aggregate + two window frames here) and get the identical
    * Catalyst plan and gate-exact results. The statement is
    * deliberately ANSI-portable: the oracle runs a nearly verbatim
    * copy, which is the point — SQL written for this engine runs
    * unchanged elsewhere and vice versa.
    */
  def qSql(spark: SparkSession, d: String): DataFrame = {
    events(spark, d).createOrReplaceTempView("graft_events")
    spark.sql(
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM graft_events GROUP BY event_type, CAST(ts AS DATE)
        |)
        |SELECT event_type, day, n,
        |       SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |                    ROWS UNBOUNDED PRECEDING) AS cum_n,
        |       RANK() OVER (PARTITION BY event_type ORDER BY n DESC, day)
        |         AS busy_rank
        |FROM daily ORDER BY event_type, day""".stripMargin)
  }

  /** q_exists — the correlated-subquery surface: EXISTS, NOT EXISTS and
    * a correlated scalar aggregate subquery in one statement — the
    * SQL-canon forms users write long before they reach for join
    * combinators. Catalyst's RewritePredicateSubquery / scalar-subquery
    * decorrelation compile them to the SAME physical plans the explicit
    * q_join_semi / q_join_anti operators produce — a broadcast LEFT SEMI,
    * a broadcast LEFT ANTI, and an aggregate-then-outer-join — so the
    * subquery notation costs NOTHING at 100 TB: no per-row re-execution
    * of the inner query (the naive reading), just three joins against
    * ONE shared orders scan. PlanSpec pins LeftSemi + LeftAnti presence
    * and that no subquery survives into the optimized plan.
    *
    * Like [[qSql]], the statement is deliberately ANSI-portable — the
    * oracle runs a near-verbatim copy.
    */
  def qExists(spark: SparkSession, d: String): DataFrame = {
    customer(spark, d).createOrReplaceTempView("graft_customer")
    orders(spark, d).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT c_custkey,
        |       (SELECT COUNT(*) FROM graft_orders o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM graft_customer c
        |WHERE EXISTS (SELECT 1 FROM graft_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000.0)
        |  AND NOT EXISTS (SELECT 1 FROM graft_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F'
        |                    AND o.o_totalprice < 50000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q_limit — deterministic client-side limit, the `raw[:30]` slice of
    * github_events (app.py:144). Ordered first so the 30 rows are stable.
    */
  def qLimit(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .orderBy(col("event_id"))
      .select(col("event_id"), col("event_type"), col("value"))
      .limit(30)

  /** q_filter_eq — equality predicate + projection, the
    * `df.loc[df["asset"]=="bitcoin","usd"]` insight (app.py:204). The
    * predicate reaches the parquet scan as a pushed filter.
    */
  def qFilterEq(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  /** q_cast_double — scalar cast, the `float(...)` coercions (app.py:204-205,
    * 223-224). Int→double is exact so the oracle compare is bit-stable.
    */
  def qCastDouble(spark: SparkSession, d: String): DataFrame =
    part(spark, d)
      .select(
        col("p_partkey"),
        col("p_size").cast("double").as("size_d"),
        col("p_partkey").cast("double").as("key_d"))
      .orderBy(col("p_partkey"))

  /** q_dropna — null-drop on a subset, `dropna(subset=["mag"])`
    * (app.py:211,285). */
  def qDropna(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .na.drop(Seq("value"))
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id"))

  /** q_sort_desc — total sort descending, `sort_values(ascending=False)`
    * (app.py:211,217). Tie-broken on the unique event_id so the order is
    * total. (Desc puts NULLs last in both Spark and DuckDB; `value` is
    * non-null in the fixture anyway.)
    *
    * Scale stance: this is a PRESENTATION-SCALE operator — a full-table
    * total order is a deliberate expense (range-partitioned sample +
    * global sort + total-order write), the one query shape whose cost is
    * O(table) no matter how well everything else prunes. At 100 TB you
    * run it on a view-sized slice or reach for the top-k forms
    * ([[qTopk]]/[[qTop1]], O(k) heaps, no global sort) — it is kept
    * exact here because the reference's dashboard sorts its whole
    * (capped) frame. Elsewhere in the registry a trailing orderBy is
    * either output-sized (aggregate/top-k results) or exists purely to
    * make the oracle's row compare deterministic on full-table surfaces
    * (scan/normalize/per-row window features) — those sorts are harness
    * determinism, droppable at production scale; HERE the total order IS
    * the operator's semantics.
    */
  def qSortDesc(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("value").desc, col("event_id"))

  /** q_top1 — argmax after sort, the "latest quake" insight
    * (`.sort_values("time").head(1)`, app.py:211). Spark plans this as
    * TakeOrderedAndProject — no global sort at any scale.
    */
  def qTop1(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .na.drop(Seq("value"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(1)
      .select(tsSeconds(col("ts")).as("ts_s"), col("event_type"), col("value"))

  /** q_topk — tail-k of an ordered series, the 30-point chart cap
    * (app.py:287). TakeOrderedAndProject again — O(k) heap per partition.
    */
  def qTopk(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .orderBy(col("value").desc, col("event_id"))
      .select(col("event_id"), col("event_type"), col("value"))
      .limit(30)

  /** q_count — row count for the success banner, `len(df)` (app.py:196). */
  def qCount(spark: SparkSession, d: String): DataFrame =
    events(spark, d).agg(count(lit(1)).as("n"))

  /** q_max_by — per-group argmax (strongest FX rate, app.py:217), done with a
    * partial-aggregable max-of-struct rather than a window: combines map-side,
    * so only |groups| rows shuffle — the scalable form of "top-1 per key".
    * Tie-break: highest value, then lowest event_id (hence the negated id in
    * the struct max).
    */
  def qMaxBy(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(col("event_type"))
      .agg(max(struct(col("value").as("v"), (-col("event_id")).as("nid"))).as("m"))
      .select(
        col("event_type"),
        (-col("m.nid")).as("best_id"),
        col("m.v").as("best_value"))
      .orderBy(col("event_type"))

  /** q_chart_proj — keyed (label, value) series feeding the bar chart,
    * `set_index("asset")["usd"]` (app.py:281). Ordered by the unique
    * p_partkey (projected out) for a total order.
    */
  def qChartProj(spark: SparkSession, d: String): DataFrame =
    part(spark, d)
      .orderBy(col("p_partkey"))
      .select(col("p_name").as("key"), col("p_retailprice").as("val"))

  /** q_format — insight-string building, the f-string interpolation + number
    * formatting of app.py:206,218,225. `%.2f` of the fixture's 2-decimal
    * doubles is rounding-stable across JVM and C formatters.
    */
  def qFormat(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(
        col("event_id"),
        format_string("%s: %.2f", col("event_type"), col("value")).as("msg"))
      .orderBy(col("event_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan"        -> qScan _,
    "q_sql"         -> qSql _,
    "q_exists"      -> qExists _,
    "q_limit"       -> qLimit _,
    "q_filter_eq"   -> qFilterEq _,
    "q_cast_double" -> qCastDouble _,
    "q_dropna"      -> qDropna _,
    "q_sort_desc"   -> qSortDesc _,
    "q_top1"        -> qTop1 _,
    "q_topk"        -> qTopk _,
    "q_count"       -> qCount _,
    "q_max_by"      -> qMaxBy _,
    "q_chart_proj"  -> qChartProj _,
    "q_format"      -> qFormat _,
  )

  val oracle: Map[String, String] = Map(
    "q_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_sql" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)
        |)
        |SELECT event_type, day, n,
        |       SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |                    ROWS UNBOUNDED PRECEDING) AS cum_n,
        |       RANK() OVER (PARTITION BY event_type ORDER BY n DESC, day)
        |         AS busy_rank
        |FROM daily ORDER BY event_type, day""".stripMargin,
    "q_exists" ->
      """SELECT c_custkey,
        |       (SELECT COUNT(*) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F'
        |                    AND o.o_totalprice < 50000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_limit" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY event_id LIMIT 30""".stripMargin,
    "q_filter_eq" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_cast_double" ->
      """SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_d,
        |       CAST(p_partkey AS DOUBLE) AS key_d
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_dropna" ->
      """SELECT event_id, value FROM events
        |WHERE value IS NOT NULL ORDER BY event_id""".stripMargin,
    "q_sort_desc" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id""".stripMargin,
    "q_top1" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type, value
        |FROM events WHERE value IS NOT NULL
        |ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin,
    "q_topk" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 30""".stripMargin,
    "q_count" -> "SELECT COUNT(*) AS n FROM events",
    "q_max_by" ->
      """SELECT event_type, event_id AS best_id, value AS best_value
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
        |                           ORDER BY value DESC, event_id ASC) = 1
        |ORDER BY event_type""".stripMargin,
    "q_chart_proj" ->
      """SELECT p_name AS key, p_retailprice AS val
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_format" ->
      """SELECT event_id, printf('%s: %.2f', event_type, value) AS msg
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
