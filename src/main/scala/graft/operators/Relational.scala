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

  /** q_sql_pipe — the SQL PIPE syntax surface (Spark 4's `|>` operators):
    * the same filter → derive → aggregate → order program as a pipeline
    * of `|> WHERE / EXTEND / AGGREGATE / ORDER BY` stages instead of the
    * inside-out SELECT nesting — SQL written in dataflow order, the text
    * analog of the DataFrame combinator chain. The feature is pure
    * SYNTAX: Catalyst's EliminatePipeOperators rewrites the pipeline
    * into the identical logical plan the nested form produces, so the
    * new surface costs nothing at any scale — this query pins that the
    * engine's SQL entry point accepts the notation and that its results
    * are gate-exact against the oracle's classic ANSI rendering of the
    * same program. Cents derivation keeps the aggregate integer-exact.
    */
  def qSqlPipe(spark: SparkSession, d: String): DataFrame = {
    events(spark, d).createOrReplaceTempView("graft_events")
    spark.sql(
      """FROM graft_events
        ||> WHERE value IS NOT NULL
        ||> EXTEND CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        ||> AGGREGATE COUNT(*) AS n, SUM(cents) AS sum_cents,
        |             MIN(cents) AS min_cents, MAX(cents) AS max_cents
        |   GROUP BY event_type
        ||> ORDER BY event_type""".stripMargin)
  }

  /** q_sql_udf — the SQL-defined function surface (Spark 4 ships
    * `CREATE FUNCTION ... RETURNS ... RETURN <expr>`): the team-shared
    * helper vocabulary (here: exact cents quantization and a
    * null-guarded rate formatter — the two idioms every query in this
    * engine re-spells) declared ONCE as catalog objects and called like
    * built-ins. The feature is the governance surface scalar logic
    * should live in instead of copy-pasted expressions or JVM UDFs:
    * Catalyst INLINES the function body at analysis time, so the called
    * form compiles to the identical codegen'd plan as the hand-inlined
    * expression — zero cost at any scale, and the oracle runs exactly
    * that inlined rendering.
    */
  def qSqlUdf(spark: SparkSession, d: String): DataFrame = {
    events(spark, d).createOrReplaceTempView("graft_events")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(v DOUBLE)
        |RETURNS BIGINT RETURN CAST(FLOOR(v * 100.0 + 0.5) AS BIGINT)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_share(part BIGINT, total BIGINT)
        |RETURNS DOUBLE
        |RETURN CASE WHEN total > 0 THEN CAST(part AS DOUBLE) / CAST(total AS DOUBLE) END""".stripMargin)
    spark.sql(
      """SELECT event_type,
        |       SUM(graft_cents(value)) AS sum_cents,
        |       graft_share(SUM(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END),
        |                   COUNT(value)) AS hi_share
        |FROM graft_events WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** q_sql_params — the parameterized-SQL surface (Spark 4 named
    * parameter markers): the same SQL text executed with `:minbal` /
    * `:prio` bound through `spark.sql(text, args)` — how a serving layer
    * ships ONE audited statement with per-request values instead of
    * string-splicing literals (the injection-proof form of the
    * reference's hand-assembled per-source queries). The binder
    * substitutes ANALYZED literals, so the executed plan is identical
    * to the inlined form — the oracle IS that inlined rendering, making
    * the gate prove the substitution semantics, the q_sql_udf stance.
    *
    * The program itself is a broadcast-dim join (customer segment dim
    * onto orders) with exact-cents revenue per segment — filter pushdown
    * on both parameters lands in the scans.
    */
  def qSqlParams(spark: SparkSession, d: String): DataFrame = {
    customer(spark, d).createOrReplaceTempView("graft_customer")
    orders(spark, d).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT c.c_mktsegment, COUNT(*) AS n_orders,
        |       SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS rev_cents
        |FROM graft_orders o JOIN graft_customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_acctbal >= :minbal AND o.o_orderpriority = :prio
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
      Map("minbal" -> 1000.0, "prio" -> "1-URGENT"))
  }

  /** q_scalar_subquery — correlated scalar subqueries IN THE PROJECTION:
    * per top-balance customer, an order count and a max order total each
    * written as `(SELECT agg FROM orders WHERE o_custkey = c_custkey)` —
    * the decorrelation shape [[graft.operators.Analytics.qTpchQ17]]
    * exercises in WHERE, moved to SELECT, where the rewrite target is a
    * LEFT OUTER aggregate join (a per-row subquery loop is the
    * at-scale death sentence; COUNT(*) must still read 0, not NULL, for
    * order-less customers — the COUNT bug decorrelation famously has to
    * special-case). Written as SQL text because the surface under test
    * IS the correlated-scalar SQL form.
    */
  def qScalarSubquery(spark: SparkSession, d: String): DataFrame = {
    customer(spark, d).createOrReplaceTempView("graft_customer")
    orders(spark, d).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT c_custkey, c_name,
        |       (SELECT COUNT(*) FROM graft_orders o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |       (SELECT CAST(MAX(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
        |          AS BIGINT)) AS BIGINT) FROM graft_orders o
        |        WHERE o.o_custkey = c.c_custkey) AS max_cents
        |FROM graft_customer c
        |WHERE c_acctbal >= 9000.0
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q_sql_var — the SQL session-variable surface (Spark 4's
    * DECLARE/SET VAR): a threshold DECLARED as a typed variable, SET
    * from a scalar subquery over the data itself (the real use — a
    * driver computes a cut once and every later statement reads it),
    * then consumed by the report query. The variable value is an EXACT
    * integer (floor-mean via SUM DIV COUNT), so the downstream filter
    * is engine-deterministic; the oracle inlines the identical scalar
    * subquery (DuckDB has no session variables — the SEMANTICS, one
    * scalar computed once and referenced by name, is what's pinned).
    */
  def qSqlVar(spark: SparkSession, d: String): DataFrame = {
    lineitem(spark, d).createOrReplaceTempView("graft_lineitem")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_qty_cut BIGINT")
    spark.sql(
      """SET VAR graft_qty_cut =
        |  (SELECT SUM(CAST(l_quantity AS BIGINT)) DIV COUNT(*)
        |   FROM graft_lineitem)""".stripMargin)
    spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM graft_lineitem
        |WHERE l_quantity > graft_qty_cut
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** q_sql_exec_immediate — EXECUTE IMMEDIATE (Spark 4 dynamic SQL): the
    * statement TEXT lives in a SQL variable and runs through
    * `EXECUTE IMMEDIATE var USING (args)` with positional parameter
    * markers — the stored-procedure-style dispatch a metadata-driven
    * pipeline uses when the query itself is data (a rules table of
    * quality checks, a generated per-tenant report). Completes the
    * dynamic-SQL surface: q_sql_params binds values into static text,
    * q_identifier binds an IDENTIFIER, THIS binds the whole statement —
    * with injection confined to the parameter markers, never string
    * concatenation. The oracle runs the resolved query; what's pinned is
    * that the indirection yields the same rows.
    */
  def qSqlExecImmediate(spark: SparkSession, d: String): DataFrame = {
    events(spark, d).createOrReplaceTempView("graft_events")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_stmt STRING")
    spark.sql(
      """SET VAR graft_stmt =
        |  'SELECT event_type, COUNT(*) AS n,
        |          CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
        |               AS BIGINT) AS sum_cents
        |   FROM graft_events WHERE value IS NOT NULL AND value >= ?
        |   GROUP BY event_type ORDER BY event_type'""".stripMargin)
    spark.sql("EXECUTE IMMEDIATE graft_stmt USING (50.0)")
  }

  /** q_identifier — the IDENTIFIER() clause (Spark 4's injection-safe
    * dynamic SQL): the table name arrives as a PARAMETER and is bound
    * through IDENTIFIER(:tbl), not string concatenation — the surface
    * that lets a metadata-driven pipeline template one statement over N
    * tables without SQL injection. The oracle runs the resolved query;
    * what's pinned is that the indirect binding resolves to the same
    * relation.
    */
  def qIdentifier(spark: SparkSession, d: String): DataFrame = {
    orders(spark, d).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS rev_cents
        |FROM IDENTIFIER(:tbl)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("tbl" -> "graft_orders"))
  }

  /** q_sql_recursive — the RECURSIVE CTE surface (Spark 4 finally ships
    * `WITH RECURSIVE`): a gap-free month spine generated by recursion
    * from the data's own bounds, left-joined to monthly order counts —
    * the calendar-scaffold query every reporting layer writes, run as
    * PLAIN SQL text through `spark.sql` with the near-verbatim statement
    * in DuckDB. Both engines execute a genuine recursive fixpoint
    * (anchor = min month via a 1-row bounds CTE; step = +1 month while
    * below max), so this pins that the engine's SQL entry point covers
    * the recursion feature class, not just its DataFrame equivalents
    * (`sequence()` + explode, which q_gapfill uses — same answer,
    * different language surface; that duality is the point).
    *
    * Scale: a recursive CTE's loop body is ONE JOB PER ITERATION —
    * recursion depth is the scarce resource, independent of data
    * volume. Two consequences shaped this plan: (a) the bounds the
    * recursive term consults are MATERIALIZED once into a cached 1-row
    * view (an aggregate referenced inside the loop re-scans its input
    * every step: 80 spine steps × a full orders aggregation measured
    * 14.5 s at sf0.1); (b) the recursion walks the COARSE axis (years,
    * ≤ a dozen steps) and each step expands its 12 months
    * DECLARATIVELY — recursing month-by-month spent 80 jobs on pure
    * per-iteration overhead (8.8 s with bounds already cached; this
    * form: ~1 s). The monthly aggregate joins OUTSIDE the loop,
    * map-side partial over one scan.
    */
  def qSqlRecursive(spark: SparkSession, d: String): DataFrame = {
    orders(spark, d).createOrReplaceTempView("graft_orders")
    val bounds = graft.Tables.cacheForSelfJoin(
      orders(spark, d).agg(
        min(date_trunc("MONTH", col("o_orderdate"))).as("lo"),
        max(date_trunc("MONTH", col("o_orderdate"))).as("hi")))
    bounds.count() // fill before the loop body starts consulting it
    bounds.createOrReplaceTempView("graft_bounds")
    spark.sql(
      """WITH RECURSIVE years(y) AS (
        |  SELECT date_trunc('YEAR', lo) FROM graft_bounds
        |  UNION ALL
        |  SELECT y + INTERVAL '1' YEAR FROM years, graft_bounds
        |  WHERE y < date_trunc('YEAR', hi)
        |), months AS (
        |  SELECT y + make_interval(0, mo) AS m
        |  FROM years LATERAL VIEW explode(sequence(0, 11)) t AS mo
        |), spine AS (
        |  SELECT m FROM months, graft_bounds WHERE m BETWEEN lo AND hi
        |), agg AS (
        |  SELECT date_trunc('MONTH', o_orderdate) AS m, COUNT(*) AS n_orders
        |  FROM graft_orders GROUP BY date_trunc('MONTH', o_orderdate)
        |)
        |SELECT date_format(spine.m, 'yyyy-MM-dd HH:mm:ss') AS month_s,
        |       COALESCE(agg.n_orders, 0) AS n_orders
        |FROM spine LEFT JOIN agg ON spine.m = agg.m
        |ORDER BY month_s""".stripMargin)
  }

  /** q_paginate — keyless OFFSET/LIMIT pagination (page 3 at 50/page)
    * under a TOTAL (date, key) order: the result-browsing surface every
    * API layer exposes. Registered deliberately WITH its scale caveat:
    * OFFSET must discard `offset` rows behind a global order, so cost
    * grows with page depth — fine for bounded UI paging (this shape),
    * wrong for deep scans, where the keyset form (`WHERE (date, key) >
    * last_seen ORDER BY ... LIMIT n` — q_filter_eq + q_topk's shapes
    * composed) is the production replacement. The plan still avoids a
    * full global sort: Spark pushes limit+offset into a single
    * TakeOrdered-style collect of the first 150 rows.
    */
  def qPaginate(spark: SparkSession, d: String): DataFrame =
    orders(spark, d)
      .select(col("o_orderkey"), tsSeconds(col("o_orderdate")).as("o_date_s"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents"))
      .orderBy(col("o_date_s"), col("o_orderkey"))
      .offset(100)
      .limit(50)

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
    "q_sql_pipe"    -> qSqlPipe _,
    "q_sql_udf"     -> qSqlUdf _,
    "q_sql_params"  -> qSqlParams _,
    "q_sql_recursive" -> qSqlRecursive _,
    "q_paginate"    -> qPaginate _,
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
    "q_sql_var"     -> qSqlVar _,
    "q_sql_exec_immediate" -> qSqlExecImmediate _,
    "q_identifier"  -> qIdentifier _,
    "q_scalar_subquery" -> qScalarSubquery _,
  )

  val oracle: Map[String, String] = Map(
    "q_sql_exec_immediate" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
        |            AS BIGINT) AS sum_cents
        |FROM events WHERE value IS NOT NULL AND value >= 50.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_name,
        |       (SELECT COUNT(*) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |       (SELECT CAST(MAX(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
        |          AS BIGINT)) AS BIGINT) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS max_cents
        |FROM customer c
        |WHERE c_acctbal >= 9000.0
        |ORDER BY c_custkey""".stripMargin,
    "q_sql_var" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_quantity > (SELECT SUM(CAST(l_quantity AS BIGINT)) // COUNT(*)
        |                    FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_identifier" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |         AS BIGINT) AS rev_cents
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_sql_params" ->
      """SELECT c.c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
        |            AS BIGINT) AS rev_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_acctbal >= 1000.0 AND o.o_orderpriority = '1-URGENT'
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "q_sql_udf" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       CASE WHEN COUNT(value) > 0 THEN
        |         CAST(SUM(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS DOUBLE)
        |           / CAST(COUNT(value) AS DOUBLE) END AS hi_share
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sql_pipe" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       MIN(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS min_cents,
        |       MAX(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS max_cents
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_sql_recursive" ->
      """WITH RECURSIVE bounds AS (
        |  SELECT MIN(date_trunc('month', o_orderdate)) AS lo,
        |         MAX(date_trunc('month', o_orderdate)) AS hi
        |  FROM orders
        |), months(m) AS (
        |  SELECT lo FROM bounds
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM months, bounds WHERE m < hi
        |), agg AS (
        |  SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n_orders
        |  FROM orders GROUP BY date_trunc('month', o_orderdate)
        |)
        |SELECT strftime(months.m, '%Y-%m-%d %H:%M:%S') AS month_s,
        |       COALESCE(agg.n_orders, 0) AS n_orders
        |FROM months LEFT JOIN agg ON months.m = agg.m
        |ORDER BY month_s""".stripMargin,
    "q_paginate" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date_s,
        |       CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |FROM orders
        |ORDER BY o_date_s, o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin,
    "q_sql" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)
        |)
        |SELECT event_type, day, n,
        |       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
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
