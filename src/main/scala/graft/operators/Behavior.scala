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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rfm" -> qRfm _,
    "q_ltv" -> qLtv _,
  )

  val oracle: Map[String, String] = Map(
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
        |SELECT r_q, f_q, m_q, COUNT(*) AS n_users, SUM(cents) AS seg_cents
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
        |         COUNT(*) AS n_orders, SUM(o.cents) AS rev_cents
        |  FROM o JOIN c ON o.o_custkey = c.o_custkey
        |  GROUP BY cohort_s, month_offset
        |)
        |SELECT cohort_s, month_offset, n_orders, rev_cents,
        |       SUM(rev_cents) OVER (PARTITION BY cohort_s ORDER BY month_offset
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev_cents
        |FROM m ORDER BY cohort_s, month_offset""".stripMargin,
  )
}
