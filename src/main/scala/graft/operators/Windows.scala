package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time window operators (SURVEY.md §2d T4) — the stateful-streaming
  * semantics the reference's 60 s stateless tick lacks
  * (/root/reference/app.py:37), expressed over event time so the same
  * aggregations run identically as a batch plan (verified against DuckDB
  * here) and as a Structured Streaming plan with a watermark:
  * [[graft.streaming.StreamOps]] wires the same shapes to a streaming
  * source (file replay for q_stream_tick, MemoryStream in StreamingSpec,
  * which also asserts streaming results equal these batch queries').
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregations on
  * (window, key) — partial-aggregated map-side, so the shuffle carries one
  * row per (window × key), not per event. Session windows keep per-user
  * state; partitioning by user_id spreads state across executors, and in
  * streaming mode the RocksDB state store holds it off-heap.
  */
object Windows {

  /** q_window_tumble — 1-hour tumbling counts/sums per event type. */
  def qWindowTumble(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_v"))
      .select(
        tsSeconds(col("w.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_v"))
      .orderBy(col("w_start"), col("event_type"))

  /** q_window_slide — 1-hour windows sliding every 30 minutes: each event
    * lands in exactly 2 windows (size/slide).
    */
  def qWindowSlide(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_v"))
      .select(tsSeconds(col("w.start")).as("w_start"), col("n"), col("sum_v"))
      .orderBy(col("w_start"))

  /** q_session — session windows with a 30-minute inactivity gap per user.
    * Spark merges per-event windows [t, t+gap); a new session starts when
    * ts >= previous ts + gap, and the session end is last_ts + gap — the
    * oracle mirrors exactly that with a gaps-and-islands rewrite.
    */
  def qSession(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_v"))
      .select(
        col("user_id"),
        tsSeconds(col("sw.start")).as("s_start"),
        tsSeconds(col("sw.end")).as("s_end"),
        col("n"), col("sum_v"))
      .orderBy(col("user_id"), col("s_start"))

  /** q_concurrency — peak concurrent sessions via the classic sweep
    * line: every session interval emits +1 at its start and −1 at its
    * end, the deltas order by (instant, delta) — ends sort before
    * starts at the same µs, because sessions are half-open [start, end)
    * — and the running sum's maximum is the answer, with the first µs
    * at which it is reached. THE capacity-planning readout sessionized
    * logs exist for ("how many users were on at the worst moment"),
    * and the one session statistic per-session aggregates can't give.
    *
    * Plan: sessions come from the same session_window merge [[qSession]]
    * gates; the sweep relation is 2 rows per SESSION (not per event),
    * and the running sum is one ordered window over it — session-sized,
    * so a single-partition window is the honest cost here (at 100 TB
    * the sweep range-partitions by time with per-partition carry-in
    * offsets, the standard distributed prefix-sum split; the fixture's
    * session count doesn't need it). All-integer ⇒ hash-exact.
    */
  def qConcurrency(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sessions = events(spark, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("sw.start")).as("s_us"),
        unix_micros(col("sw.end")).as("e_us"))
    val sweep = sessions
      .select(col("s_us").as("us"), lit(1L).as("delta"))
      .union(sessions.select(col("e_us").as("us"), lit(-1L).as("delta")))
    val byTime = Window.orderBy(col("us"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, 0)
    sweep
      .withColumn("level", sum(col("delta")).over(byTime))
      .agg(
        (count(lit(1)) / lit(2)).cast("long").as("n_sessions"),
        max(col("level")).as("peak_concurrent"),
        min_by(col("us"), struct((-col("level")).as("neg"), col("us")))
          .as("first_peak_us"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_tumble" -> qWindowTumble _,
    "q_window_slide"  -> qWindowSlide _,
    "q_session"       -> qSession _,
    "q_concurrency"   -> qConcurrency _,
  )

  private val decSumV = "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)"

  val oracle: Map[String, String] = Map(
    "q_window_tumble" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
         |       event_type, COUNT(*) AS n, $decSumV AS sum_v
         |FROM events GROUP BY date_trunc('hour', ts), event_type
         |ORDER BY w_start, event_type""".stripMargin,
    "q_window_slide" ->
      s"""SELECT strftime(make_timestamp(s * 1000000), '%Y-%m-%d %H:%M:%S') AS w_start,
         |       COUNT(*) AS n, $decSumV AS sum_v
         |FROM (
         |  SELECT unnest([f, f - 1800]) AS s, value
         |  FROM (SELECT (epoch_ms(ts) // 1800000) * 1800 AS f, value FROM events)
         |)
         |GROUP BY s ORDER BY w_start""".stripMargin,
    "q_session" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |              THEN 1 ELSE 0 END AS brk
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), sess AS (
         |  SELECT user_id, ts, value,
         |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
         |                        ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked
         |)
         |SELECT user_id,
         |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
         |       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
         |       COUNT(*) AS n, $decSumV AS sum_v
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, s_start""".stripMargin,
    "q_concurrency" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |              THEN 1 ELSE 0 END AS brk
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), sess AS (
         |  SELECT user_id, ts,
         |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
         |                        ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked
         |), iv AS (
         |  SELECT epoch_us(MIN(ts)) AS s_us,
         |         epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS e_us
         |  FROM sess GROUP BY user_id, sid
         |), sweep AS (
         |  SELECT s_us AS us, CAST(1 AS BIGINT) AS delta FROM iv
         |  UNION ALL SELECT e_us AS us, CAST(-1 AS BIGINT) AS delta FROM iv
         |), lv AS (
         |  SELECT us, delta,
         |         SUM(delta) OVER (ORDER BY us, delta
         |                          ROWS UNBOUNDED PRECEDING) AS level
         |  FROM sweep
         |)
         |SELECT CAST(COUNT(*) // 2 AS BIGINT) AS n_sessions,
         |       CAST(MAX(level) AS BIGINT) AS peak_concurrent,
         |       MIN(CASE WHEN level = (SELECT MAX(level) FROM lv)
         |                THEN us END) AS first_peak_us
         |FROM lv""".stripMargin,
  )
}
