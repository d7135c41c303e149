package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

/** Open-session state for [[StreamOps.sessionizeWithState]]: epoch-millis
  * bounds of the in-progress session plus its running aggregates.
  */
case class OpenSession(firstMs: Long, lastMs: Long, n: Long, sum: Double)

/** A closed session emitted by the custom sessionizer — same shape as the
  * built-in `session_window` aggregation (end = last event + gap).
  */
case class ClosedSession(user_id: Long, s_start: Timestamp, s_end: Timestamp,
                         n: Long, sum_v: Double)

/** Structured Streaming execution path (SURVEY.md §2d T1-T3) — the Spark
  * re-expression of the reference's real-time mechanism: a 60-second
  * stateless micro-batch loop (`st_autorefresh(interval=60_000)`,
  * /root/reference/app.py:37) with an Agent-2 failure fallback
  * (app.py:242-247).
  *
  * Design: the window/dedup SHAPES are plain DataFrame→DataFrame functions,
  * so the exact same logical plan runs (a) as a batch query — which is how
  * the DuckDB oracle verifies it — and (b) over any streaming source
  * (file replay here, MemoryStream in StreamingSpec, Kafka in production).
  * This mirrors how the reference's `normalize_to_df` is agnostic to which
  * tick invoked it.
  *
  * Scale notes (100 TB / 1000 executors):
  *  - windowed aggregations carry watermarks so state is bounded: closed
  *    windows are evicted, and the state store (RocksDB in production)
  *    shards by grouping key across executors;
  *  - `Trigger.AvailableNow` processes a backlog with the same bounded
  *    state, then stops — replay and live tail share one program;
  *  - the dead-letter path routes poison rows per micro-batch via
  *    `foreachBatch` append writes — no driver-side collection, the DLQ is
  *    just another partitioned sink.
  */
object StreamOps {

  /** `events.parquet` read schema for the streaming file source — `ts` as
    * raw nanos (LongType), matching `spark.sql.legacy.parquet.nanosAsLong`;
    * converted to a proper timestamp in [[eventsStream]].
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stage the events fixture as a replay directory of 2 parquet files
    * (deterministic assignment by `event_id % 2`) — each file is one
    * "tick" of arriving data, so `maxFilesPerTrigger=1` yields 2 real
    * micro-batches, the analog of consecutive reference refreshes. (Each
    * micro-batch pays a fixed offset/commit-log latency, so the tick count
    * trades demo granularity against wall-clock; 2 proves multi-batch.)
    */
  private val replayCache = scala.collection.concurrent.TrieMap.empty[String, String]

  def stageReplayDir(spark: SparkSession, d: String): String =
    replayCache.getOrElseUpdate(d, {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val dir = Files.createTempDirectory("graft_replay_").toString
      spark.read.schema(eventsRawSchema).parquet(s"$d/events.parquet")
        .repartition(2, pmod(col("event_id"), lit(2)))
        .write.mode("overwrite").parquet(dir)
      dir
    })

  /** Streaming replay of the events table: file source over the staged
    * replay directory — the zero-egress analog of a live feed. One file per
    * trigger ≈ one reference tick (app.py:37).
    */
  def eventsStream(spark: SparkSession, replay: String): DataFrame = {
    spark.readStream
      .schema(eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(replay)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  // ---- Stream shapes: one plan, batch or streaming ----------------------

  /** Tumbling 1-hour counts per event type with a 10-minute watermark —
    * the reference's per-tick aggregate view made stateful.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Watermarked exact dedup on the natural key — late duplicates beyond
    * the watermark are dropped with bounded state
    * (`dropDuplicatesWithinWatermark`), the streaming form of E7.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))

  /** Session windows (30-minute gap) per user — the stateful T4 shape;
    * identical semantics to the batch `Windows.qSession`.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Custom keyed-state sessionization via `flatMapGroupsWithState` — the
    * (d)-tier stateful operator SURVEY §2d T4 calls for, for when
    * `session_window` can't express the semantics (e.g. per-session running
    * aggregates or custom close conditions). Sessions close either when a
    * later event for the key exceeds the 30-minute gap, or when the
    * watermark passes the open session's end (event-time timeout) — so
    * state per key is bounded and evicted exactly like the built-in
    * operator's.
    *
    * Emitted sessions match `session_window(ts, '30 minutes')`:
    * start = first event, end = last event + gap.
    */
  def sessionizeWithState(events: DataFrame): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = 30L * 60 * 1000

    def close(user: Long, s: OpenSession): ClosedSession =
      ClosedSession(user, new Timestamp(s.firstMs),
        new Timestamp(s.lastMs + gapMs), s.n, s.sum)

    def step(user: Long, rows: Iterator[(Long, Timestamp, Double)],
             state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(user, _)).iterator
        state.remove()
        out
      } else {
        var open = state.getOption
        val closed = Seq.newBuilder[ClosedSession]
        rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, v) =>
          val t = ts.getTime
          open match {
            case Some(s) if t < s.lastMs + gapMs =>
              open = Some(OpenSession(s.firstMs, math.max(s.lastMs, t), s.n + 1, s.sum + v))
            case Some(s) =>
              closed += close(user, s)
              open = Some(OpenSession(t, t, 1, v))
            case None =>
              open = Some(OpenSession(t, t, 1, v))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
        closed.result().iterator
      }
    }

    events.selectExpr("user_id", "ts", "value")
      .as[(Long, Timestamp, Double)]
      .withWatermark("ts", "10 minutes")
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(step)
  }

  // ---- Driver-contract queries -----------------------------------------

  /** q_stream_tick — a REAL streaming execution: file-source replay →
    * watermarked tumbling aggregation → memory sink, run to completion
    * with `Trigger.AvailableNow`, then the materialized result is returned
    * for the oracle compare. Complete output mode = the reference's
    * "latest snapshot replaces the view" semantics (T2).
    */
  def qStreamTick(spark: SparkSession, d: String): DataFrame = {
    val sinkName = s"stream_tick_${System.nanoTime()}"
    val query = tumblingCounts(eventsStream(spark, stageReplayDir(spark, d)))
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(sinkName)
      .select(Tables.tsSeconds(col("w.start")).as("w_start"),
              col("event_type"), col("n"))
      .orderBy(col("w_start"), col("event_type"))
  }

  /** q_deadletter — the Agent-2 failure-fallback path (app.py:242-247) as a
    * streaming dead-letter queue: each micro-batch tries the insight
    * computation; rows failing the contract (poison pill: missing `k` or
    * `k % 13 == 0`, the fixture analog of app.py:195's raise) are routed to
    * an append-only DLQ sink, and a whole-batch failure would fall through
    * to the catch with a diagnostic row — per-batch success/failure
    * routing, not an optimizer concern.
    */
  def qDeadletter(spark: SparkSession, d: String): DataFrame = {
    val dlqDir = Files.createTempDirectory("graft_dlq_").toString
    val parsed = eventsStream(spark, stageReplayDir(spark, d))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    val query = parsed.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Exactly-once: each micro-batch overwrites ITS OWN partition of
        // the DLQ (keyed by batchId), so a retried batch replaces rather
        // than duplicates its output — the idempotent-sink contract
        // foreachBatch requires for end-to-end exactly-once.
        val target = s"$dlqDir/batch=$batchId"
        try {
          // Agent-1 path: rows violating the insight contract → DLQ;
          // healthy rows would continue to the serving sink here.
          batch.filter(col("k").isNull || col("k") % 13 === 0)
            .select(col("event_id"), col("user_id"), col("k"))
            .write.mode("overwrite").parquet(target)
        } catch {
          case e: Throwable =>
            // Agent-2 path: the whole batch failed — emit a structured
            // diagnostic instead of crashing the stream (app.py:230-240).
            val spark = batch.sparkSession
            import spark.implicits._
            Seq((-batchId - 1, -1L, Option.empty[Long]))
              .toDF("event_id", "user_id", "k")
              .write.mode("overwrite").parquet(target)
        }
      }
      .start()
    query.awaitTermination()
    spark.read.parquet(s"$dlqDir/batch=*")
      .select(col("event_id"), col("user_id"), col("k"))
      .orderBy(col("event_id"))
  }

  /** q_stream_dedup — `dropDuplicatesWithinWatermark` over the replay
    * stream: watermarked, bounded-state exact dedup (streaming E7). Which
    * PHYSICAL row survives per key depends on arrival order across
    * micro-batches, so the query projects exactly the key columns — the
    * deterministic part and the part the oracle can check (`SELECT
    * DISTINCT`). The non-key payload of the survivor is arrival-order
    * semantics by design, same as the reference keeping whichever snapshot
    * arrived in the current tick.
    */
  def qStreamDedup(spark: SparkSession, d: String): DataFrame = {
    val sinkName = s"stream_dedup_${System.nanoTime()}"
    val query = dedupWithinWatermark(eventsStream(spark, stageReplayDir(spark, d)))
      .select(col("user_id"), col("event_type"))
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(sinkName)
      .orderBy(col("user_id"), col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tick"  -> qStreamTick _,
    "q_stream_dedup" -> qStreamDedup _,
    "q_deadletter"   -> qDeadletter _,
  )

  val oracle: Map[String, String] = Map(
    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "q_stream_tick" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        |       event_type, COUNT(*) AS n
        |FROM events GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY w_start, event_type""".stripMargin,
    "q_deadletter" ->
      """SELECT event_id, user_id, k FROM (
        |  SELECT event_id, user_id,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |WHERE k IS NULL OR k % 13 = 0
        |ORDER BY event_id""".stripMargin,
  )
}
