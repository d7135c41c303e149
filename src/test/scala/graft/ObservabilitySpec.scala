package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent
import java.sql.Timestamp
import scala.collection.mutable

/** Streaming observability (the reference surfaces per-tick status to its
  * user — `st.caption(f"Last refresh ...")`, fetch-failure banners;
  * /root/reference/app.py:256,265,306-307). The Spark-native analog is the
  * per-micro-batch progress object and the [[StreamingQueryListener]] bus:
  * the numbers an operator watches daily — rows dropped by the watermark,
  * state-store row counts, per-batch input volume — all come from here.
  * This spec pins the two contracts a production dashboard depends on:
  *
  *  1. a late row is DROPPED and the drop is COUNTED
  *     (`numRowsDroppedByWatermark`) — silent data loss is the failure
  *     mode watermarking trades for bounded state, so it must be visible;
  *  2. state-store row counts track window eviction — state stays bounded
  *     and the progress metrics show it, batch over batch.
  *
  * No query changes: these are assertions over the metrics that every
  * registered streaming query already emits.
  */
class ObservabilitySpec extends SparkSpec {

  private def t(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("late rows are counted in numRowsDroppedByWatermark and state rows track eviction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val query = StreamOps.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("obs_tumble")
      .outputMode("append").start()
    try {
      // Tick 1: two rows in the [10:00, 11:00) window → 1 open window in
      // state (single event_type), nothing dropped.
      mem.addData(Ev(1, t(10, 5), 1, "click", 1.0), Ev(2, t(10, 20), 1, "click", 1.0))
      query.processAllAvailable()
      // Tick 2: event time jumps to 13:00 → watermark 12:50; the 10:00
      // window closes, emits, and its state row is REMOVED.
      mem.addData(Ev(3, t(13, 0), 2, "view", 1.0))
      query.processAllAvailable()
      // Tick 3: a straggler inside the long-closed window — dropped by the
      // watermark filter, and the drop is counted in that batch's metrics.
      mem.addData(Ev(4, t(10, 30), 1, "click", 1.0))
      query.processAllAvailable()

      val progresses = query.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
      val dropped = progresses.map(_.stateOperators.head.numRowsDroppedByWatermark)
      assert(dropped.exists(_ > 0),
        s"the late row must be counted dropped; per-batch drops: $dropped")
      assert(dropped.sum == 1,
        s"exactly one row was late; per-batch drops: $dropped")

      // State-row trajectory: grows to the open-window count, then the
      // eviction batch REMOVES the closed window — numRowsRemoved > 0 and
      // the final state holds only the still-open 13:00 window. Bounded
      // state isn't just claimed, the metrics show the eviction happening.
      val removed = progresses.map(_.stateOperators.head.numRowsRemoved)
      assert(removed.exists(_ > 0),
        s"closing the 10:00 window must remove its state row; removals: $removed")
      val finalRows = progresses.last.stateOperators.head.numRowsTotal
      assert(finalRows == 1,
        s"only the open 13:00 window may remain in state, got $finalRows")
    } finally query.stop()
  }

  test("Dataset.observe surfaces custom per-batch metrics in query progress") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The reference's per-tick caption ("N rows at HH:MM", app.py:256) done
    // the Spark way: observe() attaches aggregate metrics to the streaming
    // plan itself; every micro-batch reports them in observedMetrics with
    // no second pass over the data — the hook a pipeline uses for row-count
    // reconciliation and data-quality alerts at 100 TB, where a separate
    // counting query would double the read.
    val mem = MemoryStream[Ev]
    val observed = mem.toDF()
      .observe("tick_stats",
        count(lit(1)).as("rows"),
        sum(col("value")).as("sum_v"))
    val query = StreamOps.tumblingCounts(observed)
      .writeStream.format("memory").queryName("obs_observe")
      .outputMode("complete").start()
    try {
      mem.addData(Ev(1, t(10, 5), 1, "click", 2.0), Ev(2, t(10, 20), 1, "click", 3.0))
      query.processAllAvailable()
      mem.addData(Ev(3, t(11, 0), 2, "view", 5.0))
      query.processAllAvailable()
      val stats = query.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("tick_stats")))
        .map(r => (r.getAs[Long]("rows"), r.getAs[Double]("sum_v")))
      assert(stats.nonEmpty, "observe() metrics must appear in progress")
      assert(stats.map(_._1).sum == 3 && stats.map(_._2).sum == 10.0,
        s"per-batch observed metrics must reconcile with the input: $stats")
    } finally query.stop()
  }

  test("StreamingQueryListener receives the same drop metric on the bus") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The push-based surface: a dashboard/alerting process subscribes to
    // the listener bus instead of polling query.recentProgress. Events are
    // delivered asynchronously, so the assertion polls with a deadline.
    val seen = mutable.Buffer.empty[Long]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = seen.synchronized {
        e.progress.stateOperators.foreach(so => seen += so.numRowsDroppedByWatermark)
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val mem = MemoryStream[Ev]
    val query = StreamOps.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("obs_listener")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, t(10, 5), 1, "click", 1.0))
      query.processAllAvailable()
      mem.addData(Ev(2, t(13, 0), 2, "view", 1.0))
      query.processAllAvailable()
      mem.addData(Ev(3, t(10, 30), 1, "click", 1.0)) // late → dropped
      query.processAllAvailable()
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var ok = false
      while (!ok && System.nanoTime() < deadline) {
        ok = seen.synchronized(seen.exists(_ > 0))
        if (!ok) Thread.sleep(50)
      }
      assert(ok, s"listener never saw numRowsDroppedByWatermark > 0: " +
        seen.synchronized(seen.toList))
    } finally {
      query.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("batch Observation: data-quality counters ride the job, no extra pass") {
    // The batch side of the same observability story: `Dataset.observe`
    // attaches aggregate metrics to an EXISTING job — row counts, null
    // counts, value bounds — collected by the driver when the action
    // finishes, with zero additional scans. This is how a production
    // pipeline gets its freshness/volume counters without paying a
    // second read of a 100 TB input.
    val obs = new org.apache.spark.sql.Observation("graft_quality")
    val df = Tables.events(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
      .filter(col("event_type") === "purchase")
    val purchases = df.count()
    val m = obs.get
    // The metrics describe the OBSERVED relation (pre-filter), proving
    // they ride the scan, not the query result.
    val total = Tables.events(spark, sfDir).count()
    assert(m("n_rows") == total && total > purchases)
    assert(m("n_null_value") == 0L)
    assert(m("min_ts").asInstanceOf[java.sql.Timestamp]
      .before(m("max_ts").asInstanceOf[java.sql.Timestamp]))
  }
}
