package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import java.time.Duration

/** A minimal per-key running counter for the TTL demonstration: state is
  * one ValueState[Long] created with the given [[TTLConfig]]. Top-level
  * class so the streaming runtime serializes it without dragging the test
  * suite along.
  */
class TtlCountProcessor(ttl: TTLConfig)
    extends StatefulProcessor[Long, Ev, (Long, Long)] {
  @transient private var cnt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cnt = getHandle.getValueState("cnt", Encoders.scalaLong, ttl)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timerValues: TimerValues): Iterator[(Long, Long)] = {
    val prev = if (cnt.exists()) cnt.get() else 0L
    val n = prev + rows.size
    cnt.update(n)
    Iterator((key, n))
  }
}

/** State TTL on the arbitrary-state API (transformWithState): a state
  * variable created with a TTLConfig expires after the configured
  * processing-time duration — the platform's answer to "bound state for
  * keys that stop arriving but never get a closing event" (abandoned
  * sessions, dead devices). At 100 TB, TTL is what keeps RocksDB from
  * accumulating every key ever seen; this spec pins the semantics the
  * scaladocs rely on: an expired counter restarts, an unexpired one
  * continues, and TTLConfig.NONE never expires.
  */
class StateTtlSpec extends SparkSpec {

  private def t(h: Int, m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  private def runCounter(ttl: TTLConfig, sleepMs: Long): Seq[(Long, Long)] = {
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import rocks.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = rocks.sqlContext
    val mem = MemoryStream[Ev]
    val sink = s"ttl_sink_${System.nanoTime()}"
    // TTL requires TimeMode.ProcessingTime (the engine refuses EventTime:
    // STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL). In that mode
    // the engine keeps scheduling no-data micro-batches to advance the
    // clock for timers/TTL, so processAllAvailable never settles — the
    // test instead runs a real trigger interval and POLLS the sink for
    // the expected row count, like a consumer of the stream would.
    val query = mem.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new TtlCountProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
      .writeStream.format("memory").queryName(sink)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()
    def awaitRows(n: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (rocks.table(sink).count() < n) {
        assert(System.nanoTime() < deadline, s"sink never reached $n rows")
        Thread.sleep(100)
      }
    }
    try {
      mem.addData(Ev(1, t(10, 0), 7, "click", 1.0))
      awaitRows(1)
      Thread.sleep(sleepMs)
      mem.addData(Ev(2, t(10, 1), 7, "click", 1.0))
      awaitRows(2)
      rocks.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    } finally query.stop()
  }

  test("a TTL'd state variable expires between batches; TTLConfig.NONE never does") {
    // TTL 1s, 2.5s gap: the second batch must see EXPIRED state and
    // restart the counter at 1.
    val expired = runCounter(TTLConfig(Duration.ofSeconds(1)), sleepMs = 2500)
    assert(expired == Seq((7L, 1L), (7L, 1L)),
      s"counter must restart after TTL expiry: $expired")
    // Same gap, no TTL: the counter continues.
    val kept = runCounter(TTLConfig.NONE, sleepMs = 2500)
    assert(kept == Seq((7L, 1L), (7L, 2L)),
      s"TTLConfig.NONE state must survive the gap: $kept")
    // Generous TTL, same gap: unexpired state continues — expiry is the
    // TTL, not the batch boundary.
    val generous = runCounter(TTLConfig(Duration.ofMinutes(10)), sleepMs = 2500)
    assert(generous == Seq((7L, 1L), (7L, 2L)),
      s"unexpired TTL state must continue: $generous")
  }
}
