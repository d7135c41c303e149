package graft

import graft.sources.{HttpReplayServer, HttpSourceProvider}
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The `graft-http` DSv2 source over REAL loopback sockets: the
  * reference's fetch() contract (/root/reference/app.py:67-81) — payload
  * on success, (NULL, error) on failure, per-source headers, timeouts —
  * exercised against [[HttpReplayServer]] instances with injected faults.
  * S2 (error capture → dead-letter) and S3 (per-source request options)
  * from SURVEY §2a, proven over sockets instead of staged files.
  */
class HttpSourceSpec extends SparkSpec {

  private def drain(server: HttpReplayServer, sink: String,
                    options: Map[String, String] = Map.empty): Array[(Long, String, String)] = {
    val reader = spark.readStream.format("graft-http")
      .option("url", server.url)
      .option("maxTicksPerTrigger", "1")
    options.foreach { case (k, v) => reader.option(k, v) }
    val query = reader.load()
      .writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
  }

  test("healthy feed: per-tick payloads arrive exactly, one tick per micro-batch") {
    val server = new HttpReplayServer(IndexedSeq("""{"a":1}""", """{"a":2}"""))
    server.start()
    try {
      val rows = drain(server, "http_healthy")
      assert(rows.toSeq == Seq((0L, """{"a":1}""", null), (1L, """{"a":2}""", null)),
        s"payloads must round-trip byte-exactly: ${rows.toSeq}")
    } finally server.stop()
  }

  test("S2: a failing tick becomes a (NULL, error) row — healthy ticks keep flowing") {
    val server = new HttpReplayServer(IndexedSeq("ok0", "ok1", "ok2"),
      failTicks = Set(1))
    server.start()
    try {
      val rows = drain(server, "http_deadletter")
      assert(rows.length == 3, s"the stream must not die on a 5xx: ${rows.toSeq}")
      assert(rows(0) == ((0L, "ok0", null)) && rows(2) == ((2L, "ok2", null)),
        s"healthy ticks must flow around the failure: ${rows.toSeq}")
      val (t, body, err) = rows(1)
      assert(t == 1L && body == null && err != null && err.contains("HTTP 500"),
        s"the failed fetch must surface as the reference's (None, error) pair: ${rows(1)}")
      // The dead-letter split a consumer runs (q_deadletter's routing):
      val dlq = rows.filter(_._3 != null)
      assert(dlq.map(_._1).toSeq == Seq(1L), "exactly the poisoned tick routes to the DLQ")
    } finally server.stop()
  }

  test("S2: a slow endpoint trips req.timeout-ms into an error row, not a hang or crash") {
    val server = new HttpReplayServer(IndexedSeq("slow-payload"), delayMs = 2000L)
    server.start()
    try {
      val rows = drain(server, "http_timeout", Map("req.timeout-ms" -> "150"))
      assert(rows.length == 1, s"one tick, one row: ${rows.toSeq}")
      val (_, body, err) = rows(0)
      assert(body == null && err != null && err.contains("SocketTimeoutException"),
        s"the timeout must be captured as the error column: ${rows(0)}")
    } finally server.stop()
  }

  test("S3: per-source headers — required UA rejected without the option, accepted with it") {
    val server = new HttpReplayServer(IndexedSeq("guarded-payload"),
      requiredHeaders = Map("User-Agent" -> "graft-engine/1.0"))
    server.start()
    try {
      // Headers ride EVERY request, including the driver's tick poll —
      // so a misconfigured source (missing UA) fails LOUDLY at the first
      // poll with the HTTP status, the fail-at-wiring stance the replay
      // source takes for invalid req.* options.
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        drain(server, "http_no_ua")
      }
      assert(e.getMessage.contains("HTTP 403"),
        s"the poll failure must surface the feed's rejection: ${e.getMessage}")
      val accepted = drain(server, "http_with_ua",
        Map("req.User-Agent" -> "graft-engine/1.0"))
      assert(accepted.toSeq == Seq((0L, "guarded-payload", null)),
        s"the req.* header must satisfy the feed: ${accepted.toSeq}")
    } finally server.stop()
  }

  test("S3: credential-bearing req.* values are redacted in the scan description") {
    val table = new HttpSourceProvider().getTable(null, Array.empty,
        java.util.Map.of("url", "http://127.0.0.1:1",
          "req.auth-token", "s3cret", "req.User-Agent", "graft-engine/1.0"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val desc = table.newScanBuilder(CaseInsensitiveStringMap.empty()).build().description()
    assert(desc.contains("auth-token=***") && !desc.contains("s3cret"),
      s"credentials must never surface in plan text: $desc")
    assert(desc.contains("user-agent=graft-engine/1.0"),
      s"non-secret options must surface for operability: $desc")
  }

  test("restart from checkpoint: committed ticks are not refetched, new ticks resume the offset") {
    // The replay contract over sockets: drain a 2-tick feed, grow it to
    // 4 ticks, restart from the SAME checkpoint — the resumed query must
    // fetch ONLY ticks 2 and 3 (committed tick-index offsets, exactly
    // like the file-index source), and the sink must hold each tick once.
    // "Growth" is modeled as two servers sharing the tick prefix (the
    // payloads are immutable, so a 4-tick feed IS the grown 2-tick feed).
    val ckpt = java.nio.file.Files.createTempDirectory("graft_http_ckpt_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_http_out_").toString
    def drainTo(s: HttpReplayServer): Unit = {
      val q = spark.readStream.format("graft-http")
        .option("url", s.url).option("maxTicksPerTrigger", "1")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val s1 = new HttpReplayServer(IndexedSeq("t0", "t1"))
    s1.start()
    try drainTo(s1) finally s1.stop()
    val s2 = new HttpReplayServer(IndexedSeq("t0", "t1", "t2", "t3"))
    s2.start()
    val before = s2.requestCount
    try drainTo(s2) finally s2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((0L, "t0"), (1L, "t1"), (2L, "t2"), (3L, "t3")),
      s"each tick must land exactly once across the restart: $rows")
    // The resumed run fetched only the NEW ticks (plus counter polls):
    // no /tick/0 or /tick/1 GETs hit the second server.
    assert(s2.requestCount - before < 2 + 4,
      s"resume must not refetch committed ticks (saw ${s2.requestCount - before} requests)")
  }

  test("a feed whose tick history shrinks below a committed offset fails loudly") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val server = new HttpReplayServer(IndexedSeq("t0"))
    server.start()
    try {
      val stream = new graft.sources.HttpMicroBatchStream(server.url, None,
        graft.sources.RequestOptions(Map.empty))
      val e = intercept[IllegalStateException] {
        stream.latestOffset(graft.sources.FileIndexOffset(5), ReadLimit.allAvailable())
      }
      assert(e.getMessage.contains("committed offset 5"),
        s"the failure must name the committed position: ${e.getMessage}")
    } finally server.stop()
  }
}
