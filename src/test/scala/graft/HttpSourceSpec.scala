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
