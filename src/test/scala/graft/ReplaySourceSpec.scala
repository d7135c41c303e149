package graft

import graft.sources.{FileIndexOffset, ReplaySourceProvider, RequestOptions}
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.{Files, StandardCopyOption}

/** The DSv2 replay source's per-source configuration seam and its
  * fault-tolerance contract: `req.*` options are the slot a deployment's
  * source registry fills with per-endpoint auth/schema/rate config (the
  * reference injects an API key and headers per source,
  * /root/reference/app.py:71-72), and a staged file vanishing under a
  * committed offset must kill the replay loudly at the offset — never
  * silently skip data.
  */
class ReplaySourceSpec extends SparkSpec {

  private def provider = new ReplaySourceProvider

  test("req.* options: carried, validated, redacted in the scan description") {
    val replay = StreamOps.stageReplayDir(spark, sfDir)
    val table = provider.getTable(null, Array.empty,
        java.util.Map.of("path", replay,
          "req.schema-name", "events_v2",
          "req.auth-token", "s3cret",
          "req.rate-limit", "1"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val scan = table.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    val desc = scan.description()
    assert(desc.contains("schema-name=events_v2"),
      s"opaque request options must surface in the description: $desc")
    assert(desc.contains("auth-token=***") && !desc.contains("s3cret"),
      s"credential-bearing values must be redacted: $desc")
    assert(desc.contains("rate-limit=1"), desc)
  }

  test("req.rate-limit drives admission control end-to-end (one file per tick)") {
    val replay = StreamOps.stageReplayDir(spark, sfDir)
    // No maxFilesPerTrigger: the per-SOURCE rate limit alone must bound
    // each micro-batch to one file (2 staged files -> 2 data batches).
    val stream = spark.readStream
      .format("graft-replay")
      .option("req.rate-limit", "1")
      .load(replay)
      .withColumn("ts", Tables.usToTs("ts"))
    val query = StreamOps.tumblingCounts(stream)
      .writeStream.format("memory").queryName("req_rate_limit")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      query.awaitTermination()
      val dataBatches = query.recentProgress.filter(_.numInputRows > 0)
      assert(dataBatches.length == 2,
        s"rate-limit=1 must admit one file per tick, saw ${dataBatches.length} batches")
      val streamed = spark.table("req_rate_limit")
        .select(col("w.start").as("s"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("s"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally query.stop()
  }

  test("maxFilesPerTrigger alone drives admission through the 2-arg latestOffset path") {
    val replay = StreamOps.stageReplayDir(spark, sfDir)
    // No req.rate-limit: the per-QUERY option must reach getDefaultReadLimit
    // and bound each micro-batch to one file on its own (2 staged files ->
    // 2 data batches) — the execution path SupportsAdmissionControl routes
    // through latestOffset(start, limit), never the deprecated no-arg form.
    val stream = spark.readStream
      .format("graft-replay")
      .option("maxFilesPerTrigger", "1")
      .load(replay)
      .withColumn("ts", Tables.usToTs("ts"))
    val query = StreamOps.tumblingCounts(stream)
      .writeStream.format("memory").queryName("mfpt_only")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      query.awaitTermination()
      val dataBatches = query.recentProgress.filter(_.numInputRows > 0)
      assert(dataBatches.length == 2,
        s"maxFilesPerTrigger=1 must admit one file per tick, saw ${dataBatches.length} batches")
      val streamed = spark.table("mfpt_only")
        .select(col("w.start").as("s"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("s"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally query.stop()
  }

  test("admission control unit contract: 2-arg latestOffset clamps, no-arg throws") {
    val replay = StreamOps.stageReplayDir(spark, sfDir)
    val stream = new graft.sources.ReplayMicroBatchStream(replay, Some(1),
      StreamOps.eventsRawSchema)
    // Default read limit is the per-query cap...
    val limit = stream.getDefaultReadLimit
    assert(limit.isInstanceOf[org.apache.spark.sql.connector.read.streaming.ReadMaxFiles],
      s"expected ReadMaxFiles, got $limit")
    // ...and the 2-arg path advances exactly one file per call until the
    // 2-file staged listing is drained, then holds position.
    val o1 = stream.latestOffset(FileIndexOffset(0), limit)
    val o2 = stream.latestOffset(o1, limit)
    val o3 = stream.latestOffset(o2, limit)
    assert(Seq(o1, o2, o3).map(_.asInstanceOf[FileIndexOffset].idx) == Seq(1, 2, 2))
    // The deprecated no-arg entry point is a landmine by design: reaching
    // it would mean the engine bypassed admission control.
    intercept[UnsupportedOperationException](stream.latestOffset())
  }

  test("invalid request options fail at source resolution, not at the first batch") {
    def opts(kv: (String, String)*): CaseInsensitiveStringMap =
      new CaseInsensitiveStringMap(
        kv.foldLeft(new java.util.HashMap[String, String]()) { (m, p) =>
          m.put(p._1, p._2); m
        })
    val empty = intercept[IllegalArgumentException] {
      RequestOptions.from(opts("req.schema-name" -> "  "))
    }
    assert(empty.getMessage.contains("req.schema-name"))
    val zero = intercept[IllegalArgumentException] {
      RequestOptions.from(opts("req.rate-limit" -> "0"))
    }
    assert(zero.getMessage.contains("positive integer"))
    val nan = intercept[IllegalArgumentException] {
      RequestOptions.from(opts("req.rate-limit" -> "two"))
    }
    assert(nan.getMessage.contains("positive integer"))
  }

  test("a staged file deleted under a committed offset fails loudly with the position") {
    // Private copy of the staged replay dir — the shared one must survive.
    val staged = new java.io.File(StreamOps.stageReplayDir(spark, sfDir))
    val dir = Files.createTempDirectory("graft_replay_fault_")
    val copies = staged.listFiles.filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName).map { f =>
        Files.copy(f.toPath, dir.resolve(f.getName),
          StandardCopyOption.COPY_ATTRIBUTES).toFile
      }
    assert(copies.length == 2)

    val table = provider.getTable(null, Array.empty,
        java.util.Map.of("path", dir.toString))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val stream = table.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      .toMicroBatchStream(Files.createTempDirectory("graft_fault_ckpt_").toString)

    // Healthy: the full range plans one partition per file.
    assert(stream.planInputPartitions(FileIndexOffset(0), FileIndexOffset(2)).length == 2)

    // Fault: the second staged file vanishes after its offset committed.
    assert(copies.last.delete())

    // Replanning the committed range (the retry path) must die with the
    // range, not silently slice a shorter listing.
    val replan = intercept[IllegalStateException] {
      stream.planInputPartitions(FileIndexOffset(0), FileIndexOffset(2))
    }
    assert(replan.getMessage.contains("[0, 2)") &&
           replan.getMessage.contains("deleted"), replan.getMessage)

    // Advancing from the committed offset (the resume path) must die with
    // the offset, not report "no new data" against a shifted listing.
    val resume = intercept[IllegalStateException] {
      stream.asInstanceOf[graft.sources.ReplayMicroBatchStream]
        .latestOffset(FileIndexOffset(2), ReadLimit.allAvailable())
    }
    assert(resume.getMessage.contains("committed offset 2"), resume.getMessage)
  }
}
