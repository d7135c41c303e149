package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}

import graft.streaming.{BandClaimProcessor, StreamOps}

/** Dev probe (the [[LshGeomProbe]] pattern — measurement tooling, not a
  * registered query): splits q_stream_quality's per-row admission cost
  * into its two stages to answer the round-11 verdict's watch item
  * ("1.6 k rows/s at base — profile whether the shingle→MinHash
  * projection or the transformWithState round-trip dominates").
  *
  * Three timed runs over the SAME doc replay + session config as the
  * registered query (RocksDB, changelog checkpointing, 4 state
  * partitions, AvailableNow, maxFilesPerTrigger=1):
  *
  *  1. full      — quality filter → minhash band projection → band-claim
  *                 TWS → memory sink (the registered pipeline).
  *  2. projection— the same scan + filter + band projection, NO stateful
  *                 operator (noop streaming sink): isolates the per-doc
  *                 shingle→md5→16-permutation→band-key expression chain.
  *  3. state     — BandClaimProcessor fed PRECOMPUTED band rows (the
  *                 batch-side projection staged as a 2-file replay):
  *                 isolates the TWS shuffle + RocksDB round-trip.
  *
  * Run: `sbt "runMain graft.StreamQualityProbe [sfDir]"`. Findings are
  * recorded in BASELINE.md (stream-quality cost-split note).
  */
object StreamQualityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val replay = StreamOps.stageDocReplayDir(spark, sfDir)
    val nDocs = Tables.documents(spark, sfDir).count()
    def ckpt() = java.nio.file.Files.createTempDirectory("sqprobe_").toString

    def timed(tag: String)(run: => Unit): Double = {
      val t0 = System.nanoTime()
      run
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag%-12s $s%8.2f s  (${nDocs / s}%8.0f docs/s)")
      s
    }

    def bandStream = graft.operators.TextOps.minhashBandRows(
      StreamOps.docsStream(spark, replay).filter(StreamOps.qualityKeepExpr))
      .select(col("band_key"), col("doc_id"))

    // Warmup: codegen + parquet reader + RocksDB JNI load.
    StreamOps.queries("q_stream_quality")(spark, sfDir).collect(): Unit

    val tFull = timed("full") {
      StreamOps.startWithStatePartitions(spark, 4) {
        bandStream.as[(String, Long)]
          .groupByKey(_._1)
          .transformWithState(new BandClaimProcessor, TimeMode.None(),
            OutputMode.Append())
          .toDF()
          .writeStream.option("checkpointLocation", ckpt())
          .format("noop").outputMode("append")
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
      }
    }

    val tProj = timed("projection") {
      StreamOps.startWithStatePartitions(spark, 4) {
        bandStream
          .writeStream.option("checkpointLocation", ckpt())
          .format("noop").outputMode("append")
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
      }
    }

    // Precomputed band rows staged as a 2-file replay (same tick count as
    // the doc replay) — the state machine's input without the projection.
    val bandDir = java.nio.file.Files.createTempDirectory("sqprobe_bands_")
    graft.operators.TextOps.minhashBandRows(
        Tables.documents(spark, sfDir).filter(StreamOps.qualityKeepExpr))
      .select(col("band_key"), col("doc_id"))
      .coalesce(2).write.mode("overwrite").parquet(bandDir.toString)
    val tState = timed("state") {
      StreamOps.startWithStatePartitions(spark, 4) {
        spark.readStream
          .schema("band_key STRING, doc_id BIGINT")
          .option("maxFilesPerTrigger", "1")
          .parquet(bandDir.toString)
          .as[(String, Long)]
          .groupByKey(_._1)
          .transformWithState(new BandClaimProcessor, TimeMode.None(),
            OutputMode.Append())
          .toDF()
          .writeStream.option("checkpointLocation", ckpt())
          .format("noop").outputMode("append")
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
      }
    }

    println(f"[probe] docs=$nDocs  full=$tFull%.2f  projection=$tProj%.2f " +
      f"state=$tState%.2f  (proj share=${tProj / tFull * 100}%.0f%%, " +
      f"state share=${tState / tFull * 100}%.0f%%)")
    spark.stop()
  }
}
