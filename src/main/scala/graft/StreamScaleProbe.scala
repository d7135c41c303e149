package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}

import graft.streaming.{BandClaimProcessor, StreamOps, WindowQuotaProcessor}

/** Dev probe (the [[StreamQualityProbe]] pattern — measurement tooling,
  * not a registered query) answering the round-13 verdict's two standing
  * streaming-throughput questions with CURVES instead of claims:
  *
  *  1. **q_stream_quality (task: scale it or pin why it can't).** The
  *     round-12 probe split the cost ~58/47 between the per-doc signature
  *     projection and the band-claim state machine, but never measured
  *     whether the signature work PARALLELIZES. The structural pin: the
  *     staged replay writes each tick as ONE single-row-group parquet
  *     file, and a parquet file with one row group is sequential no
  *     matter how many byte-range splits the scheduler makes — so the
  *     whole md5×16-permutation chain runs on ONE core per micro-batch.
  *     The fix is not a smaller `maxPartitionBytes` (useless against one
  *     row group) but an explicit `repartition(n)` of the RAW doc rows
  *     before the projection: the scan task then only reads + routes
  *     bytes, and the expensive signature chain runs on n cores. This
  *     probe sweeps (input repartition) × (state partitions) over the
  *     full registered pipeline.
  *  2. **q_stream_throttle (task: demonstrate the state-partition
  *     knob).** Throughput plateaued 260 k → 263 k rows/s from ×10 → ×40
  *     at the pinned 8 state partitions — a linear wall at fixed
  *     parallelism. `startWithStatePartitions(spark, n)` is the designed
  *     lever; this probe runs the identical pipeline at 8 vs 32 state
  *     partitions.
  *
  * Run per scale dir:
  * `sbt "runMain graft.StreamScaleProbe /tmp/graft_stress_x40 quality,throttle"`.
  * Findings land in BASELINE.md (streaming partition-scaling tables).
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val modes = args.lift(1).getOrElse("quality,throttle").split(",").toSet
    val cpus = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def ckpt() = java.nio.file.Files.createTempDirectory("ssprobe_").toString

    def timed(tag: String, rows: Long)(run: => Unit): Unit = {
      val t0 = System.nanoTime()
      run
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale-probe] $tag%-28s ${s}%8.2f s  (${rows / s}%9.0f rows/s)")
    }

    if (modes("quality")) {
      val replay = StreamOps.stageDocReplayDir(spark, sfDir)
      val nDocs = Tables.documents(spark, sfDir).count()
      println(s"[scale-probe] quality sweep over $nDocs docs " +
        s"($sfDir, local[$cpus])")

      // rep = -1 means repartition(defaultParallelism) — the registered
      // query's production shape (parallelism follows the session cores).
      def run(rep: Int, sp: Int): Unit =
        StreamOps.startWithStatePartitions(spark, sp) {
          val docs0 = StreamOps.docsStream(spark, replay)
          val n = if (rep == -1) spark.sparkContext.defaultParallelism else rep
          val docs = if (n > 0) docs0.repartition(n) else docs0
          graft.operators.TextOps
            .minhashBandRows(docs.filter(StreamOps.qualityKeepExpr))
            .select(col("band_key"), col("doc_id"))
            .as[(String, Long)]
            .groupByKey(_._1)
            .transformWithState(new BandClaimProcessor, TimeMode.None(),
              OutputMode.Append())
            .toDF()
            .writeStream.option("checkpointLocation", ckpt())
            .format("noop").outputMode("append")
            .trigger(Trigger.AvailableNow()).start().awaitTermination()
        }

      run(0, 4) // warmup: codegen + parquet + RocksDB JNI
      for ((rep, sp) <- Seq((0, 4), (8, 4), (-1, 4), (-1, 8), (-1, 32)))
        timed(s"quality rep=$rep sp=$sp", nDocs)(run(rep, sp))
    }

    if (modes("join")) {
      // Round-15 task (the round-14 verdict's last perf-watch row): the
      // stream-stream join ran on 4 state partitions, never swept. A
      // stream-stream join keeps FOUR RocksDB stores per partition (two
      // per side), so the fixed per-batch cost is 4x the partition knob —
      // widening helps only once state volume outgrows it.
      val replay = StreamOps.stageReplayDir(spark, sfDir)
      val nEvents = Tables.events(spark, sfDir).count()
      println(s"[scale-probe] stream-join sweep over $nEvents events ($sfDir)")

      def run(sp: Int): Unit =
        StreamOps.startWithStatePartitions(spark, sp) {
          StreamOps.clickViewPairs(StreamOps.eventsStream(spark, replay))
            .writeStream.option("checkpointLocation", ckpt())
            .format("noop").outputMode("append")
            .trigger(Trigger.AvailableNow()).start().awaitTermination()
        }

      run(4) // warmup: codegen + parquet + RocksDB JNI
      for (sp <- Seq(4, 8, 32))
        timed(s"join sp=$sp", nEvents)(run(sp))
    }

    if (modes("throttle")) {
      val replay = StreamOps.stageReplayDir(spark, sfDir)
      val nEvents = Tables.events(spark, sfDir).count()
      println(s"[scale-probe] throttle sweep over $nEvents events ($sfDir)")

      def run(sp: Int): Unit =
        StreamOps.startWithStatePartitions(spark, sp) {
          spark.readStream.schema(StreamOps.eventsRawSchema)
            .option("maxFilesPerTrigger", "1")
            .parquet(replay)
            .select(col("user_id"), col("ts"), col("event_id"))
            .as[(Long, Long, Long)]
            .groupByKey(r => (r._1,
              Math.floorDiv(r._2, StreamOps.ThrottleWinUs) * StreamOps.ThrottleWinUs))
            .transformWithState(new WindowQuotaProcessor(StreamOps.ThrottleK),
              TimeMode.None(), OutputMode.Append())
            .toDF()
            .writeStream.option("checkpointLocation", ckpt())
            .format("noop").outputMode("append")
            .trigger(Trigger.AvailableNow()).start().awaitTermination()
        }

      run(8) // warmup
      for (sp <- Seq(8, 32))
        timed(s"throttle sp=$sp", nEvents)(run(sp))
    }

    spark.stop()
  }
}
