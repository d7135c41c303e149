package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe (round 20, VERDICT item #1): where do the streaming family's
  * per-query constants go, and which STORE-LIFECYCLE knobs — not a provider
  * swap, not fewer state partitions — actually trim them?
  *
  * Background (round-19 receipts): q_stream_tick's ~1.6 s splits into two
  * micro-batches of triggerExecution (addBatch 0.51/0.30 s) plus
  * offset/commit WAL writes; the RocksDB-vs-heap delta is ~0.3-0.4 s of
  * store open/commit constants per query. The suite accumulates loaded
  * RocksDB providers across all 39 queries (default unload path is the
  * 60 s maintenance sweep noticing the query's run id went inactive), so
  * late queries also inherit the pile-up.
  *
  * Scenarios measured here, each a documented Spark 4.x state-store
  * lifecycle conf (NOT provider swaps):
  *  - base    : the registered configuration as-is.
  *  - unload  : `stateStore.unloadOnCommit=true` — task-thread runs
  *              maintenance + closes each store on commit; providers never
  *              pile up, at the price of a reload on the next batch.
  *  - maint2s : `stateStore.maintenanceInterval=2s` — keep the async
  *              lifecycle but notice inactive providers ~30× sooner.
  *  - bounded : `rocksdb.boundedMemoryUsage=true` (+512 MB cap) — one
  *              shared block/memtable budget across instances instead of
  *              per-instance allocations.
  *
  * Interleaved best-of-N (scenario rotation inside one session) — the only
  * methodology that resolves ±0.3 s effects on this box. Run:
  * `sbt "runMain graft.StreamLifeProbe /root/testdata/sf0.1 3"`.
  */
object StreamLifeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.hadoop.fs.file.impl",
        "graft.hadoop.GraftLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.hadoop.GraftLocalFs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = Seq("q_stream_tick", "q_stream_join", "q_stream_dedup",
      "q_stream_session", "q_stream_distinct")
      .map(n => n -> SparkEntry.queries(n))

    val scenarios: Seq[(String, Map[String, String])] = Seq(
      "base" -> Map.empty,
      "unload" -> Map(
        "spark.sql.streaming.stateStore.unloadOnCommit" -> "true"),
      "maint2s" -> Map(
        "spark.sql.streaming.stateStore.maintenanceInterval" -> "2s"),
      "bounded" -> Map(
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> "512"),
    )

    def withConfs[A](confs: Map[String, String])(work: => A): A = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try work finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    // Warmup: session boot + replay staging + codegen, outside every number.
    graft.streaming.StreamOps.stageReplayDir(spark, sfDir)
    queries.head._2(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val times = mutable.Map.empty[(String, String), mutable.ListBuffer[Double]]
    for (rep <- 1 to reps; (scen, confs) <- scenarios; (qn, fn) <- queries) {
      val t0 = System.nanoTime()
      withConfs(confs) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val s = (System.nanoTime() - t0) / 1e9
      times.getOrElseUpdate((scen, qn), mutable.ListBuffer.empty) += s
      println(f"[life-probe] rep$rep $scen%-8s $qn%-20s $s%6.2f s")
    }

    println("\n[life-probe] best-of-" + reps + " matrix (seconds):")
    val scens = scenarios.map(_._1)
    println(f"${"query"}%-20s " + scens.map(s => f"$s%8s").mkString)
    queries.foreach { case (qn, _) =>
      val row = scens.map(s => f"${times((s, qn)).min}%8.2f").mkString
      println(f"$qn%-20s " + row)
    }
    scens.foreach { s =>
      val tot = queries.map { case (qn, _) => times((s, qn)).min }.sum
      println(f"[life-probe] total-best $s%-8s $tot%6.2f s")
    }

    // Per-batch breakdown on the winner candidates: one instrumented run
    // each for base and unload, dumping durationMs + RocksDB custom metrics.
    val captured = mutable.ListBuffer.empty[String]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val st = p.stateOperators.headOption.map { so =>
          import scala.jdk.CollectionConverters._
          val cm = so.customMetrics.asScala.toSeq
            .filter(_._2 != 0).sortBy(-_._2)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          s"commit=${so.commitTimeMs}ms ALL[$cm]"
        }.getOrElse("")
        captured += s"batch=${p.batchId} " +
          s"trigger=${dur.get("triggerExecution")}ms " +
          s"addBatch=${dur.get("addBatch")}ms " +
          s"commitOffsets=${dur.get("commitOffsets")}ms " +
          s"walCommit=${dur.get("walCommit")}ms " +
          s"queryPlanning=${dur.get("queryPlanning")}ms $st"
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    Seq("base" -> Map.empty[String, String],
        "unload" -> Map(
          "spark.sql.streaming.stateStore.unloadOnCommit" -> "true"))
      .foreach { case (scen, confs) =>
        captured.clear()
        withConfs(confs) {
          SparkEntry.queries("q_stream_tick")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        println(s"\n[life-probe] q_stream_tick per-batch breakdown ($scen):")
        captured.foreach(l => println(s"[life-probe]   $l"))
      }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
