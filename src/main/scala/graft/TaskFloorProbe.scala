package graft

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev probe (round 20, VERDICT item #4): attribute the 350-query flat
  * band's ~0.3-0.5 s per-query fixed cost at the STAGE/TASK level. The
  * round-19 QueryPlanningTracker probe ruled out Catalyst (analysis
  * ≤ 14 ms/query); this probe splits the remaining wall time into
  *
  *   - task compute (Σ executorRunTime / observed concurrency),
  *   - task launch overhead (Σ (task wall − executorRunTime)):
  *     serialization, scheduler delay, result fetch,
  *   - stage-boundary and job-boundary DRIVER GAPS (wall time where no
  *     job was running, or a job was running but no stage had active
  *     tasks): DAG scheduling, AQE re-planning rounds, noop commit.
  *
  * Eight representatives spanning the band's shape (pure-scan floor,
  * 1-shuffle aggregates, window queries, a 2-join TPC-H member). Second
  * pass per query is the reported one (codegen/scan caches warm — the
  * same best-of-2 discipline the bench applies).
  *
  * Run: `sbt "runMain graft.TaskFloorProbe /root/testdata/sf0.1"`.
  */
object TaskFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    val reps = Seq("q_top1", "q_tpch_q6", "q_union", "q_wau", "q_window_rank",
      "q_theil_sen", "q_tpch_q3", "q_benford")

    // Per-query event capture. Single-threaded bench loop: everything
    // between reset() and snapshot() belongs to the current query.
    case class TaskRow(launch: Long, finish: Long, run: Long, deser: Long,
                       resultSer: Long, gc: Long)
    val tasks = mutable.ListBuffer.empty[TaskRow]
    val stageSpans = mutable.ListBuffer.empty[(Long, Long)]
    val jobSpans = mutable.ListBuffer.empty[(Long, Long)]
    val jobStarts = mutable.Map.empty[Int, Long]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val i = e.taskInfo
        val m = e.taskMetrics
        if (i != null && m != null)
          tasks += TaskRow(i.launchTime, i.finishTime, m.executorRunTime,
            m.executorDeserializeTime, m.resultSerializationTime, m.jvmGCTime)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = e.stageInfo
          (si.submissionTime, si.completionTime) match {
            case (Some(a), Some(b)) => stageSpans += ((a, b))
            case _ =>
          }
        }
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        jobStarts(e.jobId) = e.time
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobStarts.remove(e.jobId).foreach(s => jobSpans += ((s, e.time)))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def reset(): Unit = listener.synchronized {
      tasks.clear(); stageSpans.clear(); jobSpans.clear(); jobStarts.clear()
    }
    // Merge possibly-overlapping [start,end] spans and sum covered time.
    def covered(spans: Seq[(Long, Long)]): Long = {
      val s = spans.sortBy(_._1)
      var total = 0L; var curA = Long.MinValue; var curB = Long.MinValue
      s.foreach { case (a, b) =>
        if (a > curB) { total += math.max(0L, curB - curA); curA = a; curB = b }
        else curB = math.max(curB, b)
      }
      total + math.max(0L, curB - curA)
    }

    // Untimed warmup.
    SparkEntry.queries(reps.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    println(f"[floor-probe] ${"query"}%-14s ${"wall"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"sumRun"}%8s ${"sumWall"}%8s ${"launchOvh"}%9s ${"jobCov"}%8s ${"stageCov"}%8s ${"jobGap"}%8s ${"stageGap"}%8s")
    // Phases: warm best-of-2 under the registered config (aqe), then the
    // SAME queries with AQE off — attribution only (AQE stays ON in the
    // bench: partition coalescing/skew handling are the scale-correct
    // posture; this measures how much of the flat band's driver gap is
    // AQE's per-stage job splitting + re-optimization rounds).
    for (aqe <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      for (q <- reps; pass <- 1 to 2) {
        reset()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wallMs = (System.nanoTime() - t0) / 1e6
        Thread.sleep(150) // let the listener bus drain
        listener.synchronized {
          val nT = tasks.size
          val sumRun = tasks.map(_.run).sum
          val sumWall = tasks.map(t => t.finish - t.launch).sum
          val ovh = sumWall - sumRun
          val jobCov = covered(jobSpans.toSeq)
          val stageCov = covered(stageSpans.toSeq)
          val tag = (if (pass == 2) q else s"$q(p1)") +
            (if (aqe) "" else "[noaqe]")
          println(f"[floor-probe] $tag%-22s ${wallMs}%7.0f ${jobSpans.size}%5d ${stageSpans.size}%6d $nT%6d $sumRun%8d $sumWall%8d $ovh%9d $jobCov%8d $stageCov%8d ${wallMs - jobCov}%8.0f ${jobCov - stageCov}%8d")
        }
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
