package graft

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev probe (round 20, VERDICT item #6): skew receipts for the
  * candidate-pair-heavy dedup/text queries at ×10 scale. sf0.1 plan
  * audits showed clean shapes; the untested risk was a hot key turning
  * one task into the stage straggler at scale (guide §2.5: max/median
  * task duration ≥ 5-10× is the signal worth salting).
  *
  * Captures per-stage task-duration distributions and reports every
  * stage whose max/median exceeds a threshold, plus the per-query worst
  * ratio over stages with enough tasks for the ratio to mean anything.
  *
  * Run: `sbt "runMain graft.SkewProbe /tmp/graft_stress_x10"`.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_stress_x10")
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

    val queries = Seq("q_dedup_ensemble", "q_dedup_stages", "q_ngram_jaccard",
      "q_substring_dup", "q_clustering")

    // stageId -> (durations, shuffle read bytes)
    val stageTasks = mutable.Map.empty[Int, mutable.ListBuffer[(Long, Long)]]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val i = e.taskInfo
        if (i != null) {
          val sr = Option(e.taskMetrics)
            .map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
          stageTasks.getOrElseUpdate(e.stageId, mutable.ListBuffer.empty) +=
            ((i.finishTime - i.launchTime, sr))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    graft.operators.TextOps.stageGraphFamily(spark, sfDir)
    queries.head
    for (q <- queries) {
      listener.synchronized(stageTasks.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      listener.synchronized {
        // Only stages with >= 8 tasks and a non-trivial median can show
        // a meaningful straggler ratio.
        val rows = stageTasks.toSeq.flatMap { case (sid, ts) =>
          if (ts.size < 8) None else {
            val ds = ts.map(_._1).sorted
            val med = ds(ds.size / 2)
            if (med < 20) None
            else {
              val srs = ts.map(_._2).sorted
              Some((sid, ts.size, med, ds.last, ds.last.toDouble / med,
                srs(srs.size / 2), srs.last))
            }
          }
        }.sortBy(-_._5)
        val worst = rows.headOption.map(_._5).getOrElse(0.0)
        println(f"[skew-probe] $q%-18s wall=$wall%6.2f s  stages(n>=8,med>=20ms)=${rows.size}%3d  worst max/med=$worst%5.2f")
        rows.take(4).foreach { case (sid, n, med, mx, r, smed, smax) =>
          println(f"[skew-probe]    stage=$sid%5d tasks=$n%4d medMs=$med%6d maxMs=$mx%6d ratio=$r%5.2f shufMedB=$smed%9d shufMaxB=$smax%9d")
        }
      }
    }
    spark.stop()
  }
}
