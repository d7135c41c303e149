package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named registry queries —
  * the `.explain("formatted")` audit loop the scale notes are checked
  * against, runnable without editing code:
  * `sbt "runMain graft.ExplainCheck <sfDir> q_a q_b ..."`.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainCheck <sfDir> <query>...")
    // Mirror graft.Bench's session exactly (master, shuffle partitions,
    // extensions): a plan captured here must be the plan the bench runs —
    // the round-19 plan artifacts (plans/r19/*) are produced by this main.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Fork-free local FS (round 20) - mirrors the bench session.
      .config("spark.hadoop.fs.file.impl",
        "graft.hadoop.GraftLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.hadoop.GraftLocalFs")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Match the bench's staged environment so queries that consume the
    // session pins / replay dirs explain the same plan they are timed on.
    graft.streaming.StreamOps.stageReplayDir(spark, args.head): Unit
    graft.sources.FileSources.stageAll(spark, args.head)
    graft.operators.TextOps.stageGraphFamily(spark, args.head)
    // Optional: write each plan to $SPARK_GRAFT_EXPLAIN_DIR/<query>.txt
    // (the committed plans/r19 artifacts) in addition to stdout.
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
      .map(java.nio.file.Paths.get(_))
    outDir.foreach(java.nio.file.Files.createDirectories(_))
    for (q <- args.tail) {
      println(s"=== $q ===")
      val df = SparkEntry.queries(q)(spark, args.head)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(txt)
      outDir.foreach { dir =>
        java.nio.file.Files.writeString(dir.resolve(s"$q.txt"), txt)
      }
    }
    spark.stop()
  }
}
