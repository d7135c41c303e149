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
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail) {
      println(s"=== $q ===")
      SparkEntry.queries(q)(spark, args.head).explain("formatted")
    }
    spark.stop()
  }
}
