package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-10 scaling story: quantifies the LSH geometry
  * lever on [[graft.operators.Similarity]]'s banded sign-LSH candidate
  * stage. At FIXED geometry (bands×rows) bucket occupancy grows with the
  * corpus, so candidate mass grows ~n²/2^rows — the measured
  * q_cosine_neardup tail exponent >1 at ×10. The documented production
  * answer is rows ~ log₂(n): hold per-bucket occupancy constant and the
  * candidate stage returns to ~linear. This main prints, for a fixture
  * dir, the candidate-pair count and wall time at the default (4,4)
  * geometry and at the occupancy-compensating (2,8) geometry — the
  * numbers BASELINE.md's scaling note records.
  *
  * Usage: runMain graft.LshGeomProbe <sfDir>
  */
object LshGeomProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/tmp/graft_stress_x10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.Tables.embeddings(spark, d).count()
    for ((bands, rows) <- Seq((4, 4), (2, 8))) {
      // Warm + timed, best-of-2: same stance as Bench.
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val c = graft.operators.Similarity
          .bandCandidates(spark, d, bands, rows).count()
        (c, (System.nanoTime() - t0) / 1e9)
      }
      val (c1, t1) = once()
      val (_, t2) = once()
      println(f"geom=($bands%d,$rows%d) vectors=$n%d candidates=$c1%d " +
        f"wall=${math.min(t1, t2)}%.2f s")
    }
    spark.stop()
  }
}
