package graft

import org.apache.spark.sql.functions._

/** The scaladocs' recurring "hot keys are AQE's skew-join case" claim,
  * made real: with skew thresholds scaled down to fixture size, AQE must
  * actually split the hot partition of a skewed sort-merge join — and the
  * result must equal the non-AQE plan's.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the skewed join partition (skew=true in the final plan)") {
    val skewed = spark.newSession()
    skewed.conf.set("spark.sql.adaptive.enabled", "true")
    skewed.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    skewed.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    skewed.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    skewed.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    skewed.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    skewed.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    skewed.conf.set("spark.sql.shuffle.partitions", "4")
    import skewed.implicits._
    // 50k rows on ONE key vs 50 on each of 99 others: partition holding
    // key 0 is ~200x the median.
    val left = skewed.range(0, 55000)
      .select(when($"id" < 50000, lit(0L)).otherwise($"id" % 100).as("k"),
        $"id".as("v"))
    val right = skewed.range(0, 100).select($"id".as("k"), ($"id" * 10).as("w"))
    val joined = left.join(right, "k")
    // Materialize through THIS Dataset's QueryExecution — a count() would
    // run a different one and leave this plan un-finalized.
    val n = joined.collect().length
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), "plan must have executed")
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n$finalPlan")
    // Same rows as the no-AQE plan.
    val plain = spark.newSession()
    plain.conf.set("spark.sql.adaptive.enabled", "false")
    plain.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val left2 = plain.range(0, 55000)
      .select(when(col("id") < 50000, lit(0L)).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
    val right2 = plain.range(0, 100).select(col("id").as("k"), (col("id") * 10).as("w"))
    assert(left2.join(right2, "k").count() == n)
  }
}
