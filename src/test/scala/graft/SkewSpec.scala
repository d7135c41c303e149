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

  test("AQE splits a hot band bucket in the real LSH candidate join (bandCandidates)") {
    // The claim at Similarity.scala's banded-LSH design notes, demonstrated
    // on the ACTUAL operator: a near-universal sign pattern (think: all
    // embeddings of boilerplate documents pointing the same way) funnels
    // hundreds of vectors into ONE (band, bkey) bucket, making that
    // partition of the candidate self-join the skew case. With thresholds
    // scaled to fixture bytes, AQE must split it — and the candidate set
    // must equal the non-AQE plan's.
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_emb_").toString
    val rnd = new scala.util.Random(42)
    // 400 hot vectors: every coordinate positive → all 16 plane bits 1 →
    // the SAME bkey in every band. 400 cold vectors: seeded random signs,
    // spread across the 16 buckets per band.
    val rows: Seq[(Long, Array[Float], Int)] =
      (0 until 400).map { i =>
        (i.toLong, Array.fill(64)(1.0f + (i % 7) * 0.01f), 0)
      } ++ (400 until 800).map { i =>
        (i.toLong, Array.fill(64)(if (rnd.nextBoolean()) 1.0f else -1.0f), 1)
      }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val skewed = spark.newSession()
    skewed.conf.set("spark.sql.adaptive.enabled", "true")
    skewed.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    skewed.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    skewed.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    skewed.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    skewed.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    skewed.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    skewed.conf.set("spark.sql.shuffle.partitions", "4")
    val cand = Similarity.bandCandidates(skewed, dir, Similarity.NdBands, Similarity.NdRows)
    val got = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val finalPlan = cand.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), "plan must have executed")
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the hot band bucket:\n$finalPlan")
    // Every hot pair is a candidate (they agree on all planes of every
    // band), and the split plan loses/duplicates nothing vs no-AQE.
    assert(got.size >= 400 * 399 / 2, s"hot bucket pairs missing: ${got.size}")
    val plain = spark.newSession()
    plain.conf.set("spark.sql.adaptive.enabled", "false")
    plain.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val expected = Similarity.bandCandidates(plain, dir, Similarity.NdBands, Similarity.NdRows)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, "AQE and non-AQE candidate sets must be identical")
  }

  test("AQE does NOT split a skewed bucketed join (no exchange to re-plan) — the manual-salting regime") {
    // q_salted_join's scaladoc (Analytics.scala) names where
    // OptimizeSkewedJoin cannot reach: bucketed/pre-partitioned inputs.
    // The rule re-splits SHUFFLE output partitions; a co-located bucketed
    // join has no shuffle stage on either side, so the hot bucket stays
    // whole no matter how aggressive the skew thresholds are — the regime
    // where the manual salting lever (q_salted_agg/q_salted_join) is the
    // only spreader. Same skewed data and same forced thresholds as the
    // first test, which DOES split once a shuffle exists.
    val base = java.nio.file.Files.createTempDirectory("graft_skewbkt_").toString
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
    try {
      skewed.range(0, 55000)
        .select(when($"id" < 50000, lit(0L)).otherwise($"id" % 100).as("k"),
          $"id".as("v"))
        .write.bucketBy(4, "k").option("path", s"$base/skew_left")
        .saveAsTable("skew_left_b")
      skewed.range(0, 100).select($"id".as("k"), ($"id" * 10).as("w"))
        .write.bucketBy(4, "k").option("path", s"$base/skew_right")
        .saveAsTable("skew_right_b")
      val joined = skewed.table("skew_left_b")
        .join(skewed.table("skew_right_b"), "k")
      val n = joined.collect().length
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), "plan must have executed")
      assert(!finalPlan.contains("Exchange hashpartitioning"),
        s"bucketed join must stay co-located (no shuffle):\n$finalPlan")
      assert(!finalPlan.contains("skew=true"),
        "OptimizeSkewedJoin must NOT fire on a bucketed join — there is " +
          s"no shuffle partition to re-split:\n$finalPlan")
      assert(n == 55000, s"join result must be complete, got $n")
    } finally {
      skewed.sql("DROP TABLE IF EXISTS skew_left_b")
      skewed.sql("DROP TABLE IF EXISTS skew_right_b")
    }
  }
}
