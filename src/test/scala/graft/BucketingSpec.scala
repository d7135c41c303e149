package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Proves the repeated "at 100 TB both sides would be bucketed" claim in
  * the multimodal/join scaladocs: with documents and embeddings bucketed on
  * the join key (same bucket count), the equi-join plans as a SortMergeJoin
  * with NO shuffle exchange on either side — the co-located join a
  * production deployment relies on.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed documents ⋈ embeddings plans with no shuffle Exchange") {
    val base = Files.createTempDirectory("graft_buckets_").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // Force a non-broadcast join so the bucket layout is what avoids the
    // shuffle (at real scale neither side is broadcastable anyway).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.documents(spark, sfDir)
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", s"$base/docs_b").saveAsTable("docs_b")
      Tables.embeddings(spark, sfDir)
        .write.bucketBy(8, "vec_id").sortBy("vec_id")
        .option("path", s"$base/embs_b").saveAsTable("embs_b")

      val joined = spark.table("docs_b")
        .join(spark.table("embs_b"), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("label"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == Tables.documents(spark, sfDir).count(),
        "co-located join must still produce the full 1:1 join result")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_b")
      spark.sql("DROP TABLE IF EXISTS embs_b")
    }
  }

  test("q_write_bucketed layout: group-by on the bucket column plans with no hash Exchange; date predicate prunes partitions") {
    val tbl = graft.sources.WritePath.writeBucketed(spark, sfDir)
    try {
      // The registered query's own aggregate: bucketing on user_id must
      // satisfy the aggregation's clustering requirement, so the ONLY
      // exchange in the plan is the rangepartitioning for the final sort.
      val agg = graft.sources.WritePath.readBackAgg(spark.table(tbl))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed group-by must not shuffle:\n$aggPlan")
      assert(aggPlan.contains("Bucketed: true"),
        s"scan must report the bucketed layout:\n$aggPlan")

      // Self-join on the bucket column: no shuffle on either side (the
      // property BucketingSpec previously proved only on fixture tables,
      // now on the table the PRODUCT path writes).
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val t = spark.table(tbl)
        val joined = t.select(col("user_id"), col("event_id"))
          .join(t.select(col("user_id").as("uid2"), col("value")),
            col("user_id") === col("uid2"))
        val jp = joined.queryExecution.executedPlan.toString
        assert(jp.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$jp")
        assert(!jp.contains("Exchange hashpartitioning"),
          s"bucketed self-join must not shuffle either side:\n$jp")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

      // Partition pruning: a date predicate becomes a partition filter.
      val pruned = spark.table(tbl)
        .filter(col("event_date") === "2024-01-02")
      val pp = pruned.queryExecution.executedPlan.toString
      assert(pp.contains("PartitionFilters: [isnotnull(event_date"),
        s"date predicate must prune partitions, not filter rows:\n$pp")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("partitioned layout: an event_type predicate prunes partitions at the scan") {
    val base = Files.createTempDirectory("graft_part_").toString + "/events"
    Tables.events(spark, sfDir)
      .write.partitionBy("event_type").parquet(base)
    val q = spark.read.parquet(base)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"predicate must become a partition filter, not a row filter:\n$scan")
    // Row-level predicates on data columns still push to parquet.
    val q2 = spark.read.parquet(base).filter(col("value") > 100)
    assert(q2.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,100"),
      "data-column predicate must reach the parquet reader")
    assert(q.count() == Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count())
  }
}
