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
}
