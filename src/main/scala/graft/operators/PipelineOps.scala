package graft.operators

import java.util.UUID

import org.apache.spark.sql.pipelines.GraftPipelineBridge
import org.apache.spark.sql.pipelines.GraftPipelineBridge.TableSpec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark 4.1 DECLARATIVE PIPELINES (`spark-pipelines_2.13`) exercised
  * in-process through [[GraftPipelineBridge]]: the user declares WHAT each
  * table is (a SQL definition possibly referencing other declared tables)
  * and the runtime derives the dataflow graph, topologically schedules the
  * flows, and materializes every table — the reference app's implicit
  * Extract → Transform → Insight staging (app.py's fetch/normalize/agg
  * chain) stated declaratively instead of imperatively.
  *
  * Scale shape: each flow is an ordinary batch plan (Catalyst-optimized,
  * distributed); the runtime adds only driver-side scheduling. The
  * pipeline below is the canonical curate-then-aggregate chain: clean
  * (quality-filtered documents) feeds two downstream aggregates, so the
  * graph has a real fan-out edge and the clean relation materializes ONCE
  * — the declarative form of the session-pinning discipline the lexical
  * dedup family applies by hand.
  */
object PipelineOps {

  /** q_sdp_pipeline — declare clean → {per-source stats, per-lang stats}
    * and run the triggered update; returns the per-source table joined to
    * the per-lang roll-up via the shared clean relation. Oracle = the
    * same chain as nested SQL.
    */
  def qSdpPipeline(spark: SparkSession, d: String): DataFrame = {
    val db = s"sdp_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // The runtime validates the storage root as a URI (file://, s3a://…).
    val storage = java.nio.file.Files
      .createTempDirectory("graft_sdp_").toUri.toString
    GraftPipelineBridge.runBatchPipeline(spark, db, Seq(
      TableSpec("clean",
        s"""SELECT doc_id, source, lang, n_chars
           |FROM parquet.`$d/documents.parquet`
           |WHERE n_chars >= 100""".stripMargin),
      TableSpec("source_stats",
        """SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
          |FROM clean GROUP BY source""".stripMargin),
      TableSpec("lang_stats",
        """SELECT lang, COUNT(*) AS n_docs
          |FROM clean GROUP BY lang""".stripMargin)
    ), storage)
    spark.sql(
      s"""SELECT s.source, s.n_docs, s.sum_chars,
         |       (SELECT MAX(n_docs) FROM $db.lang_stats) AS top_lang_docs
         |FROM $db.source_stats s
         |ORDER BY s.source""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sdp_pipeline" -> qSdpPipeline _,
  )

  val oracle: Map[String, String] = Map(
    "q_sdp_pipeline" ->
      """WITH clean AS (
        |  SELECT doc_id, source, lang, n_chars FROM documents
        |  WHERE n_chars >= 100
        |), source_stats AS (
        |  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
        |  FROM clean GROUP BY source
        |), lang_stats AS (
        |  SELECT lang, COUNT(*) AS n_docs FROM clean GROUP BY lang
        |)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(sum_chars AS BIGINT) AS sum_chars,
        |       (SELECT CAST(MAX(n_docs) AS BIGINT) FROM lang_stats)
        |         AS top_lang_docs
        |FROM source_stats ORDER BY source""".stripMargin,
  )
}
