package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.collection.concurrent.TrieMap

/** Alternative source formats (SURVEY.md §2a S1/S4) — the reference's
  * sources are JSON documents fetched over HTTP (/root/reference/app.py:
  * 40-52, 74-79); in the zero-egress environment each format is staged
  * once from the events fixture and replayed through Spark's file sources:
  *
  *  - JSON lines: the faithful wire format (`spark.read.json` with an
  *    explicit schema — schema-on-read, no inference pass over 100 TB);
  *  - CSV with header: the interchange format a reference user most often
  *    starts from;
  *  - raw text + `from_json`: EXACTLY the reference's decode flow
  *    (`r.json()` applied to a fetched body, app.py:76-79) — bytes in,
  *    typed struct out, still one codegen'd parse per row.
  *
  * Timestamps are serialized as epoch-micros longs so every format
  * round-trips bit-exactly (string timestamp formats differ per format and
  * would re-introduce the ns/µs ambiguity Tables.events solves).
  *
  * Scale notes: staging is a one-time conversion (cached per fixture dir);
  * the reads themselves are ordinary distributed file scans — explicit
  * schemas (never inference), column pruning, and for CSV/JSON the same
  * PERMISSIVE degraded-row semantics q_json_fallback demonstrates.
  */
object FileSources {

  private val stageCache = TrieMap.empty[String, String]

  private def serialized(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
              col("user_id"), col("event_type"), col("value"))

  private def stage(spark: SparkSession, d: String, fmt: String): String =
    stageCache.getOrElseUpdate(s"$fmt:$d", {
      val dir = Files.createTempDirectory(s"graft_src_${fmt}_").toString
      val w = serialized(spark, d).coalesce(1).write.mode("overwrite")
      fmt match {
        case "json" => w.json(dir)
        case "csv"  => w.option("header", "true").csv(dir)
        case "orc"  => w.orc(dir)
        case "xml"  => w.option("rootTag", "rows").option("rowTag", "row").xml(dir)
      }
      dir
    })

  /** Stage every serialized format up front — called from Bench's untimed
    * warmup so the one-time fixture conversion (a `coalesce(1)` write per
    * format) is never charged to whichever source query happens to run
    * first. Idempotent via [[stageCache]]; Verify still stages lazily.
    */
  private[graft] def stageAll(spark: SparkSession, d: String): Unit = {
    Seq("json", "csv", "orc", "xml").foreach(stage(spark, d, _))
    stageEvolved(spark, d)
  }

  private val readSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def project(df: DataFrame): DataFrame =
    df.select(col("event_id"),
        Tables.tsSeconds(timestamp_micros(col("ts_us"))).as("ts_s"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** q_json_source — JSON-lines replay with explicit schema. */
  def qJsonSource(spark: SparkSession, d: String): DataFrame =
    project(spark.read.schema(readSchema).json(stage(spark, d, "json")))

  /** q_csv_source — CSV replay with header + explicit schema. */
  def qCsvSource(spark: SparkSession, d: String): DataFrame =
    project(spark.read.schema(readSchema)
      .option("header", "true").csv(stage(spark, d, "csv")))

  /** q_text_source — the reference's decode flow: raw text lines in,
    * `from_json` struct out (app.py:76-79).
    */
  def qTextSource(spark: SparkSession, d: String): DataFrame = {
    val lines = spark.read.text(stage(spark, d, "json"))
    project(lines
      .select(from_json(col("value"), readSchema).as("r"))
      .select(col("r.*")))
  }

  /** q_orc_source — ORC replay: Spark's second first-class columnar
    * format (predicate pushdown, column pruning, vectorized read — same
    * scan optimizations as parquet). The oracle still runs on the parquet
    * original, so the check proves the ORC round-trip is lossless.
    */
  def qOrcSource(spark: SparkSession, d: String): DataFrame =
    project(spark.read.schema(readSchema).orc(stage(spark, d, "orc")))

  /** q_xml_source — native XML replay (Spark 4 folds the spark-xml
    * package into the engine): the events fixture serialized as an XML
    * document of `<row>` elements and read back with `spark.read.xml`
    * under the SAME explicit schema as the other formats — the
    * enterprise-feed surface (SOAP exports, sitemaps, RSS) covered with
    * zero extra dependencies. The oracle still runs on the parquet
    * original, so the gate proves the XML round-trip is lossless,
    * including the epoch-µs longs that sidestep per-format timestamp
    * string ambiguity.
    *
    * Scale notes: XML is the one staged format that is NOT splittable by
    * newline — Spark parallelizes by matching `rowTag` element
    * boundaries per input file, so a 100 TB XML feed must arrive as many
    * files (it does — feeds paginate); schema is explicit, inference
    * (a full extra pass) never runs.
    */
  def qXmlSource(spark: SparkSession, d: String): DataFrame =
    project(spark.read.schema(readSchema)
      .option("rowTag", "row").xml(stage(spark, d, "xml")))

  /** Stage the two-generation parquet layout for [[qSchemaMerge]]: an
    * "old" file written before `event_type` existed (even event_ids,
    * 3 columns) and a "new" file with the column (odd event_ids) — the
    * deterministic stand-in for a table whose schema evolved mid-history.
    */
  private def stageEvolved(spark: SparkSession, d: String): String =
    stageCache.getOrElseUpdate(s"evolved:$d", {
      val dir = Files.createTempDirectory("graft_src_evolved_").toString
      val base = serialized(spark, d)
      base.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/v1")
      base.filter(col("event_id") % 2 =!= 0)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/v2")
      dir
    })

  /** q_schema_merge — SCHEMA EVOLUTION on read: one logical table whose
    * early files predate a column (`event_type` added mid-history — the
    * single most common lakehouse migration), read as ONE DataFrame via
    * `mergeSchema`, legacy rows surfacing NULL for the missing column.
    * The aggregate proves the nullability semantics end-to-end: the NULL
    * group carries exactly the legacy half's rows and mass, verified
    * against the original un-split table by the oracle.
    *
    * Scale notes: `mergeSchema` reconciles footers at planning time —
    * the cost is per-FILE, not per-row, and an explicit unified schema
    * (production practice for 10⁶-file tables) skips even that; the
    * scan itself stays a plain pruned/pushed columnar read. NULL-group
    * ordering is pinned NULLS FIRST in both engines (Spark's asc
    * default; DuckDB needs it spelled).
    */
  def qSchemaMerge(spark: SparkSession, d: String): DataFrame = {
    val dir = stageEvolved(spark, d)
    spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/v1", s"$dir/v2")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Tables.exactSum(col("value")).as("total"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** q_binary_source — the `binaryFile` opaque-blob source over the
    * fixture directory itself: path + byte length per file, the listing
    * the multimodal ingest path ([[graft.operators.Multimodal]]) starts
    * from when assets arrive as raw files rather than rows. The format
    * reads (path, modificationTime, length, content); this query prunes
    * to the METADATA columns, and Spark's binaryFile reader skips
    * content I/O when `content` is pruned away — so the plan is a
    * listing-cost scan exactly like `_metadata` (E152), valid at 10⁶
    * files.
    *
    * Oracle note: the only oracle that must READ FILES (DuckDB
    * `read_blob` glob) — file paths are not relational state, so the
    * oracle names the gate's fixture directory (sf0.01) directly; the
    * spec covers other scale dirs.
    */
  def qBinarySource(spark: SparkSession, d: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet").load(d)
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("fname"),
        col("length"))
      .orderBy(col("fname"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_source" -> qJsonSource _,
    "q_csv_source"  -> qCsvSource _,
    "q_text_source" -> qTextSource _,
    "q_orc_source"  -> qOrcSource _,
    "q_xml_source"  -> qXmlSource _,
    "q_schema_merge" -> qSchemaMerge _,
    "q_binary_source" -> qBinarySource _,
  )

  private val baseSql =
    """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |       user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_json_source" -> baseSql,
    "q_csv_source"  -> baseSql,
    "q_text_source" -> baseSql,
    "q_orc_source"  -> baseSql,
    "q_xml_source"  -> baseSql,
    "q_schema_merge" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_type END
        |         AS event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_binary_source" ->
      """SELECT regexp_extract(filename, '[^/]+$') AS fname,
        |       size AS length
        |FROM read_blob('/root/testdata/sf0.01/*.parquet')
        |ORDER BY fname""".stripMargin,
  )
}
