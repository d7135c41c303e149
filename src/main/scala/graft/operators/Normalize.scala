package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON / normalization operators — the reference's Transform stage
  * (`normalize_to_df`, /root/reference/app.py:84-189) re-expressed as
  * declarative Spark plans over the fixture tables.
  *
  * Reference provenance: nested array-of-structs flatten (openaq,
  * app.py:90-103; usgs app.py:121-129; nws app.py:154-165), struct
  * projection (open_meteo app.py:106-112, spacex app.py:132-139, iss
  * app.py:176-182), map→rows pivot (coingecko app.py:115-118, fx
  * app.py:168-173), string concat of key pairs (app.py:172), epoch-ms →
  * formatted UTC string with 0/None guard (app.py:126-127), JSON decode with
  * fallback (app.py:76-79).
  *
  * Scale notes: all operators are per-row expressions or generators
  * (explode) — embarrassingly parallel, no shuffle except the final
  * presentation sort. JSON parsing uses Spark's codegen'd JsonToStructs /
  * GetJsonObject, not UDFs.
  */
object Normalize {

  /** q_json_get — single-path JSON field extraction from `events.props`,
    * the analog of picking one field out of a fetched payload (app.py:94).
    */
  def qJsonGet(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy(col("event_id"))

  /** q_from_json — schema-full JSON decode (app.py:76-79's `r.json()`), the
    * scale path when many fields are needed: one parse, typed struct out.
    */
  def qFromJson(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(
        col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).as("p"))
      .select(col("event_id"), col("p.k").as("k_int"))
      .orderBy(col("event_id"))

  /** q_explode_nested — array-of-values flatten with position, the 2-level
    * loop of openaq's results[].measurements[] (app.py:91-95). posexplode is
    * a Generate node: no shuffle, output partitioning inherits the scan.
    */
  def qExplodeNested(spark: SparkSession, d: String): DataFrame =
    embeddings(spark, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .orderBy(col("vec_id"), col("pos"))

  /** q_map_explode — map→rows pivot, coingecko's `{asset:{usd:v}}` → one row
    * per key (app.py:115-118).
    */
  def qMapExplode(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(
        col("event_id"),
        explode(map(
          lit("type"), col("event_type"),
          lit("user"), col("user_id").cast("string"))).as(Seq("key", "value")))
      .orderBy(col("event_id"), col("key"))

  /** q_struct_proj — build a struct then project its fields, open_meteo's
    * `current.{temperature_2m,...}` access (app.py:106-112).
    */
  def qStructProj(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(
        col("event_id"),
        struct(col("event_type").as("t"), col("value").as("v")).as("cur"))
      .select(col("event_id"), col("cur.t").as("t"), col("cur.v").as("v"))
      .orderBy(col("event_id"))

  /** q_concat_pair — key-pair string building, fx_rates' `f"{base}/{k}"`
    * (app.py:172).
    */
  def qConcatPair(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .select(
        col("doc_id"),
        concat(col("lang"), lit("/"), col("source")).as("pair"))
      .orderBy(col("doc_id"))

  /** q_epoch_fmt — epoch-millis → "yyyy-MM-dd HH:mm:ss" UTC with the
    * reference's zero/None guard (usgs, app.py:126-127). A synthetic zero is
    * injected on every 97th event to exercise the guard path.
    */
  def qEpochFmt(spark: SparkSession, d: String): DataFrame = {
    val e = when(col("event_id") % 97 === 0, lit(0L)).otherwise(unix_millis(col("ts")))
    events(spark, d)
      .select(col("event_id"), e.as("epoch_ms"))
      .select(
        col("event_id"),
        col("epoch_ms"),
        when(col("epoch_ms") === 0, lit(null).cast("string"))
          .otherwise(date_format(timestamp_millis(col("epoch_ms")), "yyyy-MM-dd HH:mm:ss"))
          .as("fmt"))
      .orderBy(col("event_id"))
  }

  /** q_json_fallback — the reference's JSON-decode-with-fallback (S4,
    * app.py:76-79): a payload that fails to parse doesn't kill the batch,
    * it degrades to a flagged row. Corruption is injected on every 89th
    * event (a broken brace prefix); PERMISSIVE `from_json` yields null
    * fields for those, and the corrupt flag routes them — the batch analog
    * of the Agent-2 dead-letter path.
    */
  def qJsonFallback(spark: SparkSession, d: String): DataFrame = {
    val payload = when(col("event_id") % 89 === 0,
        concat(lit("{broken"), col("props")))
      .otherwise(col("props"))
    events(spark, d)
      .select(col("event_id"), payload.as("payload"))
      .select(
        col("event_id"),
        from_json(col("payload"),
          StructType(Seq(StructField("k", LongType)))).getField("k").as("k"),
        (col("event_id") % 89 === 0).as("is_corrupt"))
      .orderBy(col("event_id"))
  }

  /** q_variant — the VARIANT semi-structured type (Spark 4): `props`
    * parsed ONCE into the binary variant encoding, fields extracted with
    * typed `variant_get` paths, then aggregated — schema-on-read without
    * a declared struct ([[qFromJson]]'s opposite trade: from_json wants
    * the schema up front; variant defers it to the access site, which is
    * what a pipeline ingesting heterogeneous payloads at 100 TB needs —
    * parse once, shred at query time, no re-parse per field access).
    * Output: per k-decade (k DIV 10) counts and exact value cents —
    * all-integer, so the gate is exact; the oracle reads the same field
    * through DuckDB's JSON path functions.
    */
  def qVariant(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .groupBy(expr("k DIV 10").as("k_decade"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy(col("k_decade"))

  /** q_try_cast — the ANSI-safe error-handling surface: Spark 4 runs
    * ANSI mode by DEFAULT, so a malformed numeric string KILLS the job
    * at the `cast` — the `try_*` family (`try_cast`, `try_divide`,
    * `try_add`) is how a production pipeline opts specific columns back
    * into degrade-to-NULL semantics without giving up ANSI everywhere
    * (the principled version of the old `ansi=false` blanket). Dirty
    * numerics are injected on every 97th row ("N/A"); `try_cast` turns
    * exactly those into NULLs, and the per-type report carries the bad
    * count next to the exact cents sum of the survivors — the
    * reject-and-count pattern of [[qJsonFallback]] at the TYPE level.
    */
  def qTryCast(spark: SparkSession, d: String): DataFrame =
    events(spark, d)
      .select(col("event_type"),
        expr("try_cast(CASE WHEN event_id % 97 = 0 THEN 'N/A' " +
          "ELSE CAST(value AS STRING) END AS DOUBLE)").as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_bad"),
        sum(floor(col("v") * lit(100.0) + lit(0.5)).cast("long"))
          .as("good_cents"))
      .orderBy(col("event_type"))

  /** q_url_parse — URL decomposition + per-domain corpus stats: the
    * first question a web-scale training-data pipeline asks of a crawl
    * is "which domains am I holding, and how much of each?" (domain
    * allow/deny lists, per-host quality priors, robots compliance all
    * key off it). The fixture has no URL column, so a deterministic URL
    * is synthesized per document from (source, lang, doc_id) — the
    * construction is shared verbatim with the oracle, so the gate
    * exercises the PARSING, not the synthesis. Spark side: the
    * codegen'd `parse_url` expression (HOST / PATH / keyed QUERY
    * access); oracle side: DuckDB regexp extraction of the same parts —
    * two independent parsers agreeing on every row.
    *
    * Plan: per-row expressions + ONE map-side-partial hash aggregate to
    * |hosts| rows. At 100 TB the output is domain-vocabulary-sized
    * (~10^6), the aggregate is map-side combined, and nothing else
    * shuffles. The distinct-path count is the one genuinely heavy term
    * (distinct within group) — Spark plans it as a two-phase Expand
    * aggregate, still keyed by host, never a global distinct.
    */
  def qUrlParse(spark: SparkSession, d: String): DataFrame = {
    val url = concat(
      lit("https://"), col("source"), lit(".example.org/"),
      col("lang"), lit("/doc-"), col("doc_id").cast("string"),
      lit("?ref="), col("lang"), lit("&p="),
      pmod(col("doc_id"), lit(7)).cast("string"))
    documents(spark, d)
      .select(col("n_chars"), url.as("url"))
      .select(col("n_chars"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("p")).cast("long").as("p"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("path")).as("n_paths"),
        sum(col("p")).as("sum_p"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("host"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_get"       -> qJsonGet _,
    "q_url_parse"      -> qUrlParse _,
    "q_variant"        -> qVariant _,
    "q_try_cast"       -> qTryCast _,
    "q_from_json"      -> qFromJson _,
    "q_explode_nested" -> qExplodeNested _,
    "q_map_explode"    -> qMapExplode _,
    "q_struct_proj"    -> qStructProj _,
    "q_concat_pair"    -> qConcatPair _,
    "q_epoch_fmt"      -> qEpochFmt _,
    "q_json_fallback"  -> qJsonFallback _,
  )

  val oracle: Map[String, String] = Map(
    "q_url_parse" ->
      """WITH u AS (
        |  SELECT n_chars,
        |         'https://' || source || '.example.org/' || lang || '/doc-'
        |           || CAST(doc_id AS VARCHAR) || '?ref=' || lang || '&p='
        |           || CAST(doc_id % 7 AS VARCHAR) AS url
        |  FROM documents
        |)
        |SELECT regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
        |       COUNT(*) AS n_docs,
        |       COUNT(DISTINCT regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1))
        |         AS n_paths,
        |       CAST(SUM(CAST(regexp_extract(url, '[?&]p=([0-9]+)', 1) AS BIGINT))
        |         AS BIGINT) AS sum_p,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM u GROUP BY 1 ORDER BY host""".stripMargin,
    "q_try_cast" ->
      """WITH r AS (
        |  SELECT event_type,
        |         TRY_CAST(CASE WHEN event_id % 97 = 0 THEN 'N/A'
        |                       ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS v
        |  FROM events
        |)
        |SELECT event_type, COUNT(*) AS n_rows,
        |       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_bad,
        |       CAST(SUM(CAST(floor(v * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS good_cents
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_variant" ->
      """WITH k AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |)
        |SELECT k // 10 AS k_decade, COUNT(*) AS n,
        |       CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |       MIN(k) AS k_min, MAX(k) AS k_max
        |FROM k GROUP BY k // 10 ORDER BY k_decade""".stripMargin,
    "q_json_get" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_from_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,
    "q_explode_nested" ->
      """SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
        |       unnest(embedding) AS val
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,
    "q_map_explode" ->
      """SELECT event_id, key, value FROM (
        |  SELECT event_id, 'type' AS key, event_type AS value FROM events
        |  UNION ALL
        |  SELECT event_id, 'user' AS key, CAST(user_id AS VARCHAR) AS value FROM events
        |) ORDER BY event_id, key""".stripMargin,
    "q_struct_proj" ->
      """SELECT event_id, event_type AS t, value AS v
        |FROM events ORDER BY event_id""".stripMargin,
    "q_concat_pair" ->
      """SELECT doc_id, lang || '/' || source AS pair
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_json_fallback" ->
      """SELECT event_id,
        |       CASE WHEN event_id % 89 = 0 THEN NULL
        |            ELSE CAST(json_extract_string(props, '$.k') AS BIGINT)
        |       END AS k,
        |       event_id % 89 = 0 AS is_corrupt
        |FROM events ORDER BY event_id""".stripMargin,
    "q_epoch_fmt" ->
      """SELECT event_id, epoch_ms,
        |       CASE WHEN epoch_ms = 0 THEN NULL
        |            ELSE strftime(make_timestamp(epoch_ms * 1000), '%Y-%m-%d %H:%M:%S')
        |       END AS fmt
        |FROM (
        |  SELECT event_id,
        |         CASE WHEN event_id % 97 = 0 THEN 0 ELSE epoch_ms(ts) END AS epoch_ms
        |  FROM events
        |) ORDER BY event_id""".stripMargin,
  )
}
