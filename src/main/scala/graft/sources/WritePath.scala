package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The Load stage of the pipeline (SURVEY.md §2a S6) — the reference
  * persists each processed frame for its dashboard (/root/reference/
  * app.py:274); at scale the equivalent is a partitioned + bucketed
  * columnar table, laid out so that downstream reads prune and co-locate
  * instead of shuffling:
  *
  *  - PARTITION BY event date — time-range queries prune whole
  *    directories at the driver (partition filters, no file I/O at all
  *    for out-of-range dates);
  *  - BUCKET BY user_id — per-user joins and aggregations read data
  *    already hash-distributed on the key, so they plan with NO shuffle
  *    Exchange (asserted in PlanSpec/BucketingSpec). At 100 TB this is
  *    the difference between a per-query multi-TB shuffle and none.
  *
  * The registered query writes the events fixture through that layout,
  * reads it BACK, and returns a per-user aggregate; the oracle computes
  * the same aggregate on the ORIGINAL table, so a green CORRECTNESS row
  * proves the write→read round trip is lossless across every column
  * class: keys (sum of event_id), doubles (exact decimal sum of value),
  * strings (min/max event_type), and the derived partition date
  * (distinct-date count per user).
  */
object WritePath {

  /** Bucket count for the demo layout. At sf0.1 this gives ~10^4 rows per
    * bucket; a real deployment sizes it to (table size / target file
    * size) and keeps it fixed so every writer and reader agrees.
    */
  val Buckets = 8

  /** (Scratch dir, table name) of the previous invocation — dropped when
    * the next one starts (the current pair must outlive the returned lazy
    * DataFrame, so it cannot be cleaned at return). Bounds disk use at one
    * copy and catalog growth at one table. The table NAME is unique per
    * invocation, so a still-referenced DataFrame from a prior call and a
    * concurrently running session can never read each other's (possibly
    * deleted) layout — the previous fixed-name design clobbered on reuse.
    */
  private val last = new java.util.concurrent.atomic.AtomicReference[(String, String)]()

  private def deleteRecursively(path: java.io.File): Unit = {
    Option(path.listFiles()).foreach(_.foreach(deleteRecursively))
    path.delete(): Unit
  }

  /** Write the date-partitioned, user_id-bucketed events table into a
    * fresh scratch dir and return the catalog table name. Split from the
    * query so plan tests can target the read-back table directly.
    */
  private[graft] def writeBucketed(spark: SparkSession, d: String): String = {
    // A fresh external location + table name per invocation: benchmarks
    // measure a cold write, and a retried run never reads a half-written
    // previous layout.
    val dir = Files.createTempDirectory("graft_write_").toString
    val tableName = s"graft_events_bucketed_${System.nanoTime()}"
    Option(last.getAndSet((dir, tableName))).foreach { case (d0, t0) =>
      spark.sql(s"DROP TABLE IF EXISTS $t0")
      deleteRecursively(new java.io.File(d0))
    }
    Tables.events(spark, d)
      .withColumn("event_date", to_date(col("ts")))
      // Co-locate each (date, bucket) group into one writer task BEFORE
      // the write: bucketBy makes every task emit one file per (date,
      // bucket) pair it holds, so with T input tasks the layout degrades
      // to T × dates × buckets small files at scale. pmod(hash(user_id),
      // Buckets) is exactly Spark's bucket-id expression (murmur3 pmod),
      // so this shuffle pins the file count to dates × buckets — the
      // small-files control a production Load stage always applies.
      .repartition(col("event_date"), expr(s"pmod(hash(user_id), $Buckets)"))
      .write
      .partitionBy("event_date")
      .bucketBy(Buckets, "user_id")
      .sortBy("user_id")
      .option("path", s"$dir/$tableName")
      .saveAsTable(tableName)
    tableName
  }

  /** q_write_bucketed — write events partitioned by date + bucketed by
    * user, read back, aggregate per user. The aggregation itself is part
    * of the proof: grouping on the bucket column plans WITHOUT a shuffle
    * Exchange (the scan already delivers hash-distributed rows).
    */
  def qWriteBucketed(spark: SparkSession, d: String): DataFrame =
    readBackAgg(spark.table(writeBucketed(spark, d)))

  private[graft] def readBackAgg(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_date")).as("n_days"),
        sum(col("event_id")).as("sum_eid"),
        Tables.exactSum(col("value")).as("sum_v"),
        min(col("event_type")).as("min_type"),
        max(col("event_type")).as("max_type"))
      .orderBy(col("user_id"))

  /** Range-partition count for the sort-clustered layout. A real
    * deployment sizes it to table size / target file size, same as
    * [[Buckets]].
    */
  val RangeFiles = 8

  /** Scratch dir of the previous sorted-layout invocation — own slot so
    * the bucketed query's cleanup and this one can never free each
    * other's still-referenced layout.
    */
  private val lastSorted = new java.util.concurrent.atomic.AtomicReference[String]()

  /** Write events SORT-CLUSTERED by user_id: range-repartition into
    * [[RangeFiles]] key ranges, sort within each, write plain parquet.
    * Split from the query so the layout spec can scan it directly.
    */
  private[graft] def writeSorted(spark: SparkSession, d: String): String = {
    val dir = Files.createTempDirectory("graft_sorted_").toString
    Option(lastSorted.getAndSet(dir)).foreach(d0 => deleteRecursively(new java.io.File(d0)))
    Tables.events(spark, d)
      // Range partitioning gives each output file a NARROW, disjoint
      // user_id range; the within-file sort additionally orders pages so
      // the parquet column index can prune below row-group granularity.
      .repartitionByRange(RangeFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** q_write_sorted — SORT-CLUSTERED layout for scan pruning: the second
    * of the two production layout levers (E6/S6 bucketing co-locates
    * JOINS; range-clustering prunes SCANS). Every parquet row group
    * carries min/max stats per column; after `repartitionByRange` +
    * `sortWithinPartitions` on user_id each file covers a narrow key
    * range, so a pushed range predicate skips whole row groups at read
    * time and scan I/O scales with SELECTIVITY, not table size — on a
    * 100 TB table a 1% key-range query reads ~1% of the files instead
    * of all of them. (Multi-column locality would use a space-filling
    * curve on top; one-dimensional range clustering is the linear
    * special case.) LayoutSpec proves the skip with scan metrics —
    * sorted layout emits a fraction of the rows the round-robin layout
    * does for the same pushed filter. The registered query reads the
    * clustered layout back through a key-range filter and aggregates;
    * the oracle runs the same filter on the ORIGINAL table, so the
    * green row proves the clustered round trip loses nothing inside
    * the range and leaks nothing outside it.
    */
  def qWriteSorted(spark: SparkSession, d: String): DataFrame =
    spark.read.parquet(writeSorted(spark, d))
      .filter(col("user_id").between(10, 19))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("event_id")).as("sum_eid"),
        Tables.exactSum(col("value")).as("sum_v"))
      .orderBy(col("user_id"))

  /** Bits per NORMALIZED dimension in [[writeZorder]]'s interleave. */
  val ZBits = 8

  /** 2^[[ZBits]] — the normalized domain side length. */
  val ZSide = 1 << ZBits

  /** Size of the hour-of-month index domain ((day−1)·24 + hour ∈ [0, 720)). */
  val UhDomain = 720

  /** Output files of the z-ordered layout. */
  val ZFiles = 16

  private val lastZorder = new java.util.concurrent.atomic.AtomicReference[String]()

  /** Morton (Z-order) bit interleave of two non-negative [[ZBits]]-wide
    * dimensions: bit i of `a` lands at position 2i+1, bit i of `b` at 2i
    * — one constant expression tree of shifts/ands/ors, fully codegen'd.
    * The identity `((a >> i) & 1) << (2i+1) == (a & (1 << i)) << (i+1)`
    * keeps it to two ops per bit.
    */
  private def zInterleave(a: Column, b: Column): Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i + 1))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i))
    }

  /** Z-ORDERED layout: the multi-column generalization q_write_sorted's
    * scaladoc promises. Linear range-clustering on user_id gives perfect
    * pruning on user_id and NONE on time; interleaving the bits of
    * (user_id, hour-of-month) into a Morton z-value and range-clustering
    * on THAT pins the leading bits of BOTH dimensions within every file,
    * so each file's parquet min/max stats are narrow in both columns and
    * a pushed predicate on EITHER dimension skips files — the layout
    * trade every lakehouse table format ships (at the cost of each
    * single dimension pruning ~√(selectivity) instead of exactly).
    *
    * Two details production z-order implementations share, both
    * load-bearing: (1) dimensions are NORMALIZED to equal bit-width
    * before interleaving — raw interleave of a 4-bit user domain against
    * a 10-bit hour domain degenerates to hour-major ordering, so each
    * dimension is min/max-scaled to [[ZBits]] bits (the min/max ride in
    * as a 1-row broadcast, no driver collect; rank-based normalization
    * would resist skew even harder at the cost of a quantile pass);
    * (2) cluster keys are persisted as REAL columns (`uh`) — stats
    * pruning reads column min/max, not expressions.
    */
  private[graft] def writeZorder(spark: SparkSession, d: String): String = {
    val dir = Files.createTempDirectory("graft_zorder_").toString
    Option(lastZorder.getAndSet(dir)).foreach(d0 => deleteRecursively(new java.io.File(d0)))
    val stats = Tables.events(spark, d).agg(
      min(col("user_id")).as("u_min"), max(col("user_id")).as("u_max"))
    Tables.events(spark, d)
      .crossJoin(broadcast(stats))
      .withColumn("uh",
        ((dayofmonth(col("ts")) - 1) * 24 + hour(col("ts"))).cast("long"))
      .withColumn("ub",
        expr(s"((user_id - u_min) * $ZSide) div (u_max - u_min + 1)"))
      .withColumn("uhb", expr(s"(uh * $ZSide) div $UhDomain"))
      .withColumn("z", zInterleave(col("ub"), col("uhb")))
      .drop("u_min", "u_max", "ub", "uhb")
      .repartitionByRange(ZFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** q_zorder — reads the z-ordered layout back through a TIME-dimension
    * predicate (days 11–12, the dimension the 1-D user-sorted layout
    * cannot prune at all — LayoutSpec proves that contrast with scan
    * metrics) and aggregates per event type; the oracle runs the same
    * predicate on the ORIGINAL table, so the green row proves the
    * z-clustered round trip is lossless under the pruned scan.
    */
  def qZorder(spark: SparkSession, d: String): DataFrame =
    spark.read.parquet(writeZorder(spark, d))
      .filter(col("uh").between(240, 287))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_eid"),
        Tables.exactSum(col("value")).as("sum_v"))
      .orderBy(col("event_type"))

  /** Fragment count for the staged small-files layout, and the file count
    * compaction targets. Real compaction sizes the target as
    * ceil(input bytes / target file size); the ratio (16:1) is what the
    * demo pins.
    */
  val Fragments = 64
  val CompactTo = 4

  /** Fragmented staging layout, cached per fixture dir — the compaction
    * INPUT is setup, not measured query work (same contract as
    * FileSources.stage).
    */
  private val fragmented = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val lastCompacted = new java.util.concurrent.atomic.AtomicReference[String]()

  private[graft] def stageFragmented(spark: SparkSession, d: String): String =
    fragmented.computeIfAbsent(d, { _ =>
      val dir = Files.createTempDirectory("graft_frag_").toString
      Tables.events(spark, d).repartition(Fragments)
        .write.mode("overwrite").parquet(dir)
      dir
    })

  /** q_compact — small-files compaction, the standing operational chore of
    * any streaming/incremental ingest at scale: a micro-batch writer that
    * emits one file per trigger per partition turns a 100 TB table into
    * millions of KB-sized files, and scan planning (footer reads, task
    * scheduling) comes to dominate I/O. The compactor reads the
    * fragmented layout and merges [[Fragments]] files down to
    * [[CompactTo]] with `coalesce` — a NARROW dependency that
    * concatenates co-located partitions with NO shuffle Exchange
    * (LayoutSpec pins both the plan and the output file count;
    * `repartition` would pay a full shuffle of the table to achieve the
    * same file count). The registered query reads the COMPACTED layout
    * back and aggregates per event type; the oracle aggregates the
    * original, so the green row proves compaction is byte-lossless.
    */
  def qCompact(spark: SparkSession, d: String): DataFrame = {
    val out = Files.createTempDirectory("graft_compact_").toString
    Option(lastCompacted.getAndSet(out)).foreach(d0 => deleteRecursively(new java.io.File(d0)))
    spark.read.parquet(stageFragmented(spark, d))
      .coalesce(CompactTo)
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_eid"),
        Tables.exactSum(col("value")).as("sum_v"))
      .orderBy(col("event_type"))
  }

  /** Scratch dir of the previous partitioned-layout invocation — own slot,
    * same lifetime contract as [[lastSorted]].
    */
  private val lastPartitioned = new java.util.concurrent.atomic.AtomicReference[String]()

  /** Write events into a Hive-style date-partitioned directory tree
    * (`event_date=2024-01-08/...`). Split from the query so the layout
    * spec can assert partition pruning against it directly.
    */
  private[graft] def writePartitioned(spark: SparkSession, d: String): String = {
    val dir = Files.createTempDirectory("graft_datepart_").toString
    Option(lastPartitioned.getAndSet(dir)).foreach(d0 => deleteRecursively(new java.io.File(d0)))
    Tables.events(spark, d)
      .withColumn("event_date", to_date(col("ts")))
      // One writer task per date: without this shuffle every input task
      // emits one file into every date directory it holds rows for, and
      // the layout degrades to tasks × dates small files at scale.
      .repartition(col("event_date"))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    dir
  }

  /** q_write_partitioned — the FIRST production layout lever, before
    * bucketing (joins) and range-clustering (scans): Hive-style
    * date-partition directories, pruned at PLANNING time. A filter on the
    * partition column never touches data at all — out-of-range dates are
    * eliminated from the file listing before a single parquet footer is
    * opened, so a one-week query on a 100 TB × 3-year event table plans
    * ~0.6% of the files and reads nothing else (row-group pruning, by
    * contrast, still lists and opens every file). LayoutSpec proves it
    * with scan metrics: the filtered read-back's scan touches only the
    * in-range partitions' files and emits exactly the in-range rows. The
    * registered query reads the partitioned layout back through a 7-day
    * partition filter and aggregates per date; the oracle runs the same
    * week filter on the ORIGINAL table, so the green row proves the
    * partitioned round trip is lossless inside the range and leaks
    * nothing outside it.
    */
  def qWritePartitioned(spark: SparkSession, d: String): DataFrame =
    spark.read.parquet(writePartitioned(spark, d))
      .filter(col("event_date").between(
        lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))
      .groupBy(col("event_date"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("sum_eid"),
        Tables.exactSum(col("value")).as("sum_v"))
      .select(date_format(col("event_date"), "yyyy-MM-dd").as("event_date"),
        col("n_events"), col("n_users"), col("sum_eid"), col("sum_v"))
      .orderBy(col("event_date"))

  private val lastDynpart = new java.util.concurrent.atomic.AtomicReference[String]()

  /** q_overwrite_dynamic — DYNAMIC partition overwrite
    * (`spark.sql.sources.partitionOverwriteMode=dynamic`): the daily
    * backfill primitive — rewrite exactly the partitions present in the
    * incoming batch and leave every other partition untouched, where
    * STATIC overwrite mode would first truncate the whole table root.
    * The query stages the date-partitioned events layout, then
    * dynamically overwrites ONE day (2024-01-10) with a corrected batch
    * (that day's rows filtered to value ≥ 50 — a compliance-scrub
    * backfill), and reads back the 3-day window around the patch: the
    * neighbors must be byte-identical to the original, the patched day
    * must hold only the corrected rows. The oracle states that exact
    * final semantic state from the original table, so the green row
    * proves the mode's partition isolation, not just that a write
    * happened.
    *
    * Scale: the overwrite job touches only the patched day's files — the
    * same one-writer-per-date repartition discipline as the base layout;
    * a 3-year backfill of one day rewrites ~0.1% of files.
    */
  def qOverwriteDynamic(spark: SparkSession, d: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_dynpart_").toString
    Option(lastDynpart.getAndSet(dir)).foreach(d0 =>
      deleteRecursively(new java.io.File(d0)))
    val base = Tables.events(spark, d)
      .withColumn("event_date", to_date(col("ts")))
    base.repartition(col("event_date"))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    val day = lit("2024-01-10").cast("date")
    val patched = base.filter(col("event_date") === day && col("value") >= 50.0)
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try patched.repartition(col("event_date"))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.read.parquet(dir)
      .filter(col("event_date").between(
        lit("2024-01-09").cast("date"), lit("2024-01-11").cast("date")))
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("event_id")).as("sum_eid"),
        Tables.exactSum(col("value")).as("sum_v"))
      .select(date_format(col("event_date"), "yyyy-MM-dd").as("event_date"),
        col("n_events"), col("sum_eid"), col("sum_v"))
      .orderBy(col("event_date"))
  }

  /** q_file_metadata — the `_metadata` hidden-column surface: every file
    * source exposes per-row provenance (`_metadata.file_name`, file_path,
    * file_size, row_index) that exists only when selected — the
    * first tool for the daily ops questions "which file did this bad row
    * come from" and "is this table drowning in small files". Here the
    * type-partitioned layout is read back and audited per partition key:
    * `countDistinct(_metadata.file_name)` proves the repartition-by-key
    * write produced exactly ONE file per type (the small-file discipline
    * [[writePartitioned]] documents), and the row counts prove no file
    * leaks rows across partition directories. The oracle states the same
    * audit from the original table — n_files is the literal 1 the layout
    * contract promises.
    *
    * Scale notes: metadata columns are populated by the scan itself —
    * zero I/O beyond the read (the values come from the file listing, not
    * the footers), and the aggregate is |types|-sized. The same query
    * over a 10⁶-file table is the standard small-file audit, at file-
    * listing cost.
    */
  def qFileMetadata(spark: SparkSession, d: String): DataFrame =
    spark.read.parquet(typePartitioned(spark, d))
      .select(col("event_type"), col("_metadata.file_name").as("f"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("f")).as("n_files"), count(lit(1)).as("n_rows"))
      .orderBy(col("event_type"))

  /** Events written type-partitioned, one file per type (repartition on
    * the partition column before partitionBy — same discipline as
    * [[writePartitioned]]). Fresh dir per invocation; previous scratch
    * reclaimed like the other layout stages.
    */
  private val lastTypePartitioned = new java.util.concurrent.atomic.AtomicReference[String]()
  private[graft] def typePartitioned(spark: SparkSession, d: String): String = {
    val dir = Files.createTempDirectory("graft_typepart_").toString
    Option(lastTypePartitioned.getAndSet(dir)).foreach(d0 => deleteRecursively(new java.io.File(d0)))
    Tables.events(spark, d)
      .repartition(col("event_type"))
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_write_bucketed" -> qWriteBucketed _,
    "q_file_metadata"  -> qFileMetadata _,
    "q_write_sorted"   -> qWriteSorted _,
    "q_zorder"         -> qZorder _,
    "q_write_partitioned" -> qWritePartitioned _,
    "q_overwrite_dynamic" -> qOverwriteDynamic _,
    "q_compact"        -> qCompact _,
  )

  val oracle: Map[String, String] = Map(
    "q_file_metadata" ->
      """SELECT event_type, CAST(1 AS BIGINT) AS n_files, COUNT(*) AS n_rows
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_write_bucketed" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |       CAST(SUM(event_id) AS BIGINT) AS sum_eid,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
        |       MIN(event_type) AS min_type,
        |       MAX(event_type) AS max_type
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_write_sorted" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |       CAST(SUM(event_id) AS BIGINT) AS sum_eid,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
        |FROM events WHERE user_id BETWEEN 10 AND 19
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_zorder" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(event_id) AS BIGINT) AS sum_eid,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
        |FROM events
        |WHERE (EXTRACT(day FROM ts) - 1) * 24 + EXTRACT(hour FROM ts)
        |        BETWEEN 240 AND 287
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_overwrite_dynamic" ->
      """WITH st AS (
        |  SELECT CAST(ts AS DATE) AS event_date, event_id, value
        |  FROM events
        |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-09' AND DATE '2024-01-11'
        |    AND (CAST(ts AS DATE) <> DATE '2024-01-10' OR value >= 50.0)
        |)
        |SELECT strftime(event_date, '%Y-%m-%d') AS event_date,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(event_id) AS BIGINT) AS sum_eid,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
        |FROM st GROUP BY event_date ORDER BY event_date""".stripMargin,
    "q_write_partitioned" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
        |       COUNT(*) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(SUM(event_id) AS BIGINT) AS sum_eid,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_compact" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(event_id) AS BIGINT) AS sum_eid,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
