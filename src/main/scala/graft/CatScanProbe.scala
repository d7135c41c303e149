package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (the [[StreamScaleProbe]] pattern — measurement tooling,
  * not a registered query) answering the round-15 verdict's standing
  * design-debt question: how much scan throughput does the catalog
  * reader give up against Spark's native vectorized parquet source,
  * reading THE SAME BYTES?
  *
  * Method: CTAS the scale dir's lineitem into a catalog table laid out
  * as 32 files, then run identical aggregations three ways over the
  * identical files —
  *   - `native`:   `spark.read.parquet(<the catalog's own data files>)`
  *     (Spark's vectorized scan — the throughput ceiling),
  *   - `catalog`:  `spark.table(tbl)` with the columnar reader
  *     (the shipped round-16 path),
  *   - `catalog_row`: same, with `-Dgraft.cow.columnar=false` forcing
  *     the legacy per-row Group decode (the round-15 baseline).
  * The probe flips the system property between sides, so one run
  * measures all three. `spark.sql.files.maxPartitionBytes` is pinned
  * low so the native side schedules ~1 task per file like the catalog
  * does — differences are DECODE cost, not parallelism.
  *
  * Queries: `wide` decodes every column class (2 longs, 2 doubles, a
  * string, a timestamp), `narrow` one double column, `cnt` a bare
  * count(*) (the catalog's columnar path drives row iteration off one
  * narrow column; native reads footer counts only — an honest
  * structural gap, reported as-is).
  *
  * Run per scale dir:
  * `sbt "runMain graft.CatScanProbe /tmp/graft_stress_x10 [cpus]"`.
  * Findings land in BASELINE.md (catalog scan-throughput table).
  */
object CatScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    // Fewer, bigger files keep each scan task decode-bound (at 32 tiny
    // files the wall-clock is task overhead, not reader throughput).
    val nFiles = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.RowLevelOps.ensureCatalog(spark)

    val tbl = "graft_cow.ops.scanprobe"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(
      s"""CREATE TABLE $tbl AS
         |SELECT /*+ REPARTITION($nFiles) */
         |       l_orderkey, l_partkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |       l_quantity, l_extendedprice, l_discount,
         |       l_returnflag, l_linestatus,
         |       CAST(l_shipdate AS TIMESTAMP) AS l_shipdate
         |FROM parquet.`$sfDir/lineitem.parquet`""".stripMargin)
    val st = graft.sources.CowStore.get("graft_cow",
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ops"), "scanprobe")).get
    // ~1 native task per catalog file (like the catalog plans): cap the
    // split size at the largest file so bin-packing neither splits a
    // file nor packs two together — decode throughput, not
    // task-packing, is what's under measurement.
    val maxFile = st.files.map(f => new java.io.File(f).length()).max
    spark.conf.set("spark.sql.files.maxPartitionBytes", (maxFile + (1 << 20)).toString)
    val rows = spark.table(tbl).count()
    println(s"[scan-probe] $rows rows in ${st.files.size} files " +
      s"(${st.files.map(f => new java.io.File(f).length()).sum >> 20} MB) " +
      s"at $sfDir, local[$cpus]")

    def queries(df: DataFrame): Seq[(String, DataFrame)] = Seq(
      "wide" -> df.agg(
        count(lit(1)), sum("l_orderkey"), sum("l_partkey"),
        sum("l_quantity"), sum("l_extendedprice"),
        sum(length(col("l_returnflag"))), max("l_shipdate")),
      "narrow" -> df.agg(sum("l_extendedprice")),
      "cnt" -> df.agg(count(lit(1))))

    // A FRESH DataFrame per run: re-collecting one Dataset object reuses
    // its materialized shuffle (the scan stage runs once and every
    // subsequent collect just fetches map output) — the round-16 probe's
    // first draft timed exactly that and read 200 M rows/s/core.
    def timeSide(side: String, df: () => DataFrame): Map[String, Double] =
      queries(df()).map(_._1).map { q =>
        def plan = queries(df()).collectFirst { case (`q`, p) => p }.get
        plan.collect() // warmup: code gen + first-scan costs off the clock
        val times = (1 to 5).map { _ =>
          val p = plan
          val t0 = System.nanoTime()
          p.collect()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = times(times.length / 2)
        println(f"[scan-probe] $side%-12s $q%-7s ${med}%7.3f s  " +
          f"(${rows / med / 1e6}%6.1f M rows/s)")
        q -> med
      }.toMap

    val native = timeSide("native", () => spark.read.parquet(st.files: _*))
    sys.props("graft.cow.columnar") = "false"
    val catRow = timeSide("catalog_row", () => spark.table(tbl))
    sys.props.remove("graft.cow.columnar")
    val catCol = timeSide("catalog", () => spark.table(tbl))

    // The DV'd side (round-17 verdict brief item 1): the same bytes as a
    // MOR table with a delete vector on EVERY file (~1% of rows die), so
    // the probe measures the selection-vector columnar path against the
    // DV-free columnar scan above — round 16 dropped this whole scan to
    // the row walk; the target is ~1.5× of DV-free columnar, not ~9×.
    val dvTbl = "graft_cow.ops.scanprobe_dv"
    spark.sql(s"DROP TABLE IF EXISTS $dvTbl")
    spark.sql(
      s"""CREATE TABLE $dvTbl TBLPROPERTIES ('graft.mode' = 'mor') AS
         |SELECT * FROM $tbl""".stripMargin)
    spark.sql(s"DELETE FROM $dvTbl WHERE l_orderkey % 97 = 0")
    val stDv = graft.sources.CowStore.get("graft_cow",
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ops"), "scanprobe_dv")).get
    println(s"[scan-probe] dv side: ${stDv.deletes.size}/${stDv.files.size} " +
      s"files carry delete vectors " +
      s"(${stDv.deletes.values.map(_.size).sum} positions)")
    val catDv = timeSide("catalog_dv", () => spark.table(dvTbl))
    sys.props("graft.cow.columnar") = "false"
    val catDvRow = timeSide("catalog_dv_row", () => spark.table(dvTbl))
    sys.props.remove("graft.cow.columnar")

    // The CHANGE FEED over the same table (round-17 brief item 6): the
    // batch `.changes` relation decodes the full insert wave plus the
    // delete keep-list through the shared columnar reader; `_row` is the
    // legacy per-row walk over identical change partitions.
    def cdf() = spark.read.option("startVersion", "0").table(s"$dvTbl.changes")
      .drop("_change_type", "_commit_version")
    val catCdf = timeSide("catalog_cdf", () => cdf())
    sys.props("graft.cow.columnar") = "false"
    val catCdfRow = timeSide("catalog_cdf_row", () => cdf())
    sys.props.remove("graft.cow.columnar")
    spark.sql(s"DROP TABLE $dvTbl")

    val obj = Seq(
      "native" -> native, "catalog_row" -> catRow, "catalog" -> catCol,
      "catalog_dv" -> catDv, "catalog_dv_row" -> catDvRow,
      "catalog_cdf" -> catCdf, "catalog_cdf_row" -> catCdfRow)
      .map { case (s, m) =>
        s""""$s":{${m.toSeq.sortBy(_._1).map { case (q, t) =>
          s""""$q":$t""" }.mkString(",")}}"""
      }.mkString(",")
    println(s"""{"metric":"cat_scan_vs_parquet","sf":"$sfDir","rows":$rows,$obj}""")
    spark.sql(s"DROP TABLE $tbl")
    spark.stop()
  }
}
