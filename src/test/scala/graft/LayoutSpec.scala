package graft

import graft.sources.WritePath
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Proves the q_write_sorted layout claim with runtime SCAN METRICS, not
  * plan text: after `repartitionByRange` + `sortWithinPartitions` on
  * user_id, each parquet file covers a narrow disjoint key range, so a
  * pushed range predicate skips whole row groups and the scan EMITS only
  * a fraction of the table. The control is the same data written
  * round-robin (every file spans the full key range — row-group min/max
  * stats are useless), where the identical pushed filter skips nothing.
  * This is the measurable difference clustering buys at 100 TB: scan I/O
  * ∝ selectivity for the clustered layout, ∝ table size for the
  * unclustered one.
  */
class LayoutSpec extends SparkSpec {

  /** Rows the (single) parquet scan actually emitted, post row-group
    * pruning — the executed plan's leaf metric, unwrapped through AQE.
    */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other                    => other
    }
    val scans = unwrap(df.queryExecution.executedPlan).collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1, s"expected one parquet scan, found ${scans.size}")
    scans.head.metrics("numOutputRows").value
  }

  test("sort-clustered layout prunes row groups; round-robin layout cannot") {
    val total = Tables.events(spark, sfDir).count()
    val pred  = col("user_id").between(10, 19)

    val sortedDir = WritePath.writeSorted(spark, sfDir)
    val fromSorted = scanOutputRows(spark.read.parquet(sortedDir).filter(pred))

    // Control: same rows, round-robin into the same file count.
    val rrDir = java.nio.file.Files.createTempDirectory("graft_rr_").toString
    try {
      Tables.events(spark, sfDir).repartition(WritePath.RangeFiles)
        .write.mode("overwrite").parquet(rrDir)
      val fromRR = scanOutputRows(spark.read.parquet(rrDir).filter(pred))

      val matching = Tables.events(spark, sfDir).filter(pred).count()
      // Round-robin: the 10-user range lands in every file, min/max stats
      // span the whole key domain, nothing is skipped.
      assert(fromRR == total,
        s"round-robin scan should emit the full table ($total), got $fromRR")
      // Clustered: only the row groups whose range overlaps [10, 19]
      // survive — at least the matching rows, at most the matching rows
      // plus boundary row-group slack, and always far below the control.
      assert(fromSorted >= matching && fromSorted <= (matching * 2).max(total / 4),
        s"clustered scan emitted $fromSorted of $total rows " +
          s"($matching match) — range pruning did not engage")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(rrDir))
    }
  }

  /** The executed plan's single parquet scan, unwrapped through AQE. */
  private def scanExec(df: DataFrame): FileSourceScanExec = {
    df.collect()
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other                    => other
    }
    val scans = unwrap(df.queryExecution.executedPlan).collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1, s"expected one parquet scan, found ${scans.size}")
    scans.head
  }

  test("z-ordered layout prunes on BOTH dimensions; 1-D clustering prunes only its own") {
    val uhPred   = col("uh").between(240, 287)
    val userPred = col("user_id").between(10, 19)
    val withUh = Tables.events(spark, sfDir).withColumn("uh",
      ((dayofmonth(col("ts")) - 1) * 24 + hour(col("ts"))).cast("long"))
    val total = withUh.count()

    val zDir = WritePath.writeZorder(spark, sfDir)
    val fromZuh   = scanOutputRows(spark.read.parquet(zDir).filter(uhPred))
    val fromZuser = scanOutputRows(spark.read.parquet(zDir).filter(userPred))

    // Control: same data (uh persisted), clustered on user_id ONLY.
    val ctlDir = java.nio.file.Files.createTempDirectory("graft_zctl_").toString
    try {
      withUh.repartitionByRange(WritePath.ZFiles, col("user_id"))
        .sortWithinPartitions(col("user_id"))
        .write.mode("overwrite").parquet(ctlDir)
      val ctlUh = scanOutputRows(spark.read.parquet(ctlDir).filter(uhPred))

      val matchUh = withUh.filter(uhPred).count()
      // User-clustered files each span essentially the whole month, so a
      // time predicate prunes (almost) nothing — tiny-fixture slack only.
      assert(ctlUh >= (total * 8) / 10,
        s"1-D user clustering should not prune on time: $ctlUh of $total")
      // The z-layout pins leading bits of BOTH dimensions per file: the
      // time predicate's 48-hour window survives in a minority of files,
      // and the user predicate prunes too — on the SAME single layout.
      assert(fromZuh >= matchUh && fromZuh <= (total * 7) / 10,
        s"z-layout time pruning: emitted $fromZuh of $total (want <= 70%)")
      assert(fromZuh < ctlUh,
        s"z-layout must beat 1-D clustering on time: $fromZuh vs $ctlUh")
      val matchUser = withUh.filter(userPred).count()
      assert(fromZuser >= matchUser && fromZuser <= (total * 7) / 10,
        s"z-layout user pruning: emitted $fromZuser of $total (want <= 70%)")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(ctlDir))
    }
  }

  test("date-partitioned layout prunes whole partitions at planning time") {
    val dir = WritePath.writePartitioned(spark, sfDir)
    val lo = "2024-01-08"; val hi = "2024-01-14"
    val matching = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")).between(
        lit(lo).cast("date"), lit(hi).cast("date"))).count()

    val scan = scanExec(spark.read.parquet(dir)
      .filter(col("event_date").between(lit(lo).cast("date"), lit(hi).cast("date"))))
    // The date predicate must reach the scan as a PARTITION filter (resolved
    // against the directory listing), not a data filter.
    assert(scan.partitionFilters.nonEmpty,
      "date predicate did not become a partition filter")
    // Pruning is exact: no out-of-range file is ever opened, so the scan
    // emits precisely the matching rows — no row-group slack.
    assert(scan.metrics("numOutputRows").value == matching)
    // And the file listing itself was pruned to the in-range directories.
    val dateDirs = Option(new java.io.File(dir).listFiles()).get
      .filter(_.getName.startsWith("event_date="))
    val inRange = dateDirs.filter { f =>
      val d0 = f.getName.stripPrefix("event_date=")
      d0 >= lo && d0 <= hi
    }
    val inRangeFiles = inRange.flatMap(f => Option(f.listFiles()).get)
      .count(_.getName.endsWith(".parquet"))
    assert(dateDirs.length > inRange.length, "fixture must have out-of-range dates")
    assert(scan.metrics("numFiles").value == inRangeFiles,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected only the $inRangeFiles in-range ones of ${dateDirs.length} partitions")
  }

  test("q_compact merges 64 files to 4 with a shuffle-free narrow plan") {
    def partFiles(dir: String): Int =
      Option(new java.io.File(dir).listFiles()).get
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val frag = WritePath.stageFragmented(spark, sfDir)
    assert(partFiles(frag) == WritePath.Fragments)
    // The merge-down itself must be a narrow Coalesce, not a shuffle.
    val merged = spark.read.parquet(frag).coalesce(WritePath.CompactTo)
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("Coalesce") && !plan.contains("Exchange"),
      s"compaction must not shuffle:\n$plan")
    // Running the registered query materializes the compacted layout.
    val got = WritePath.qCompact(spark, sfDir).collect()
    assert(got.map(_.getLong(1)).sum == Tables.events(spark, sfDir).count())
    val compactedDirs = new java.io.File(
      System.getProperty("java.io.tmpdir")).listFiles()
      .filter(_.getName.startsWith("graft_compact_")).sortBy(-_.lastModified)
    assert(partFiles(compactedDirs.head.toString) == WritePath.CompactTo)
  }

  test("q_write_sorted round trip: clustered read-back equals the direct aggregate") {
    val got = graft.sources.WritePath.qWriteSorted(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = Tables.events(spark, sfDir)
      .filter(col("user_id").between(10, 19))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("s"))
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.sameElements(want))
  }
}
