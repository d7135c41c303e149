package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The transactional file sink's exactly-once contract (q_stream_sink_parquet's
  * load-bearing claim): the sink commits a `_spark_metadata` manifest entry
  * per micro-batch, and readers of the sink directory list files THROUGH the
  * manifest — so an orphaned data file (a failed task attempt's leftover, a
  * partial upload) is invisible to consumers even though it sits right next
  * to the committed files. Without the manifest the same directory would
  * double-count.
  */
class SinkSpec extends SparkSpec {

  private def t(h: Int, m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("parquet file sink: manifest-governed read-back ignores an orphaned data file") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sinkspec_").toString
    val ckpt = Files.createTempDirectory("graft_sinkspec_ckpt_").toString
    val mem = MemoryStream[Ev]
    val query = StreamOps.tumblingCounts(mem.toDF())
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .writeStream.format("parquet")
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try {
      mem.addData(Ev(1, t(10, 5), 1, "click", 1.0), Ev(2, t(10, 20), 2, "click", 1.0))
      query.processAllAvailable()
      // Advance the watermark past the 10:00 window so it closes and its
      // row is committed to the sink (manifest entry written).
      mem.addData(Ev(3, t(13, 0), 3, "view", 1.0))
      query.processAllAvailable()
    } finally query.stop()

    val committed = spark.read.parquet(dir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(committed.exists(_._2 == "click"), s"the closed window must be in the sink: $committed")

    // Simulate a failed attempt's leftover: a VALID parquet data file in the
    // sink directory that no manifest entry references.
    // The sink writes one file per task and most are EMPTY — copy the
    // largest so the orphan demonstrably carries rows.
    val part = Files.list(Paths.get(dir)).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.getFileName.toString.startsWith("part-") &&
                   p.getFileName.toString.endsWith(".parquet"))
      .maxByOption(Files.size(_))
      .getOrElse(fail(s"no part file written under $dir"))
    Files.copy(part, Paths.get(dir, "part-99999-orphan.snappy.parquet"),
      StandardCopyOption.COPY_ATTRIBUTES)

    // A manifest-blind reader (explicit glob bypasses the metadata log)
    // sees MORE rows — the orphan is really there and really poisonous...
    val naive = spark.read.parquet(s"$dir/part-*.parquet").count()
    assert(naive > committed.size,
      s"orphan must be visible to a naive listing: $naive vs ${committed.size}")

    // ...but the sink-directory read stays exactly the committed set.
    val again = spark.read.parquet(dir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(again == committed,
      s"manifest read-back must ignore the orphan: $again vs $committed")
  }

  test("q_overwrite_dynamic patches exactly one partition and leaves neighbors byte-identical") {
    val original = Tables.events(spark, sfDir)
      .withColumn("d", to_date(col("ts")))
      .filter(col("d").between(lit("2024-01-09").cast("date"),
        lit("2024-01-11").cast("date")))
      .groupBy(col("d")).agg(count(lit(1)).as("n"),
        sum(when(col("value") >= 50.0, 1L).otherwise(0L)).as("n_hi"))
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    val got = graft.sources.WritePath.qOverwriteDynamic(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == original.keySet)
    assert(got("2024-01-09") == original("2024-01-09")._1, "neighbor untouched")
    assert(got("2024-01-11") == original("2024-01-11")._1, "neighbor untouched")
    assert(got("2024-01-10") == original("2024-01-10")._2,
      "patched day holds exactly the corrected rows")
    assert(got("2024-01-10") < original("2024-01-10")._1,
      "the patch must actually shrink the day")
  }

}
