package graft

import graft.sources.FileSources
import org.apache.spark.sql.functions._

/** Read-path behaviors of the staged alternative-format sources that the
  * driver's oracle gate can't see directly (it compares against the
  * parquet original, not the staged layout).
  */
class FileSourcesSpec extends SparkSpec {

  test("q_schema_merge: the legacy files surface NULL for the added column, losslessly") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val got = FileSources.qSchemaMerge(spark, sfDir).collect()
    // NULLS FIRST: row 0 is the legacy (pre-column) generation
    assert(got.head.isNullAt(0), "legacy group must sort first")
    val legacy = ev.filter(_._1 % 2 == 0)
    assert(got.head.getLong(1) == legacy.length.toLong,
      "NULL group must carry exactly the even-id legacy half")
    // the evolved read loses no rows and no mass vs the original table
    assert(got.map(_.getLong(1)).sum == ev.length.toLong)
    val perType = ev.filter(_._1 % 2 != 0).groupBy(_._2)
    got.tail.foreach { r =>
      assert(r.getLong(1) == perType(r.getString(0)).length.toLong,
        s"${r.getString(0)} count")
    }
  }

  test("q_binary_source lists every fixture parquet with its true byte length") {
    val fs = new java.io.File(sfDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length())).sortBy(_._1).toSeq
    val got = graft.sources.FileSources.qBinarySource(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == fs && got.size == 10)
  }

}
