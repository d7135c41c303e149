package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-group top-k operator must agree with the window-function
  * form it replaces, under any input partitioning, and actually plan as
  * the custom exec behind a single hash shuffle.
  */
class TopKSpec extends SparkSpec {

  private def windowForm(k: Int) = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("TopKPerGroup equals the row_number window form for several k and partitionings") {
    GraftExtensions.register(spark)
    for (k <- Seq(1, 3, 10); parts <- Seq(1, 7)) {
      val e = Tables.events(spark, sfDir)
        .select(col("event_type"), col("event_id"), col("value"))
        .repartition(parts)
      val got = TopKPerGroup(e, Seq(e("event_type")),
          Seq((e("value"), true), (e("event_id"), false)), k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == windowForm(k), s"k=$k parts=$parts differs from window form")
    }
  }

  test("TopKPerGroup plans as the custom exec behind one hash shuffle, no sort") {
    GraftExtensions.register(spark)
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
    val df = TopKPerGroup(e, Seq(e("event_type")),
      Seq((e("value"), true), (e("event_id"), false)), 3)
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in explain output.
    assert(p.contains("TopKPerGroup ["), s"custom exec missing:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one shuffle on the group key:\n$p")
    assert(!p.contains("Sort "), s"the whole point is NO partition-wide sort:\n$p")
    assert(!p.contains("Window"), s"must not fall back to WindowExec:\n$p")
  }

  test("TopKPerGroup with k larger than every group returns all rows") {
    GraftExtensions.register(spark)
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
    val n = e.count()
    val got = TopKPerGroup(e, Seq(e("event_type")),
      Seq((e("value"), true), (e("event_id"), false)), 1000000)
    assert(got.count() == n)
  }
}
