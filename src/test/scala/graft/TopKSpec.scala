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
    // rn stays in the projection (stripped driver-side) so this baseline
    // does NOT match RowNumberTopKRewrite's drop("rn") pattern — it must
    // remain a genuine WindowExec plan for the comparison to mean
    // anything once the rewrite rule is registered in the shared session.
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
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

  test("RowNumberTopKRewrite turns the window top-k idiom into the custom operator") {
    GraftExtensions.register(spark)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val idiom = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    val p = idiom.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup [") && !p.contains("Window"),
      s"window idiom must be rewritten to the heap operator:\n$p")
    val got = idiom.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == windowForm(3), "rewritten plan must return the window form's rows")
    // A KEPT rank column must NOT be rewritten (different output shape).
    val kept = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"),
      "rewrite over-matched: rn is still projected")
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
