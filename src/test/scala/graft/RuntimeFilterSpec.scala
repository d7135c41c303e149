package graft

import org.apache.spark.sql.functions._

/** Runtime-filter (bloom) injection — the 100 TB join optimization where
  * the selective small side's key set is sketched into a bloom filter and
  * pushed into the fat side's SCAN, so most fact rows die before the
  * shuffle. Spark's `InjectRuntimeFilter` does this automatically; this
  * spec pins that the engine's join shapes are ELIGIBLE for it (the rule
  * fires once thresholds match production sizes) and that the filtered
  * plan stays result-identical.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a bloom might_contain into the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: broadcast joins get no benefit from a bloom
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_quantity"))
      val dim = Tables.part(spark, sfDir)
        .filter(col("p_partkey") % 37 === 0) // selective: ~1/37 of keys
        .select(col("p_partkey"))
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey")).agg(sum(col("l_quantity")).as("q"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"runtime bloom filter was not injected:\n$opt")
      // the bloom is an OPTIMIZATION, never a semantics change
      val expected = {
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        joined.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      }
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      val got = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(got == expected && got.nonEmpty)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
