package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Mining

/** Dev probe (round 20, VERDICT item #5): the designed-but-unmeasured
  * "fifth shape" for q_bootstrap_ci — per-row replicate ARRAY, exploded
  * to (type, replicate) pairs and aggregated by the NARROW key — against
  * the shipped one-pass 2R-column fused hash aggregate (round-19's
  * winner over 4 alternative shapes).
  *
  * Why this is the faithful rendering of the fifth shape: Spark has no
  * element-wise array-sum aggregate that keeps a HashAggregate buffer
  * (an ArrayType buffer forces SortAggregate / ObjectHashAggregate), so
  * the struct-of-arrays fold materializes as posexplode + groupBy(type,
  * r) — partial map-side aggregation still bounds the shuffle at
  * |types|·R rows per partition (guide §2.3), and the per-row work
  * trades 2R aggregate-buffer updates for one R-element array build
  * plus 40× row amplification through codegen.
  *
  * Interleaved best-of-N in one session; result equality asserted
  * against the shipped query before timing.
  */
object BootShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.hadoop.fs.file.impl",
        "graft.hadoop.GraftLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.hadoop.GraftLocalFs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val R = Mining.BootReplicates
    val P = Mining.BootP

    def weightOf(u: Column): Column = Mining.PoissonCdf.reverse
      .foldLeft(lit(5L)) { case (acc, (thr, k)) =>
        when(u < thr, lit(k.toLong)).otherwise(acc) }

    /** Fifth shape: one array of (ws, wn) structs per row, posexploded to
      * the (event_type, replicate) grain, summed there, re-assembled.
      */
    def fifthShape(d: String): DataFrame = {
      val bootParams = (0 until R).map(r =>
        (2L * r + 1, (1000003L * r + 12345L) % P))
      val contribs = bootParams.map { case (a, b) =>
        val w = weightOf(((lit(a) * col("h") + lit(b)) % P) % 1000000L)
        struct(
          round(w.cast("double") * col("value") * lit(1000000.0))
            .cast("long").as("ws"),
          w.as("wn"))
      }
      val narrow = graft.Tables.events(spark, d)
        .select(col("event_type"), col("value"),
          (conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % P).as("h"))
        .select(col("event_type"), posexplode(array(contribs: _*)))
        .groupBy(col("event_type"), col("pos"))
        .agg(sum(col("col.ws")).as("ws"), sum(col("col.wn")).as("wn"))
      val ms = when(col("wn") > 0L,
        (col("ws").cast("double") / lit(1000000.0)) / col("wn").cast("double"))
      val point = graft.Tables.events(spark, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), graft.Tables.exactAvg(col("value")).as("mean"))
      narrow
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(ms)).as("msArr"))
        .select(col("event_type"),
          element_at(col("msArr"), 2).as("ci_lo"),
          element_at(col("msArr"), R - 1).as("ci_hi"))
        .join(broadcast(point), "event_type")
        .select(col("event_type"), col("n"), col("mean"),
          col("ci_lo"), col("ci_hi"))
        .orderBy(col("event_type"))
    }

    // Result equality first (the oracle contract): identical rows.
    val shipped = SparkEntry.queries("q_bootstrap_ci")(spark, sfDir)
    val fifth = fifthShape(sfDir)
    val a = shipped.collect().map(_.toString).toSeq
    val b = fifth.collect().map(_.toString).toSeq
    require(a == b, s"fifth shape diverges:\n${a.take(3)}\nvs\n${b.take(3)}")
    println(s"[boot-probe] result parity over ${a.size} rows: OK")

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (rep <- 1 to reps; (tag, df) <- Seq(
        "shipped" -> (() => SparkEntry.queries("q_bootstrap_ci")(spark, sfDir)),
        "fifth" -> (() => fifthShape(sfDir)))) {
      val t0 = System.nanoTime()
      df().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      times(tag) = s :: times.getOrElse(tag, Nil)
      println(f"[boot-probe] rep$rep $tag%-8s $s%6.2f s")
    }
    times.foreach { case (tag, ts) =>
      println(f"[boot-probe] best $tag%-8s ${ts.min}%6.2f s")
    }
    spark.stop()
  }
}
