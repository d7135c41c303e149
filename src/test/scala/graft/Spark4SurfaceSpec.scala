package graft

import graft.operators.{Mining, Normalize, Relational, TextOps}
import graft.sources.FileSources
import org.apache.spark.sql.functions._

/** Tests for the round-7 platform-surface batch: the Spark-4 syntax/type
  * features (SQL pipe, collations, native XML) and the two new analytics
  * (URL decomposition, Mann-Whitney U). Each is checked against an
  * independent in-JVM rendering — a different code path from both the
  * registered plan and the DuckDB oracle.
  */
class Spark4SurfaceSpec extends SparkSpec {

  test("q_sql_pipe: the pipe-syntax program equals its DataFrame rendering") {
    val pipe = Relational.qSqlPipe(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val df = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(pipe.nonEmpty && pipe.toSeq == df.toSeq,
      "pipe syntax must be pure notation over the same plan")
  }

  test("q_collate: UTF8_LCASE grouping equals normalize-then-group, and sees through case") {
    val got = TextOps.qCollate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val manual = Tables.documents(spark, sfDir)
      .select(lower(col("source")).as("source_ci"), col("n_chars"))
      .groupBy(col("source_ci"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source_ci")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // The mixed-case injection must not split any group: collation-aware
    // grouping lands the UPPER'd odd-doc rows in the same buckets as the
    // untouched even-doc rows, so totals equal the all-lowercase baseline.
    assert(got.toSeq == manual.toSeq && got.nonEmpty)
    // And the casing really was mixed going in (the test isn't vacuous).
    val nUpper = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 1).count()
    assert(nUpper > 0)
  }

  test("q_xml_source: XML round-trip is lossless vs the parquet original") {
    val xml = FileSources.qXmlSource(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val orig = Tables.events(spark, sfDir)
      .select(col("event_id"), Tables.tsSeconds(col("ts")).as("ts_s"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    assert(xml.length == orig.length && xml.toSeq == orig.toSeq)
  }

  test("q_url_parse: parse_url agrees with the synthesized components") {
    val got = Normalize.qUrlParse(spark, sfDir).collect()
    assert(got.nonEmpty)
    // Hosts are exactly the source labels + the fixed domain, n_docs sums
    // to the corpus, and sum_p is re-derivable from doc_id % 7.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = docs.groupBy(_._2)
    got.foreach { r =>
      val host = r.getString(0)
      val src = host.stripSuffix(".example.org")
      assert(bySource.contains(src), s"unexpected host $host")
      val rows = bySource(src)
      assert(r.getLong(1) == rows.length.toLong, "n_docs")
      assert(r.getLong(2) == rows.map(_._1).distinct.length.toLong,
        "n_paths: one distinct path per doc_id")
      assert(r.getLong(3) == rows.map(_._1 % 7).sum, "sum_p")
      assert(r.getLong(4) == rows.map(_._3).sum, "sum_chars")
    }
    assert(got.map(_.getLong(1)).sum == docs.length.toLong)
  }

  test("q_mann_whitney: z matches a brute-force midrank computation") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull && col("event_type").isin("click", "error"))
      .select(col("value"), col("event_type")).collect()
      .map(r => (r.getDouble(0), r.getString(1) == "click"))
    val sorted = rows.sortBy(_._1)
    // Brute-force midranks (1-based), group A rank-sum.
    val n = sorted.length
    var i = 0
    var r1 = 0.0
    while (i < n) {
      var j = i
      while (j < n && sorted(j)._1 == sorted(i)._1) j += 1
      val midrank = (i + 1 + j) / 2.0 // avg of ranks i+1 .. j
      (i until j).foreach { k => if (sorted(k)._2) r1 += midrank }
      i = j
    }
    val n1 = rows.count(_._2).toLong
    val n2 = rows.length - n1
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val got = Mining.qMannWhitney(spark, sfDir).collect().head
    assert(got.getLong(0) == n1 && got.getLong(1) == n2)
    assert(got.getLong(2) == math.round(2 * u1), "2U must be the exact doubled rank-sum")
    // Tie term and z against the textbook formulas (double tolerance: the
    // brute force here sums midranks as doubles, the plan stays integer).
    val tieGroups = rows.groupBy(_._1).values.map(_.length.toLong)
    val t = tieGroups.map(c => c * c * c - c).sum
    assert(got.getLong(3) == t)
    val nn = (n1 + n2).toDouble
    val varU = (n1 * n2 / 12.0) * ((nn + 1.0) - t / (nn * (nn - 1.0)))
    val zRef = (u1 - n1 * n2 / 2.0) / math.sqrt(varU)
    assert(math.abs(got.getDouble(4) - zRef) < 1e-9, s"z ${got.getDouble(4)} vs $zRef")
  }

  test("q_sql_var: the session-variable cut equals the inlined scalar subquery") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
    val cut = rows.map(_._2).sum / rows.length
    val want = rows.filter(_._2 > cut).groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).sum)).toMap
    val got = Relational.qSqlVar(spark, sfDir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (n, sq) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == sq, r.getString(0))
    }
    assert(want.values.map(_._1).sum < rows.length,
      "the variable cut must filter")
  }

  test("q_scalar_subquery: correlated projections equal the join rendering and decorrelate") {
    val custs = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") >= 9000.0)
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        max(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("mx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = Relational.qScalarSubquery(spark, sfDir).collect()
    assert(got.length == custs.length && got.nonEmpty)
    got.zip(custs.sortBy(_._1)).foreach { case (g, (ck, name)) =>
      assert(g.getLong(0) == ck && g.getString(1) == name)
      val (n, mx) = perCust.getOrElse(ck, (0L, -1L))
      assert(g.getLong(2) == n, s"cust $ck n_orders")
      if (n > 0) assert(g.getLong(3) == mx) else assert(g.isNullAt(3))
    }
    // The plan must be a decorrelated aggregate join, not a per-row loop.
    val plan = Relational.qScalarSubquery(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("ScalarSubquery"),
      "correlated scalars must decorrelate out of the plan")
  }

  test("q_identifier: the parameter-bound relation equals the direct query") {
    val direct = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("rev_cents"))
      .orderBy(col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Relational.qIdentifier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == direct && got.nonEmpty)
  }

  test("q_sdp_pipeline: the declarative runtime schedules clean before its two dependents") {
    import org.apache.spark.sql.pipelines.GraftPipelineBridge
    import org.apache.spark.sql.pipelines.GraftPipelineBridge.TableSpec
    val db = s"sdp_spec_${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val storage = java.nio.file.Files
      .createTempDirectory("graft_sdp_spec_").toUri.toString
    // clean fans out to TWO dependents — a real dataflow edge, so the
    // runtime must finish clean's flow before starting either dependent.
    val events = GraftPipelineBridge.runBatchPipeline(spark, db, Seq(
      TableSpec("agg_a", "SELECT lang, COUNT(*) AS n FROM clean GROUP BY lang"),
      TableSpec("clean",
        s"SELECT * FROM parquet.`$sfDir/documents.parquet` WHERE n_chars >= 100"),
      TableSpec("agg_b", "SELECT source, COUNT(*) AS n FROM clean GROUP BY source")
    ), storage)
    // Materialized tables are ordinary catalog tables afterwards.
    val nClean = spark.table(s"$db.clean").count()
    val wantClean = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("n_chars") >= 100).count()
    assert(nClean == wantClean && nClean > 0)
    assert(spark.table(s"$db.agg_a").count() > 0)
    assert(spark.table(s"$db.agg_b").count() > 0)
    // Scheduling order from the event log: clean's flow completes before
    // either dependent flow starts (declaration order above is shuffled
    // on purpose — the runtime must TOPOLOGICALLY sort, not run in order).
    def idx(p: String): Int = events.indexWhere(_.matches(s"(?s).*$p.*"))
    val cleanDone = idx(s"Flow spark_catalog\\.$db\\.clean has COMPLETED")
    val aStart = idx(s"Flow spark_catalog\\.$db\\.agg_a is RUNNING")
    val bStart = idx(s"Flow spark_catalog\\.$db\\.agg_b is RUNNING")
    assert(cleanDone >= 0 && aStart >= 0 && bStart >= 0,
      s"expected flow lifecycle events, got:\n${events.mkString("\n")}")
    assert(cleanDone < aStart && cleanDone < bStart,
      s"dependents must wait for clean: clean@$cleanDone a@$aStart b@$bStart")
  }

  test("sdp: a 4-wave chain completes with every wave's table materialized") {
    // Completion-detection guard for the round-20 event-driven batch
    // scheduler (the round-19 probe showed pollingInterval=0 on the
    // SHIPPED scheduler returned before flows materialized —
    // TABLE_OR_VIEW_NOT_FOUND; this pins the replacement never does):
    // a strictly SERIAL 4-deep dependency chain, each wave read back
    // after the run, plus diamond re-convergence (d reads b AND c).
    import org.apache.spark.sql.pipelines.GraftPipelineBridge
    import org.apache.spark.sql.pipelines.GraftPipelineBridge.TableSpec
    val db = s"sdp_chain_${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val storage = java.nio.file.Files
      .createTempDirectory("graft_sdp_chain_").toUri.toString
    val events = GraftPipelineBridge.runBatchPipeline(spark, db, Seq(
      TableSpec("d", "SELECT b.lang, b.n, c.total FROM b CROSS JOIN c"),
      TableSpec("b", "SELECT lang, COUNT(*) AS n FROM a GROUP BY lang"),
      TableSpec("c", "SELECT SUM(n) AS total FROM b"),
      TableSpec("a",
        s"SELECT * FROM parquet.`$sfDir/documents.parquet` WHERE n_chars >= 100")
    ), storage)
    val nA = spark.table(s"$db.a").count()
    val nB = spark.table(s"$db.b").count()
    val total = spark.table(s"$db.c").collect().head.getLong(0)
    val nD = spark.table(s"$db.d").count()
    assert(nA > 0 && nB > 0 && nD == nB,
      s"all four waves must materialize: a=$nA b=$nB d=$nD")
    assert(total == nA, s"c must aggregate b's counts to a's rows: $total != $nA")
    // Every flow ran strictly after ALL its upstream flows completed.
    def idx(p: String): Int = events.indexWhere(_.matches(s"(?s).*$p.*"))
    def done(t: String) = idx(s"Flow spark_catalog\\.$db\\.$t has COMPLETED")
    def run(t: String) = idx(s"Flow spark_catalog\\.$db\\.$t is RUNNING")
    Seq("a" -> "b", "b" -> "c", "b" -> "d", "c" -> "d").foreach {
      case (up, dn) =>
        assert(done(up) >= 0 && run(dn) >= 0 && done(up) < run(dn),
          s"$dn must start after $up completes: " +
            s"${done(up)} vs ${run(dn)}\n${events.mkString("\n")}")
    }
  }
}
