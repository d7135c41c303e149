package graft

import graft.operators.{Normalize, Relational}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit tests for the core relational surface (SURVEY.md §2c) — semantics
  * the oracle compare can't isolate: the zero-epoch guard, top-k/sort
  * agreement, and argmax consistency between the two top-1 forms.
  */
class RelationalSpec extends SparkSpec {

  test("q_epoch_fmt: zero-epoch rows format to NULL, others to UTC seconds (app.py:126-127 guard)") {
    val rows = Normalize.qEpochFmt(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val epochMs = r.getLong(1)
      val fmt = if (r.isNullAt(2)) null else r.getString(2)
      if (id % 97 == 0) {
        assert(epochMs == 0L, s"event $id should carry the injected zero epoch")
        assert(fmt == null, s"event $id: zero epoch must format to NULL")
      } else {
        assert(fmt != null && fmt.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""),
          s"event $id: expected yyyy-MM-dd HH:mm:ss, got $fmt")
      }
    }
  }

  test("q_topk is exactly the first k rows of q_sort_desc") {
    val topk = Relational.qTopk(spark, sfDir).collect().toSeq
    val prefix = Relational.qSortDesc(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .limit(30).collect().toSeq
    assert(topk == prefix)
  }

  test("q_top1 agrees with a driver-side argmax over the raw table") {
    val top = Relational.qTop1(spark, sfDir).collect().head
    val expected = Tables.events(spark, sfDir)
      .na.drop(Seq("value"))
      .collect()
      .maxBy(r => (r.getTimestamp(1).getTime, r.getLong(0)))
    assert(top.getString(1) == expected.getString(3))
    assert(top.getDouble(2) == expected.getDouble(4))
  }

  test("q_max_by winners match a per-group hand computation") {
    val got = Relational.qMaxBy(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = Tables.events(spark, sfDir).collect()
      .groupBy(_.getString(3))
      .map { case (t, rows) =>
        val best = rows.minBy(r => (-r.getDouble(4), r.getLong(0)))
        t -> (best.getLong(0), best.getDouble(4))
      }
    assert(got == want)
  }

  test("q_limit is deterministic across partitionings") {
    val a = Relational.qLimit(spark, sfDir).collect().toSeq
    val b = Relational.qLimit(spark, sfDir).collect().toSeq
    assert(a == b && a.size == 30)
  }

  test("q_exists matches a brute-force evaluation of all three subqueries") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val byCust = orders.groupBy(_._1)
    val want = custs.filter { c =>
      val os = byCust.getOrElse(c, Array.empty)
      os.exists(_._3 > 400000.0) &&
        !os.exists(o => o._2 == "F" && o._3 < 50000.0)
    }.sorted.map(c => (c, byCust(c).length.toLong))
    val res = Relational.qExists(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(res == want.toSeq)
    // the fixture must exercise BOTH filters (some pass EXISTS but fail
    // NOT EXISTS), or the anti-join is dead weight
    val existsOnly = custs.count(c =>
      byCust.getOrElse(c, Array.empty).exists(_._3 > 400000.0))
    assert(res.size > 0 && res.size < existsOnly)
  }

  test("q_sql_recursive spine is gap-free month-by-month and counts reconcile") {
    import org.apache.spark.sql.functions._
    val months = Tables.orders(spark, sfDir)
      .select(date_trunc("month", col("o_orderdate")).as("m"))
      .groupBy("m").count().collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val got = graft.operators.Relational.qSqlRecursive(spark, sfDir).collect()
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    // Recursion must cover EVERY month from min to max, including months
    // with zero orders (n_orders = 0) — the spine is calendar-complete.
    val spine = got.map(r => fmt.parse(r.getString(0)))
    val cal = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
    spine.sliding(2).foreach {
      case Array(a, b) =>
        cal.setTime(a); cal.add(java.util.Calendar.MONTH, 1)
        assert(cal.getTime == b, s"spine gap between $a and $b")
      case _ =>
    }
    got.foreach { r =>
      val t = fmt.parse(r.getString(0)).getTime
      assert(r.getLong(1) == months.getOrElse(t, 0L), s"month $t count")
    }
    assert(got.map(_.getLong(1)).sum == months.values.sum, "total orders reconcile")
  }

  test("q_paginate returns exactly rows 101-150 of the total order") {
    import org.apache.spark.sql.functions._
    val all = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("d"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getString(1), r.getLong(0),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
      .sortBy(t => (t._1, t._2))
    val want = all.slice(100, 150).map(t => (t._2, t._1, t._3)).toSeq
    val got = graft.operators.Relational.qPaginate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("q_sql_params equals the literal-inlined DataFrame program") {
    val inlined = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_acctbal") >= 1000.0 && col("o_orderpriority") === "1-URGENT")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("rev_cents"))
      .orderBy(col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = graft.operators.Relational.qSqlParams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == inlined && got.nonEmpty)
  }

  test("q_sql_exec_immediate equals the statically-run statement") {
    val got = graft.operators.Relational.qSqlExecImmediate(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val static = spark.sql(
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
        |            AS BIGINT) AS sum_cents
        |FROM graft_events WHERE value IS NOT NULL AND value >= 50.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == static && got.nonEmpty)
  }

}
