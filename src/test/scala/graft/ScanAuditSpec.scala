package graft

/** ONE-OFF AUDIT (not part of the suite contract): for every registered
  * BATCH query, count how many times each parquet path appears as a scan
  * in the PRINTED plan. Prints a report; never fails.
  *
  * TRIAGE CAVEAT (the round-11 lesson): a repeated scan in the printed
  * plan is a REAL duplicate only when the repeated subtree sits under
  * DIFFERENT exchange keys — identical-exchange duplicates are deduped
  * at runtime by Spark's ReuseExchange / AQE stage reuse, and caching
  * them measurably HURTS (materialization overhead for no saved
  * compute). The two real defects this audit surfaced were exactly the
  * different-key kind: q_cdc_chunks' totals⋈uniques (agg keys (source)
  * vs distinct (source,h,clen) — fixed by the single-pass roll-up) and
  * q_media_dedup's typed boundary. Speculative caches added for
  * identical-exchange repeats (power_iter, recall_eval, scd2_apply,
  * quantile_merge, neyman_alloc) were measured slower and reverted.
  */
class ScanAuditSpec extends SparkSpec {

  // `ignore` by default: the audit plans (and partially executes) every
  // batch query (~4 min) — run on demand by flipping to `test` or via
  //   sbt 'testOnly graft.ScanAuditSpec'  after changing ignore→test.
  ignore("audit: per-query repeated-table scan counts") {
    val streaming = SparkEntry.queries.keys.filter(_.startsWith("q_stream"))
      .toSet ++ Set("q_deadletter", "q_http_source", "q_state_read",
      "q_window_tumble", "q_window_slide", "q_session")
    val pathRe = "Location: InMemoryFileIndex[^\\]]*\\[([^\\]]*)\\]".r
    val scanRe = "Scan parquet ".r
    val report = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, f) =>
      if (!streaming(name)) {
        try {
          val p = f(spark, sfDir).queryExecution.executedPlan.toString
          val scans = scanRe.findAllIn(p).length
          val paths = pathRe.findAllMatchIn(p).map(_.group(1)).toSeq
          val byPath = paths.groupBy(identity).view.mapValues(_.size)
            .filter(_._2 >= 2)
          if (byPath.nonEmpty) {
            val cached = "InMemoryTableScan".r.findAllIn(p).length
            val pinned = "Scan ExistingRDD".r.findAllIn(p).length
            report.append(f"$name%-28s scans=$scans%2d cached=$cached%2d " +
              f"pinned=$pinned%2d repeats=" +
              byPath.map { case (k, v) =>
                s"${k.split('/').last}x$v" }.mkString(",") + "\n")
          }
        } catch { case e: Throwable =>
          report.append(f"$name%-28s ERROR ${e.getMessage.take(60)}\n")
        }
      }
    }
    println("=== SCAN AUDIT BEGIN ===")
    println(report.result())
    println("=== SCAN AUDIT END ===")
  }
}
