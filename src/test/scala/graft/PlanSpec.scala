package graft

import graft.operators.{Analytics, Relational, Similarity, TextOps}

/** Physical-plan shape assertions: the scaladocs' scale claims pinned as
  * tests, so a refactor that silently degrades a plan (extra shuffle, lost
  * pushdown, lost top-k heap, a surprise nested-loop join) fails CI
  * instead of surviving until a 100 TB run finds it.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q_asof_join shuffles ONCE on the customer key (plus the final presentation sort)") {
    val p = plan(Analytics.qAsofJoin(spark, sfDir))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"as-of join must be the single-shuffle union plan, saw $hashExchanges hash exchanges:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "as-of join must never degrade to a nested-loop/cartesian plan")
  }

  test("q_tfidf prunes the documents scan to (doc_id, text)") {
    val p = plan(TextOps.qTfidf(spark, sfDir))
    // Three scans of documents (tf, df, N); none may read `lang` — column
    // pruning must reach the parquet ReadSchema.
    assert(!p.contains("lang"),
      s"tfidf reads a column it never uses — pruning lost:\n$p")
  }

  test("q_topk and q_cosine_topk plan as TakeOrderedAndProject, not a global sort") {
    for ((name, df) <- Seq(
        "q_topk" -> Relational.qTopk(spark, sfDir),
        "q_cosine_topk" -> Similarity.qCosineTopk(spark, sfDir))) {
      val p = plan(df)
      assert(p.contains("TakeOrderedAndProject"),
        s"$name must use the per-partition top-k heap:\n$p")
    }
  }

  test("q_filter_eq pushes its predicate into the parquet scan") {
    val p = plan(Relational.qFilterEq(spark, sfDir))
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"filter must reach the scan:\n$p")
  }

  test("q_sample_balanced bounds its per-key sort (WindowGroupLimit or the TopKPerGroup rewrite)") {
    // Two acceptable plans, both bounded-per-key: Spark's own
    // InferWindowGroupLimit pushes the rank filter below the sort; if
    // GraftExtensions has been registered on the shared session (any
    // earlier q_topk_group run does this), RowNumberTopKRewrite fires
    // FIRST and replaces the whole window with the O(k)-heap custom
    // operator — strictly stronger. What must never appear is a bare
    // full-partition WindowExec sort.
    val p = plan(Analytics.qSampleBalanced(spark, sfDir))
    assert(p.contains("WindowGroupLimit") || p.contains("TopKPerGroup"),
      s"rn <= k must become a group limit or the top-k heap operator:\n$p")
  }

  test("q_event_gap computes lag and lead from ONE shuffle and ONE per-key sort") {
    val p = plan(Analytics.qEventGap(spark, sfDir))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"both offsets must share the user_id window, saw $hashExchanges hash exchanges:\n$p")
    assert("\\bWindow\\b".r.findAllIn(p).length == 1,
      s"lag and lead must evaluate in one Window operator:\n$p")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The 100 TB scan-pruning mechanism BEYOND static pushdown: when a
    // selective dimension filters a shuffle join, Spark injects a bloom
    // filter built from the dim keys into the FACT side's scan, so fact
    // rows with no join partner die at the scan instead of shuffling.
    // Local fixture sizes are below the production thresholds, so the
    // thresholds are scaled down — the assertion is the mechanism (filter
    // creation + might_contain application + identical results), which is
    // size-independent.
    val bf = spark.newSession()
    bf.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    bf.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    bf.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    bf.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    bf.conf.set("spark.sql.shuffle.partitions", "4")
    import org.apache.spark.sql.functions.col
    def joined(s: org.apache.spark.sql.SparkSession) = {
      val li = Tables.lineitem(s, sfDir).select(col("l_orderkey"), col("l_quantity"))
      val sel = Tables.orders(s, sfDir)
        .filter(col("o_totalprice") > 500000.0) // highly selective dim
        .select(col("o_orderkey"), col("o_totalprice"))
      li.join(sel, col("l_orderkey") === col("o_orderkey"))
    }
    val df = joined(bf)
    val rows = df.collect().length
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain") || p.contains("bloom_filter"),
      s"runtime bloom filter was not injected into the fact scan:\n$p")
    // Pruning must be semantically invisible: same rows with it disabled.
    val plain = spark.newSession()
    plain.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    plain.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    assert(joined(plain).count() == rows)
  }

  test("q_rank_fusion windows run over TakeOrdered'd candidate lists, never the corpus") {
    val p = plan(graft.operators.Ranking.qRankFusion(spark, sfDir))
    // Three heaps: one per candidate list (below each row_number window)
    // plus the final fused top-20 — so every unpartitioned window input
    // is O(RrfDepth) rows by construction.
    val heaps = "TakeOrderedAndProject".r.findAllIn(p).length
    assert(heaps == 3, s"expected 3 top-k heaps, saw $heaps:\n$p")
  }

  test("q_ndcg's rank filter prunes per-group sorts via WindowGroupLimit") {
    val p = plan(graft.operators.Ranking.qNdcg(spark, sfDir))
    assert(p.contains("WindowGroupLimit"),
      s"pos <= k must push a group limit below the per-type sort:\n$p")
  }

  test("q_bm25 tops out through a heap, not a global sort") {
    val p = plan(graft.operators.Ranking.qBm25(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"bm25 top-20 must be TakeOrderedAndProject:\n$p")
  }

  test("q_gini and q_rolling_count reuse ONE hash shuffle for window + downstream") {
    for ((name, df) <- Seq(
        "q_gini" -> graft.operators.Mining.qGini(spark, sfDir),
        "q_rolling_count" -> graft.operators.Mining.qRollingCount(spark, sfDir))) {
      val p = plan(df)
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashExchanges == 1,
        s"$name: window partitioning must serve the whole plan, saw $hashExchanges:\n$p")
    }
  }

  test("q_auc's prefix-sum window runs over the score histogram, not the log") {
    val p = plan(graft.operators.Ranking.qAuc(spark, sfDir))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"q_auc must aggregate to the histogram in one shuffle, saw $hashExchanges:\n$p")
    // The unpartitioned window must sit ABOVE the histogram aggregate
    // (single-partition exchange fed by the agg), never above the raw scan.
    val winIdx = p.indexOf("Window")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window must consume the aggregated histogram:\n$p")
  }

  test("q_decontaminate's train-set join stays an equi-join with no fan-out") {
    val p = plan(graft.operators.TextOps.qDecontaminate(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"decontamination must be the semi-join shape:\n$p")
  }

  test("q_top_supplier scans lineitem once and joins max + dimension broadcast-side") {
    val p = plan(Analytics.qTopSupplier(spark, sfDir))
    // The revenue subtree feeds both the max and the winner filter through
    // the self-join cache — a second lineitem scan means the cache contract
    // broke and the fact table is read twice.
    val lineitemScans = "lineitem".r.findAllIn(p).length
    assert(p.contains("InMemoryTableScan"),
      s"revenue table must be cached across its two uses:\n$p")
    // Both the 1-row max and the supplier dimension join broadcast-side —
    // the fact-side revenue table never reshuffles for either.
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj == 2, s"expected 2 broadcast joins (max filter, dim), saw $bhj:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in the winner lookup may shuffle-sort:\n$p")
    assert(lineitemScans <= 2, // path appears once per cached scan reference
      s"fact table must be scanned once:\n$p")
  }

  test("q_bpe_pairs aggregates to the vocabulary before the pair explode, tops out via heap") {
    val p = plan(TextOps.qBpePairs(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be the per-partition heap, not a global sort:\n$p")
    // Two Generates (token explode, pair explode) separated by the vocab
    // aggregate: the pair explode must consume the AGGREGATED vocabulary,
    // not the raw token stream.
    val genIdxs = "Generate".r.findAllIn(p).matchData.map(_.start).toSeq
    assert(genIdxs.length == 2, s"expected 2 explodes, saw ${genIdxs.length}:\n$p")
    val between = p.substring(genIdxs.min, genIdxs.max)
    assert(between.contains("HashAggregate"),
      s"pair explode must run over the vocab aggregate, not raw tokens:\n$p")
  }

  test("q_promo_share computes numerator and denominator in ONE fact-table pass") {
    val p = plan(Analytics.qPromoShare(spark, sfDir))
    // The conditional-aggregation claim: one lineitem scan serves both
    // sums — the two-filtered-scans alternative would read the fact twice.
    val factScans = "lineitem".r.findAllIn(p).length
    assert(factScans == 1, s"expected 1 lineitem scan, saw $factScans:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"part join must not shuffle-sort at fixture scale:\n$p")
  }

  test("q_markov's only data-sized shuffle is the per-user lag window") {
    val p = plan(Analytics.qMarkov(spark, sfDir))
    // Everything above the partial (prev,cur) aggregate runs on a
    // |types|^2-row table and may shuffle freely; the LOG-sized subtree —
    // everything below the last (deepest, partial) HashAggregate in the
    // printed tree — must contain exactly one hash exchange: the user_id
    // window shuffle. A second one means the log is being re-shuffled.
    val scanSide = p.substring(p.lastIndexOf("HashAggregate"))
    val scanSideExchanges = "Exchange hashpartitioning".r
      .findAllIn(scanSide).length
    assert(scanSideExchanges == 1,
      s"log-sized data must shuffle once (user_id window), saw $scanSideExchanges:\n$p")
  }

  test("no LSH/inverted-index join degrades to nested-loop or cartesian") {
    for ((name, df) <- Seq(
        "q_cosine_neardup" -> Similarity.qCosineNeardup(spark, sfDir),
        // The registered pair-set queries read the session-pinned leaf, so
        // the banded-join shape is asserted on the UNPINNED builders.
        "q_simhash_pairs" -> TextOps.simhashPairSetUnpinned(spark, sfDir),
        "q_ngram_jaccard_capped" -> TextOps.qNgramJaccardCapped(spark, sfDir),
        "q_minhash_lsh" -> TextOps.minhashPairsUnpinned(spark, sfDir),
        "q_range_join" -> Analytics.qRangeJoin(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name candidate generation must stay an equi-join:\n$p")
    }
  }

  test("q_bootstrap_ci is one wide aggregate: no row explosion, pruned scan") {
    val p = plan(graft.operators.Mining.qBootstrapCi(spark, sfDir))
    // The 40 replicates live in aggregate COLUMNS — a Generate (explode)
    // node would mean the plan multiplies rows by R before aggregating.
    assert(!p.contains("Generate"),
      s"bootstrap must not explode rows per replicate:\n$p")
    assert(!p.contains("props") && !p.contains("\"ts\""),
      s"bootstrap reads columns it never uses:\n$p")
  }

  test("q_ks_test and q_psi never read documents.text") {
    for ((name, df) <- Seq(
        "q_ks_test" -> graft.operators.Mining.qKsTest(spark, sfDir),
        "q_psi" -> graft.operators.Mining.qPsi(spark, sfDir))) {
      val p = plan(df)
      // Both statistics need only (doc_id | lang, n_chars); dragging the
      // text payload through the shuffle would dominate the cost at scale.
      assert(!p.contains("text"),
        s"$name reads documents.text — column pruning lost:\n$p")
    }
  }

  test("q_pagerank stays equi-join shaped and tops out through a heap") {
    val p = plan(TextOps.qPagerank(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pagerank's rank joins must stay equi-joins:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"pagerank's top-20 must be a heap, not a global sort:\n$p")
  }

  test("q_exists decorrelates every subquery into semi/anti/outer joins") {
    val df = Relational.qExists(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    // RewritePredicateSubquery must have consumed EXISTS / NOT EXISTS —
    // the naive per-row inner-query re-execution never exists in Catalyst.
    assert(opt.contains("LeftSemi"),
      s"EXISTS must become a left-semi join:\n$opt")
    assert(opt.contains("LeftAnti"),
      s"NOT EXISTS must become a left-anti join:\n$opt")
    assert(!opt.toLowerCase.contains("exists("),
      s"no subquery expression may survive optimization:\n$opt")
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"decorrelated subqueries must stay equi-joins:\n$p")
  }

  test("q_interval_join candidates come from the cell equi-join, never a theta nested loop") {
    val p = plan(Analytics.qIntervalJoin(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap join must stay the bucketized equi-join:\n$p")
  }

  test("q_multi_distinct compiles to one Expand pass, not N self-reads") {
    val df = Analytics.qMultiDistinct(spark, sfDir)
    val p = plan(df)
    assert(p.contains("Expand"),
      s"multi-distinct must use the tagged-expand strategy:\n$p")
    // one scan of events feeds all four aggregates
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected a single events scan, saw $scans:\n$p")
    val r = df.collect().head
    assert(r.getLong(0) > r.getLong(1) && r.getLong(1) > r.getLong(2))
  }

  test("q_snapshot_diff and q_zorder push their predicates into the parquet scan") {
    for ((name, df) <- Seq(
        "q_snapshot_diff" -> Analytics.qSnapshotDiff(spark, sfDir),
        "q_zorder" -> graft.sources.WritePath.qZorder(spark, sfDir))) {
      val p = plan(df)
      assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
        s"$name predicate must reach the scan:\n$p")
    }
  }

  test("q_copurchase tops out through a heap; stats joins never nested-loop") {
    val p = plan(graft.operators.Mining.qCopurchase(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must be a per-partition heap, not a global sort:\n$p")
    // Exactly ONE nested-loop is legitimate: the 1-row n_orders total
    // broadcast-crossed onto the pair table. The stats joins must hash.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 1 && !p.contains("CartesianProduct"),
      s"only the 1-row total may cross-join (broadcast), never the stats joins:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"both per-part count joins must be hash joins:\n$p")
  }

  test("q_ann_pq joins codes to a BROADCAST lookup table, map-side") {
    val p = plan(Similarity.qAnnPq(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"the M×K LUT must broadcast — a shuffled LUT join re-shuffles the corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be a heap:\n$p")
  }

  test("q_phrase_search prunes documents to (doc_id, text) and equi-joins postings") {
    val df = TextOps.qPhraseSearch(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the adjacency constraint must fold into the equi-join, not a theta join:\n$p")
    assert(!p.contains("lang"),
      s"phrase search reads a column it never uses — pruning lost:\n$p")
    graft.Tables.clearSelfJoinCache()
  }

  test("q_url_parse is one map-side aggregate over a pruned scan; q_collate costs no extra shuffle") {
    val pu = plan(graft.operators.Normalize.qUrlParse(spark, sfDir))
    // text/lang beyond the URL inputs must not be read; no join anywhere.
    assert(!pu.contains("text"), s"url_parse reads documents.text:\n$pu")
    assert(!pu.contains("Join"), s"url_parse must be join-free:\n$pu")
    val pc = plan(graft.operators.TextOps.qCollate(spark, sfDir))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(pc).length
    // The collated group-by hashes the collation key exactly like the
    // explicit lower() plan: one data shuffle total (plus the final sort's
    // range exchange, which is not hashpartitioning).
    assert(hashExchanges == 1,
      s"collation grouping must cost one hash shuffle, saw $hashExchanges:\n$pc")
  }

  test("q_mann_whitney ranks over the distinct-value aggregate, never the log") {
    val p = plan(graft.operators.Mining.qMannWhitney(spark, sfDir))
    // The unpartitioned rank window must consume the per-value aggregate
    // (same stance as q_auc's histogram window).
    val winIdx = p.indexOf("Window")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"rank window must consume the per-value aggregate:\n$p")
    // Filter pushdown reaches the scan: only click/error rows are decoded.
    assert(p.contains("PushedFilters") && p.contains("click"),
      s"event_type filter must reach the parquet scan:\n$p")
  }

  test("q_containment shares the capped inverted-index shape: equi-join, no nested loop") {
    val p = plan(graft.operators.TextOps.qContainment(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"containment must stay an inverted-index equi-join:\n$p")
  }

  test("join strategy hints override the planner in both directions") {
    // The control surface a 100 TB job leans on when stats mislead the
    // planner: force a shuffle join where auto-broadcast would fire, and
    // force a broadcast where size estimates would pick shuffle. Results
    // are identical either way (same equi-join); only the strategy moves.
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("value"))
    val dim = Tables.events(spark, sfDir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_u"))
    // Tiny dim ⇒ planner picks BroadcastHashJoin...
    val auto = plan(ev.join(dim, "user_id"))
    assert(auto.contains("BroadcastHashJoin"), s"expected auto-broadcast:\n$auto")
    // ...MERGE hint must override it to a sort-merge join...
    val forcedSmj = plan(ev.join(dim.hint("merge"), "user_id"))
    assert(forcedSmj.contains("SortMergeJoin"),
      s"merge hint must force SMJ over auto-broadcast:\n$forcedSmj")
    // ...and the broadcast hint holds even with the threshold zeroed
    // (the stats-say-too-big case).
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val noAuto = plan(ev.join(dim, "user_id"))
      assert(!noAuto.contains("BroadcastHashJoin"),
        s"threshold off must disable auto-broadcast:\n$noAuto")
      val forcedB = plan(ev.join(broadcast(dim), "user_id"))
      assert(forcedB.contains("BroadcastHashJoin"),
        s"broadcast() must override the disabled threshold:\n$forcedB")
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q_rfm and q_attribution shuffle the raw log ONCE each") {
    // q_rfm: one per-user fold; the quartile windows run over the
    // user-sized aggregate. q_attribution: one user-partitioned window
    // chain; the journey windows reuse the same hash partitioning.
    for ((name, df, maxEx) <- Seq(
        ("q_rfm", graft.operators.Behavior.qRfm(spark, sfDir), 1),
        ("q_attribution", graft.operators.Behavior.qAttribution(spark, sfDir), 2))) {
      val p = plan(df)
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans <= 2, s"$name re-reads the log (saw $scans scans):\n$p")
      val dataShuffles = "Exchange hashpartitioning".r.findAllIn(p)
        .filter(_ => true).length
      assert(dataShuffles <= maxEx + 2,
        s"$name shuffle count grew (saw $dataShuffles):\n$p")
    }
  }

  test("q_tpch_q6 pushes all three predicate bands into the parquet scan") {
    val p = plan(Analytics.qTpchQ6(spark, sfDir))
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"Q6 predicates must reach the scan:\n$p")
    // The whole query is one scan + one aggregate: no join, no shuffle
    // beyond the final single-partition aggregate exchange.
    assert(!p.contains("Join"), s"Q6 must not join:\n$p")
  }

  test("q_cdf computes every grid counter in ONE pass (single scan, no grid explode before the agg)") {
    val p = plan(graft.operators.Stats.qCdf(spark, sfDir))
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"q_cdf must read events exactly once, saw $scans:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the grid must unpivot AFTER aggregation, not multiply the scan:\n$p")
  }

  test("q_fano is a single-scan two-level aggregate; q_heatmap computes its cells once (cached)") {
    val pf = plan(graft.operators.Stats.qFano(spark, sfDir))
    val scans = "Scan parquet".r.findAllIn(pf).length
    assert(scans == 1, s"q_fano must read events exactly once, saw $scans:\n$pf")
    // q_heatmap's two consumers (cells, total) share ONE cached cell
    // relation — the plan must read it through InMemoryTableScan, not
    // recompute the aggregate per consumer. (A cached subtree's plan
    // text repeats the parquet scan per consumer, so scan-counting
    // can't see this; the cache node can.)
    val ph = plan(Analytics.qHeatmap(spark, sfDir))
    assert(ph.contains("InMemoryTableScan"),
      s"q_heatmap's cell relation must be cached:\n$ph")
  }

  test("q_skew_report takes its top-20 with a heap, never a global sort of all keys") {
    val p = plan(Analytics.qSkewReport(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K keys must come from the bounded heap:\n$p")
  }

  test("q_seq3 sorts inside the user partitioning and heaps the final top-20") {
    val p = plan(Analytics.qSeq3(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 trigrams must be a bounded heap:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in q_seq3:\n$p")
  }

  test("q_anova is one scan + group-sized shuffles; q_cramers_v caches its cells") {
    val pa = plan(graft.operators.Stats.qAnova(spark, sfDir))
    val scans = "Scan parquet".r.findAllIn(pa).length
    assert(scans == 1, s"q_anova must read events once, saw $scans:\n$pa")
    val ex = "Exchange hashpartitioning".r.findAllIn(pa).length
    assert(ex <= 2,
      s"q_anova shuffles $ex times — group relations only means <= 2:\n$pa")
    val pc = plan(graft.operators.Stats.qCramersV(spark, sfDir))
    assert(pc.contains("InMemoryTableScan"),
      s"q_cramers_v's cell relation must be cached across its 4 consumers:\n$pc")
    assert(!pc.contains("CartesianProduct"),
      s"marginal joins are broadcasts of constant-sized relations:\n$pc")
  }


  test("q_tpch_q3 pushes each date band into ITS OWN scan and heaps the top-10") {
    val p = plan(Analytics.qTpchQ3(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"Q3's top-10 must be a bounded heap, not a global sort:\n$p")
    assert(p.contains("LessThan(o_orderdate"),
      s"the order-side date band must reach the orders scan:\n$p")
    assert(p.contains("GreaterThan(l_shipdate"),
      s"the ship-side date band must reach the lineitem scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"Q3 joins are all equi-joins:\n$p")
  }

  test("q_tpch_q5 rides broadcast for every dimension arm; no nested loop") {
    val p = plan(Analytics.qTpchQ5(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the two-armed nation condition must stay inside equi-joins:\n$p")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 2,
      s"nation LUT and supplier must ride broadcast joins, saw $bhj:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"the year band must reach the orders scan:\n$p")
  }

  test("q_tpch_q10 pushes the returnflag cut into the lineitem scan and heaps the top-20") {
    val p = plan(Analytics.qTpchQ10(spark, sfDir))
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"the returns cut must reach the lineitem scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 must be a bounded heap:\n$p")
  }

  test("q_tpch_q18 filters on the order-grain aggregate (HAVING before the join-back)") {
    val p = plan(Analytics.qTpchQ18(spark, sfDir))
    assert(p.contains("> 300"),
      s"the HAVING cut on total_qty must appear as a post-aggregate filter:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the join-back is an equi-join of the surviving tail:\n$p")
  }

  test("q_vec_quantize quantizes inside the scan projection: only the stats aggregate shuffles") {
    val p = plan(Similarity.qVecQuantize(spark, sfDir))
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex == 1,
      s"only the per-dimension stats aggregate may hash-shuffle — the vector table itself must quantize map-side, saw $ex:\n$p")
  }

  test("q_ann_sq8 scores in the scan stage: stats shuffle only, heap top-k") {
    val p = plan(Similarity.qAnnSq8(spark, sfDir))
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex == 1,
      s"only the per-dimension stats aggregate may hash-shuffle — ADC scoring must run map-side against broadcasts, saw $ex:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-10 must be a heap, not a global sort:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row stats/query joins must broadcast:\n$p")
  }

  test("q_kruskal windows over the value-domain aggregate, never the log") {
    val p = plan(graft.operators.Stats.qKruskal(spark, sfDir))
    val winIdx = p.indexOf("Window")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"the rank window must consume the per-value aggregate (the q_mann_whitney stance):\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"the per-(value,type) relation feeds two consumers and must be cached:\n$p")
  }

  test("q_naive_bayes scores per-doc rows against the broadcast model (no corpus-times-langs shuffle)") {
    val p = plan(TextOps.qNaiveBayes(spark, sfDir))
    assert(p.contains("InMemoryTableScan"),
      s"the TF relation feeds the model and the per-doc collapse and must be cached:\n$p")
    // The round-17 trim: scoring fans |docs|x|langs| through a BROADCAST
    // cross against the |langs|-row model — the doc-TERM relation never
    // shuffles times the label set again.
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the model fan must be a bounded broadcast cross:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only constant-sized relations may cross:\n$p")
  }


  test("q_tpch_q19 pushes the side-local OR implications into both scans") {
    val p = plan(Analytics.qTpchQ19(spark, sfDir))
    // The query states only the cross-side OR; Catalyst must derive each
    // side's disjunction and push it to that side's parquet scan.
    val linePushed = "PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(p)
    val partPushed = "PushedFilters: \\[[^\\]]*p_brand".r.findFirstIn(p)
    assert(linePushed.isDefined,
      s"the quantity-band disjunction must reach the lineitem scan:\n$p")
    assert(partPushed.isDefined,
      s"the brand/size disjunction must reach the part scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"part is a broadcast dim:\n$p")
  }

  test("q_tpch_q11 re-reads its part-grain aggregate from cache for the scalar total") {
    val p = plan(Analytics.qTpchQ11(spark, sfDir))
    assert(p.contains("InMemoryTableScan"),
      s"the part-grain relation feeds the cut AND the total — must be cached:\n$p")
  }

  test("q_target_encode shuffles only the category-moment aggregate") {
    val p = plan(Analytics.qTargetEncode(spark, sfDir))
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex <= 2,
      s"rows must encode map-side against broadcast moments, saw $ex hash exchanges:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-category moments join must broadcast:\n$p")
  }

  test("q_levene windows over the domain-sized count relation and broadcasts medians back") {
    val p = plan(graft.operators.Stats.qLevene(spark, sfDir))
    assert(p.contains("InMemoryTableScan"),
      s"the (type,cents) count relation feeds the median and the moments — must be cached:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"group medians join back broadcast:\n$p")
  }

  test("iterative peels keep their LOGICAL plans round-sized (the 5^r tripwire)") {
    // q_kcore's round-8 lesson: each peel round embedded the previous
    // round's plan 5×, so the tree grew 5^r and Catalyst re-planned
    // 30-44 s of pure driver work on an 84 k-row edge set — with every
    // tier cached-and-counted. checkpointTier cuts each tier to a
    // LogicalRDD leaf; this pins that the final plan stays round-sized
    // so a refactor back to lazy chaining fails HERE, not in the bench.
    def logicalSize(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case n => n }.length
    val kcore = logicalSize(TextOps.queries("q_kcore")(spark, sfDir))
    assert(kcore < 40,
      s"q_kcore's analyzed plan has $kcore nodes — lineage truncation lost")
    val lp = logicalSize(TextOps.queries("q_label_prop")(spark, sfDir))
    assert(lp < 40,
      s"q_label_prop's analyzed plan has $lp nodes — lineage truncation lost")
    // q_dedup_groups runs to FIXPOINT (unbounded rounds), so its final
    // plan must likewise be a projection over the last round's
    // checkpointed leaf — constant depth regardless of how many rounds
    // the component diameter forced.
    val dg = logicalSize(TextOps.queries("q_dedup_groups")(spark, sfDir))
    assert(dg < 10,
      s"q_dedup_groups' analyzed plan has $dg nodes — per-round lineage truncation lost")
  }

  test("post-close graph statistics ride the session pin and never re-derive the edge list") {
    // Round-9 post-close additions (q_clustering, q_assortativity,
    // q_modularity) landed after the main PlanSpec passes — the round-9
    // verdict asked for the same tripwires the older graph family has:
    // the edge list must come from the session-pinned LogicalRDD leaf
    // (one simhash band-join per session, not one per statistic), so the
    // plans must contain an ExistingRDD scan and NO re-run of the
    // shingle/simhash pipeline over documents.text.
    for ((name, df, docScanOk) <- Seq(
        ("q_clustering", TextOps.qClustering(spark, sfDir), false),
        ("q_assortativity", TextOps.qAssortativity(spark, sfDir), false),
        ("q_modularity", TextOps.qModularity(spark, sfDir), true))) {
      val p = plan(df)
      assert(p.contains("Scan ExistingRDD"),
        s"$name must read the session-pinned edge leaf:\n$p")
      if (docScanOk)
        // q_modularity's only parquet read is the (doc_id, source)
        // dimension — dragging text through the tag joins would make
        // the source tagging corpus-payload-sized at scale.
        assert(!p.contains("text"),
          s"q_modularity's source tag must not read documents.text:\n$p")
      else
        assert(!p.contains("Scan parquet"),
          s"$name must not re-derive anything from parquet — " +
            s"the pinned edge list is its only base relation:\n$p")
    }
  }

  test("q_kmv_overlap reads the corpus once, pruned, and broadcasts the sketch pair stage") {
    val p = plan(TextOps.qKmvOverlap(spark, sfDir))
    // ONE corpus pass: the collapsed |sources|-row sketch relation is
    // cached and BOTH pair-join sides read the cache — uncached, each
    // side re-runs the corpus shingle+hash+distinct chain (the round-10
    // regression this tripwire caught on first run).
    val cacheHits = "InMemoryTableScan".r.findAllIn(p).length
    assert(cacheHits >= 2,
      s"both pair-stage sides must read the cached sketch relation " +
        s"(saw $cacheHits InMemoryTableScans):\n$p")
    assert(p.contains("ReadSchema: struct<text:string,source:string>"),
      s"the documents scan must prune to (text, source):\n$p")
    // The pair stage is a |sources|-row broadcast self-join of the
    // collapsed sketch relation (theta condition source_a < source_b on
    // a ~20-row side — the bounded nested loop is the DESIGN, asserted
    // here so a refactor to a corpus-sized theta join cannot hide).
    assert(p.contains("BroadcastExchange"),
      s"the sketch pair stage must broadcast the tiny sketch side:\n$p")
  }

  test("q_bitmap_rollup aggregates words map-side-partial and broadcasts the day spine") {
    val p = plan(graft.operators.Behavior.qBitmapRollup(spark, sfDir))
    // The (day, bucket) word build must be a partial_bit_or hash
    // aggregate (associative — combines before the shuffle); losing the
    // partial would ship every raw event row through the exchange.
    assert(p.contains("partial_bit_or") || p.contains("partial_first") ||
      "HashAggregate.*bit_or".r.findFirstIn(p).isDefined,
      s"word build must be a partial bit_or hash aggregate:\n$p")
    // The phantom-window cut joins the ×7 fan-out against the tiny day
    // spine — that side must broadcast, never shuffle the fan-out extra.
    assert(p.contains("BroadcastExchange"),
      s"the day spine must broadcast into the phantom-window cut:\n$p")
    // Calendar math only — the scan needs (ts, user_id), nothing else.
    assert(p.contains("ReadSchema: struct<ts:timestamp"),
      s"events scan must prune to (ts, user_id):\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      s"the rollup is pure aggregation — no window operator:\n$p")
  }

  test("q_dp_counts prunes the scan to the cell keys and stays window-free") {
    val p = plan(graft.operators.Behavior.qDpCounts(spark, sfDir))
    // DP release touches only (event_type, ts): dragging value/props
    // into a privacy projection would read 2 unneeded corpus columns.
    assert(p.contains("ReadSchema: struct<ts:timestamp_ntz,event_type:string>")
        || p.contains("ReadSchema: struct<event_type:string,ts:timestamp"),
      s"events scan must prune to (event_type, ts):\n$p")
    // One shuffle total: the cell aggregate; noise is per-row scalar math.
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"DP release is one cell aggregate, saw $hashExchanges hash exchanges:\n$p")
  }

  test("q_topk_rewrite: the registered window idiom compiles to the heap operator") {
    // TopKSpec pins the rewrite on the bare idiom; this pins the
    // REGISTERED query (which adds a presentation sort on top) — the
    // rule must still match the inner Project(Filter(Window)) shape.
    val p = plan(Analytics.qTopkRewrite(spark, sfDir))
    assert(p.contains("TopKPerGroup ["),
      s"registered q_topk_rewrite must ride the heap operator:\n$p")
    assert(!p.contains("Window"),
      s"no WindowExec fallback in the registered query:\n$p")
  }

  test("q_tpch_q4 plans the EXISTS as a semi join with the date conjunct inside") {
    val p = plan(Analytics.qTpchQ4(spark, sfDir))
    assert(p.contains("LeftSemi"),
      s"the EXISTS must stay a semi join (each order emitted at most once):\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the non-equi date conjunct must ride the equi semi join, not a nested loop:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate") ||
      p.contains("GreaterThanOrEqual(o_orderdate"),
      s"the year band must reach the orders scan:\n$p")
  }

  test("q_cdc_chunks reads the corpus ONCE and keeps boundary math in the scan projection") {
    val p = plan(graft.operators.Corpus.qCdcChunks(spark, sfDir))
    // One corpus pass: the single-pass (source, h, clen) roll-up replaced
    // the totals ⋈ uniques double read.
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1,
      s"CDC must chunk the corpus once, saw $scans parquet scans:\n$p")
    // The O(n²) per-position probe chain must never return: boundary
    // hashes read the once-materialized char-code array.
    assert(!p.contains("ascii(substr"),
      s"boundary scan regressed to per-position ascii(substr(...)):\n$p")
    // Chunk rows shuffle exactly twice: (source, h, clen) partials, then
    // the source-sized roll-up. Text never moves.
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex == 2,
      s"CDC is two hash aggregations, saw $ex hash exchanges:\n$p")
  }

  test("q_media_dedup hashes frames in codegen: no typed boundary, heap top-20") {
    val p = plan(graft.operators.Multimodal.qMediaDedup(spark, sfDir))
    // sha2(substring(blob, ...)) over an exploded index replaced the
    // typed mapPartitions digest loop — no Dataset (de)serialization hop
    // may reappear between the scan and the aggregate.
    assert(!p.contains("DeserializeToObject") &&
        !p.contains("SerializeFromObject") && !p.contains("MapPartitions"),
      s"frame hashing fell out of codegen into a typed boundary:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be the per-partition heap:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"one blob pass, saw $scans parquet scans:\n$p")
    // Only (hash, doc) rows shuffle: the count-distinct pair agg ≤ 2
    // exchanges; blobs never move.
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex <= 2, s"segment agg must be the only shuffle(s), saw $ex:\n$p")
  }

  test("q_substring_dup: posting agg + interval window, no pair blow-up joins") {
    val p = plan(graft.operators.Corpus.qSubstringDup(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
      s"gram candidate generation must stay equi-join shaped:\n$p")
    // ONE window pass (the per-document interval-union sweep) — the
    // coverage math must not grow extra window operators.
    assert("WindowExec|Window \\[".r.findAllIn(p).length <= 1,
      s"interval union is one window sweep:\n$p")
  }

  test("q_gram_matrix folds arrays — no join, one corpus-keyed shuffle") {
    val p = plan(graft.operators.Similarity.qGramMatrix(spark, sfDir))
    // The whole upper triangle rides per-vector arrays into a two-level
    // fold: any Join node means the plan regressed to per-pair rows.
    assert(!p.contains("Join"),
      s"Gram matrix must be a fold, never a join:\n$p")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex == 1,
      s"one chunk-keyed exchange (then a single-partition fold), saw $ex:\n$p")
  }

  test("q_mips broadcasts the query vector and heaps the top-k — zero shuffles") {
    val p = plan(graft.operators.Similarity.qMips(spark, sfDir))
    assert(p.contains("BroadcastExchange"),
      s"the 1-row query vector must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"MIPS top-k must be the per-partition heap, not a global sort:\n$p")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex == 0,
      s"scoring is scan-local; saw $ex hash exchanges:\n$p")
  }

  test("q_ngram_coverage cuts the head with heaps over the CACHED count relation") {
    val p = plan(graft.operators.Corpus.qNgramCoverage(spark, sfDir))
    // Each K-cut is a TakeOrderedAndProject over the vocabulary — never
    // a global vocabulary sort funneled through one task.
    val heaps = "TakeOrderedAndProject".r.findAllIn(p).length
    assert(heaps >= 3,
      s"each of the 3 K-cuts needs its own heap, saw $heaps:\n$p")
    // The trigram count relation is computed once and re-read 4× (3 cuts
    // + the total) from cache.
    val cacheHits = "InMemoryTableScan".r.findAllIn(p).length
    assert(cacheHits >= 4,
      s"K-cuts must read the cached count relation, saw $cacheHits hits:\n$p")
  }

  test("q_sorted_neighborhood joins neighbors on the BIGINT rank, never a theta plan") {
    val p = plan(TextOps.qSortedNeighborhood(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
      s"SNM's window joins must be rank equi-joins:\n$p")
    // The global order comes from sort + zipWithIndex (an RDD leaf — it
    // renders as Scan ExistingRDD or as the typed Scan[obj] +
    // SerializeFromObject pair), the scale-safe idiom — not an
    // unpartitioned row_number window.
    assert(p.contains("Scan ExistingRDD") || p.contains("SerializeFromObject"),
      s"the rank relation must be the zipWithIndex leaf:\n$p")
    assert(!"WindowExec".r.findFirstIn(p).isDefined,
      s"no unpartitioned window may produce the global rank:\n$p")
  }

  test("q_ttr and q_simpson shuffle the token counts once, then a source roll-up") {
    for ((name, df) <- Seq(
        "q_ttr" -> graft.operators.Corpus.qTtr(spark, sfDir),
        "q_simpson" -> graft.operators.Corpus.queries("q_simpson")(spark, sfDir))) {
      val p = plan(df)
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans == 1, s"$name must read the corpus once, saw $scans:\n$p")
      val ex = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(ex == 2,
        s"$name is (source, token) agg + source roll-up, saw $ex exchanges:\n$p")
    }
  }

  test("q_fertility and q_train_split aggregate per-row projections — one shuffle, no explode") {
    val pf = plan(graft.operators.Corpus.qFertility(spark, sfDir))
    assert(!pf.contains("Generate"),
      s"fertility counts are size() in the scan projection, never an explode:\n$pf")
    assert("Exchange hashpartitioning".r.findAllIn(pf).length == 1,
      s"fertility is one lang-keyed aggregate:\n$pf")
    val pt = plan(graft.operators.Corpus.qTrainSplit(spark, sfDir))
    // Match the COLUMN REFERENCE (attribute `text#NN`), not the bare
    // substring — a fixture path segment or a future `context` field would
    // false-fail a plain contains("text").
    assert("""\btext#\d+""".r.findFirstIn(pt).isEmpty,
      s"train split reads identity + metadata, never documents.text:\n$pt")
    // Two domain-sized shuffles: the (lang, split) aggregate and the
    // per-lang share window over the 3·|langs| aggregate rows.
    assert("Exchange hashpartitioning".r.findAllIn(pt).length == 2,
      s"train split is agg + lang-share window, nothing corpus-sized:\n$pt")
  }

  test("q_bloom_fpr probes through a broadcast word-table hash join") {
    val p = plan(graft.operators.Analytics.queries("q_bloom_fpr")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the 1024-row word table must broadcast to the probe side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian in the probe join:\n$p")
  }

  test("q_ucb_replay's walk runs on the grid; spine scans stay aggregate-pruned") {
    val p = plan(graft.operators.Behavior.queries("q_ucb_replay")(spark, sfDir))
    // The day/arm spine derivations each aggregate the pruned log
    // immediately (6 cheap scans at the current shape — tripwired so a
    // refactor can't silently multiply them) and the sequential walk's
    // windows run over the |days|-sized grid, never the raw log.
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 6,
      s"spine/grid derivations grew beyond the pinned shape, $scans scans:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"spine densification must never plan a cartesian:\n$p")
    assert(!p.contains("props") && !p.contains("user_id"),
      s"the log scans must prune to (ts, event_type, value):\n$p")
  }

  test("q_ann_rerank: zero shuffles — broadcast query, heap shortlist, bounded windows") {
    val p = plan(graft.operators.Similarity.qAnnRerank(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"stage 1 must cut the corpus with a heap:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 0,
      s"rerank never hash-shuffles — scoring is scan-local, windows are " +
        s"shortlist-sized:\n$p")
  }

  test("q_rerank_budget reads the scored relation from cache for every cut") {
    val p = plan(graft.operators.Similarity.qRerankBudget(spark, sfDir))
    val cacheHits = "InMemoryTableScan".r.findAllIn(p).length
    assert(cacheHits >= 4,
      s"truth + 3 budget cuts must share ONE scored scan via cache, " +
        s"saw $cacheHits hits:\n$p")
    val heaps = "TakeOrderedAndProject".r.findAllIn(p).length
    assert(heaps >= 4, s"every cut is a heap, saw $heaps:\n$p")
  }

  test("q_fs_weights rides the pinned band index; q_lsh_tuning shares one signature build") {
    val pf = plan(TextOps.queries("q_fs_weights")(spark, sfDir))
    assert(pf.contains("Scan ExistingRDD"),
      s"F-S candidates must come from the session-pinned pair leaf:\n$pf")
    assert(!pf.contains("CartesianProduct"),
      s"feature/truth joins must stay equi-shaped:\n$pf")
    val pl = plan(TextOps.queries("q_lsh_tuning")(spark, sfDir))
    // The sweep's signature and shingle relations are SESSION PINS
    // (LogicalRDD leaves) — all three geometries and the verification
    // read them; nothing re-derives from parquet.
    val pins = "Scan ExistingRDD".r.findAllIn(pl).length
    assert(pins >= 2,
      s"sweep must read the pinned signature+shingle leaves, saw $pins:\n$pl")
    assert(!pl.contains("Scan parquet"),
      s"no geometry may re-derive its inputs from parquet:\n$pl")
    // (The plan's one BroadcastNestedLoopJoin is the 1-row union-truth
    // scalar attach — the allowed pattern; a cartesian would be the bug.)
    assert(!pl.contains("CartesianProduct"),
      s"candidate generation stays an inverted-index equi-join:\n$pl")
  }

  test("q_dataset_card and q_kn_bigram stay scan-bounded with no cartesian blow-up") {
    val pd = plan(graft.operators.Corpus.queries("q_dataset_card")(spark, sfDir))
    assert(!pd.contains("CartesianProduct"),
      s"1-row attaches must broadcast, never plan a cartesian:\n$pd")
    val scans = "Scan parquet".r.findAllIn(pd).length
    assert(scans <= 3,
      s"the card is base agg + prefix agg + lang rank — ≤3 corpus reads, " +
        s"saw $scans:\n$pd")
    val pk = plan(graft.operators.Corpus.qKnBigram(spark, sfDir))
    assert(!pk.contains("CartesianProduct"),
      s"KN continuation/backoff joins stay equi-shaped:\n$pk")
  }

  test("q_join_size_est never executes the join it estimates") {
    val p = plan(graft.operators.Mining.qJoinSizeEst(spark, sfDir))
    // The whole point: Σf² comes from the key histogram, so the plan
    // must contain NO join operator at all and exactly one log pass.
    assert(!p.contains("Join"),
      s"the estimated join must never be executed:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"one histogram pass over the log, saw $scans:\n$p")
  }

  test("q_neyman_alloc is one corpus aggregate; the fold side broadcasts") {
    val p = plan(graft.operators.Stats.qNeymanAlloc(spark, sfDir))
    // Both consumers of the stratum relation sit above the IDENTICAL
    // (source) agg exchange — ReuseExchange dedups the corpus pass at
    // runtime, so the tripwire pins the exchange KEY equality instead of
    // a scan count: exactly one distinct hashpartitioning expression.
    val exKeys = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1).takeWhile(_ != '#')).toSet
    assert(exKeys == Set("source"),
      s"stratum consumers must share the one source-keyed exchange, " +
        s"saw keys $exKeys:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the 1-row cross-stratum fold must broadcast back:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the scalar attach must never be a cartesian:\n$p")
  }

  test("q_quantile_merge windows per source and never sorts raw rows globally") {
    val p = plan(graft.operators.Corpus.qQuantileMerge(spark, sfDir))
    assert(!p.contains("CartesianProduct"),
      s"merge/audit joins stay bounded:\n$p")
    // The true quartiles come from the VALUE-HISTOGRAM cumsum: the only
    // relations ever globally sorted/cumsum'd are domain-sized (the
    // |sources|·Q merged summary and the |distinct n_chars| histogram),
    // so no Sort may consume a scan directly (every sort sits above an
    // aggregate that collapsed the corpus first).
    assert(!"Sort [^\\n]*\\n[^\\n]*Scan parquet".r.findFirstIn(p).isDefined,
      s"a sort consumes the raw corpus scan directly:\n$p")
  }

  test("q_tpch_q17 reads the fact through the cache on BOTH sides of the re-join") {
    val p = plan(Analytics.qTpchQ17(spark, sfDir))
    // Two InMemoryTableScans (probe side + moments side) — each renders
    // the cache's one-scan child plan inline, so counting "Scan parquet"
    // strings would double-count; the cache hits are the real claim.
    val cacheHits = "InMemoryTableScan".r.findAllIn(p).length
    assert(cacheHits >= 2,
      s"both the probe and the per-part moments must read the cached fact " +
        s"projection (saw $cacheHits InMemoryTableScans):\n$p")
  }

  test("q_kmv_partial bounds the shuffle structurally: one lang exchange over bounded buffers") {
    val p = plan(graft.operators.TextOps.queries("q_kmv_partial")(spark, sfDir))
    // The whole point of the PartialKMV pre-merge: the ONLY hash exchange
    // is the lang-keyed partial→final aggregation boundary, carrying one
    // ≤k-long buffer per (lang, partition) — no distinct shuffle, no
    // window, no rank sort over the vocabulary.
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"exactly one exchange (the partial→final boundary):\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"the typed k-min Aggregator must run as an object hash aggregate " +
        s"(partial + final stages):\n$p")
    assert(!p.contains("Window"),
      s"no rank window — the kth value comes from the bounded buffer:\n$p")
    // Both aggregate stages present: partial below the exchange, final
    // above (the map-side pre-merge is the documented k·partitions bound).
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial AND final object-hash stages:\n$p")
  }

  test("q_dtw_banded keeps q_dtw's no-shuffle pair shape (DP inside the projection)") {
    val pb = plan(graft.operators.Series.queries("q_dtw_banded")(spark, sfDir))
    val pf = plan(graft.operators.Series.queries("q_dtw")(spark, sfDir))
    // The band changes per-cell WORK (O(n·w) rows of width 2w+1), not the
    // plan: same exchanges as the full DP, pairs via broadcast, no
    // cartesian, no extra shuffle introduced by the banding.
    assert("Exchange hashpartitioning".r.findAllIn(pb).length ==
      "Exchange hashpartitioning".r.findAllIn(pf).length,
      s"banding must not add a shuffle:\nbanded:\n$pb\nfull:\n$pf")
    assert(pb.contains("BroadcastNestedLoopJoin") || pb.contains("BroadcastHashJoin"),
      s"pair join must broadcast the |types|-row side:\n$pb")
    assert(!pb.contains("CartesianProduct"), s"no cartesian:\n$pb")
  }

}
