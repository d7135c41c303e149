package graft

/** Partitioning-invariance: the engine-wide determinism CONTRACT, pinned.
  *
  * Every float-emitting query claims its result is invariant under
  * partitioning (exact decimal sums, ordered folds, pinned expression
  * chains, fixed-point integers) — the property that makes the DuckDB
  * hash gate meaningful and, at 1000 executors, makes reruns reproducible
  * at all. This suite EXECUTES that claim: each query runs under two
  * different `spark.sql.shuffle.partitions` settings (different partition
  * counts → different aggregation merge orders, different AQE decisions)
  * and the collected results must be equal to the BIT (boxed Double
  * equality — stricter than ==: NaN equals NaN, +0.0 differs from −0.0).
  *
  * The chosen queries cover every determinism mechanism in the engine:
  * decimal-backed sums (tfidf/welch/moments), ordered per-group folds
  * (bigram LM, centroid chunked folds), sequential window folds
  * (survival), single-partition ntile windows (decile lift), and pinned
  * share divisions over windowed integer totals (market share).
  */
class InvarianceSpec extends SparkSpec {

  private def collectWith(parts: Int, name: String): Seq[Seq[Any]] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      // Session pins would serve the FIRST run's edge list to the second
      // partitioning — rebuild from scratch each run so the pair-set
      // build itself is inside the invariance claim.
      Tables.clearSessionPins()
      SparkEntry.queries(name)(s, sfDir).collect().map(_.toSeq.toList).toSeq
    } finally Tables.clearSelfJoinCache()
  }

  for (q <- Seq("q_tfidf", "q_welch", "q_survival", "q_moments",
      "q_market_share", "q_bigram_lm", "q_decile_lift", "q_centroid",
      // Round-7 additions: the rank-integer z chain and the two
      // ulp-tripwired quantized-trig queries.
      "q_mann_whitney", "q_geo_distance", "q_geo_join",
      // Round-8 additions, one per new mechanism: midrank BIGINT moments
      // (spearman), ordered group folds of double terms (anova), the
      // quantized-ln contract (js_div), the dyadic sequential fold
      // (holt), lower-median row picks (theil_sen), the z-ordered
      // 1/ln(deg) wedge folds (adamic_adar), and the per-doc tfidf rank
      // windows (keywords).
      "q_spearman", "q_anova", "q_js_div", "q_holt", "q_theil_sen",
      "q_adamic_adar", "q_keywords",
      // Round-11: the two-stage rerank's pinned VecDot cosine chains, the
      // budget curve's cached cuts, and the cross-split leakage cosines.
      "q_ann_rerank", "q_rerank_budget", "q_semantic_leakage",
      // Round-12: the bounded k-min typed Aggregator — different
      // partition counts mean different pre-merge groupings and merge
      // orders, exactly what its set-function claim must survive.
      "q_kmv_partial"))
    test(s"$q is bit-identical under shuffle.partitions 2 vs 7") {
      val a = collectWith(2, q)
      val b = collectWith(7, q)
      assert(a.nonEmpty)
      assert(a == b,
        s"$q result depends on partitioning — the determinism contract is broken")
    }

  test("pinForSession: a mutated fixture under the same path is explicitly " +
      "unsupported (pin serves the first materialization, by contract)") {
    // Tables.pinForSession keys by canonicalized PLAN, not by a data
    // fingerprint — valid because the driver's fixtures are immutable for
    // the session (the documented contract on the method). This test PINS
    // that contract's failure mode so it can never be silent: if someone
    // mutates a fixture dir mid-session, the pin keeps serving the rows
    // it materialized first. If this test ever fails, Spark's relation
    // canonicalization changed and the pin-keying strategy (and this
    // contract) must be re-validated.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pin_contract")
      .toString
    Tables.clearSessionPins()
    try {
      Seq(1L, 2L, 3L).toDF("v").write.mode("overwrite").parquet(dir)
      def plan = spark.read.parquet(dir)
        .groupBy().agg(org.apache.spark.sql.functions.sum("v").as("s"))
      assert(Tables.pinForSession(plan).collect().head.getLong(0) == 6L)
      Seq(10L, 20L).toDF("v").write.mode("overwrite").parquet(dir)
      val second = Tables.pinForSession(plan).collect().head.getLong(0)
      assert(second == 6L,
        s"pin rebuilt against the mutated fixture (got $second) — plan " +
          "canonicalization no longer dedups re-reads of one path; " +
          "re-validate Tables.pinForSession's keying and contract")
    } finally Tables.clearSessionPins()
  }
}
