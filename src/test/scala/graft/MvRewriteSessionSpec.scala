package graft

/** Round-18 review pins for the MV rewrite's two session-level hazards:
  * the rule must fire in a session configured ONLY with
  * `spark.sql.extensions=graft.GraftExtensions` (the library's
  * documented contract — extension optimizer rules run before V2 scan
  * planning, so the match accepts pre-pushdown relations), and a
  * VERSION AS OF scan must never be answered from current gold data.
  */
class MvRewriteSessionSpec extends SparkSpec {
  test("extensions-only session fires the rewrite; time-travel scans never rewrite") {
    graft.operators.RowLevelOps.ensureCatalog(spark)
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val src = s"graft_cow.spec.place_src_$sfx"
    val mv = s"graft_cow.spec.place_mv_$sfx"
    spark.sql(s"CREATE TABLE $src (doc_id BIGINT, source STRING, score BIGINT) " +
      "TBLPROPERTIES ('graft.mode'='mor')")
    spark.sql(s"CREATE TABLE $mv (source STRING, n BIGINT, sum_score BIGINT, " +
      "mv_version BIGINT)")
    spark.sql(s"INSERT INTO $src VALUES (1, 'a', 10), (2, 'b', 20)")
    spark.sql(s"INSERT INTO $mv VALUES ('a', 1, 10, 1), ('b', 1, 20, 1)")
    spark.sql(s"CALL graft_cow.register_mv('${src.stripPrefix("graft_cow.")}', " +
      s"'${mv.stripPrefix("graft_cow.")}', 'source', 'n', 'score', 'sum_score')")
    try {
      // A FRESH session derived from the same conf: the extension chain
      // applies, but nothing called GraftExtensions.register — no
      // experimental.extraOptimizations. The rewrite must still fire.
      val s2 = spark.newSession()
      graft.operators.RowLevelOps.ensureCatalog(s2)
      assert(s2.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .experimental.extraOptimizations.isEmpty,
        "the probe needs a session with NO experimental registrations")
      def agg(session: org.apache.spark.sql.SparkSession, from: String) =
        session.sql(s"SELECT source, count(*) AS n, sum(score) AS sum_score " +
          s"FROM $from GROUP BY source ORDER BY source")
      val p = agg(s2, src).queryExecution.optimizedPlan.toString
      assert(!p.contains("Aggregate") && p.contains(mv.split("\\.").last),
        s"the extensions-only session must substitute the gold scan:\n$p")
      assert(agg(s2, src).collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSeq == Seq(("a", 1L, 10L), ("b", 1L, 20L)))
      // TIME TRAVEL: the pinned scan keeps the same catalog/identifier
      // but must NEVER be served from the (current) gold table.
      val tt = agg(spark, s"$src VERSION AS OF 1")
      assert(tt.queryExecution.optimizedPlan.toString.contains("Aggregate"),
        "a version-pinned scan must never rewrite to the MV")
      assert(tt.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSeq == Seq(("a", 1L, 10L), ("b", 1L, 20L)))
    } finally graft.plans.MvRegistry.deregister("graft_cow",
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("spec"), src.split("\\.").last))
  }

  test("register_mv survives exotic identifiers (backtick-requoted on interpolation)") {
    // Round-19 ADVICE low item, closed in round 20 with this spec: the
    // procedure re-quotes every identifier it interpolates into its
    // verification statements (table names via parseMultipartIdentifier +
    // backtick-quoted parts, column names via q()). A table or column
    // name needing backticks must neither break the verification SQL nor
    // resolve somewhere else.
    graft.operators.RowLevelOps.ensureCatalog(spark)
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val src = s"graft_cow.spec.`exotic src-$sfx`"
    val mv = s"graft_cow.spec.`exotic mv-$sfx`"
    // Hyphenated names: illegal bare in SQL (backticks required everywhere
    // they are interpolated) while staying within parquet's MessageType
    // token syntax — the cow writer's schema round-trip cannot carry
    // SPACES in column names (parquet parser limitation, pre-existing).
    spark.sql(s"CREATE TABLE $src (doc_id BIGINT, `group-col` STRING, " +
      "`sum-col` BIGINT) TBLPROPERTIES ('graft.mode'='mor')")
    spark.sql(s"CREATE TABLE $mv (`group-col` STRING, `count-col` BIGINT, " +
      "`mv-sum` BIGINT)")
    spark.sql(s"INSERT INTO $src VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 5)")
    spark.sql(s"INSERT INTO $mv VALUES ('a', 2, 15), ('b', 1, 20)")
    try {
      // Column args are RAW names (the procedure quotes them itself).
      val applied = spark.sql(
        s"CALL graft_cow.register_mv('spec.`exotic src-$sfx`', " +
          s"'spec.`exotic mv-$sfx`', 'group-col', 'count-col', " +
          "'sum-col', 'mv-sum')").collect()
      assert(applied.length == 1 && applied.head.getLong(0) >= 1,
        "verified registration must return the applied source version")
      // The rewrite must actually fire for the exotic grain column.
      val agg = spark.sql(s"SELECT `group-col`, count(*) AS n, " +
        s"sum(`sum-col`) AS s FROM $src GROUP BY `group-col` ORDER BY `group-col`")
      val plan = agg.queryExecution.optimizedPlan.toString
      assert(plan.contains(s"exotic mv-$sfx") && !plan.contains("Aggregate"),
        s"rewrite must substitute the exotic-named MV:\n$plan")
      assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq == Seq(("a", 2L, 15L), ("b", 1L, 20L)))
    } finally graft.plans.MvRegistry.deregister("graft_cow",
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("spec"), s"exotic src-$sfx"))
  }
}
