package graft.operators

import java.util.UUID

import graft.sources.CowCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL row-level operations — `MERGE INTO`, `UPDATE`, `DELETE` — running
  * against the [[graft.sources.CowCatalog]] copy-on-write parquet catalog
  * through Catalyst's group-based rewrite (`RewriteMergeIntoTable` /
  * `RewriteUpdateTable` / `RewriteDeleteFromTable` → `MergeRows` /
  * `ReplaceData`). This is the user-facing write-side API that supersedes
  * the hand-rolled CDC folds (`q_scd2_apply`, `q_stream_cdc_apply`): the
  * user writes the standard SQL, the engine plans the join + rewrite.
  *
  * Every query builds a FRESH table (UUID-suffixed name) from the
  * documents fixture, applies the row-level SQL, and returns the final
  * table state ordered by key; the DuckDB oracle computes the same final
  * state declaratively from base+changes, so the check pins that
  * engine-MERGE == relational rebuild (the `q_scd2_apply` discipline).
  *
  * Scale shape: the MERGE source join is a plain equi-join on the key
  * (planner picks broadcast vs shuffle from stats); the rewrite reads the
  * affected groups once and writes their replacements once — O(affected
  * groups) I/O, the copy-on-write trade. Groups are FILES: Catalyst's
  * runtime group filter narrows the rewrite to files containing matches
  * (CowCatalogSpec pins a 4-file table where a one-range MERGE rewrites
  * exactly one file), so a sparse MERGE against a huge table touches only
  * its hot files; the remaining lever (`SupportsDelta` merge-on-read) is
  * noted in [[graft.sources.CowCatalog]]'s scaladoc.
  */
object RowLevelOps {
  private val CatalogName = "graft_cow"

  private[graft] def ensureCatalog(spark: SparkSession): Unit =
    if (spark.conf.getOption(s"spark.sql.catalog.$CatalogName").isEmpty)
      spark.conf.set(s"spark.sql.catalog.$CatalogName",
        classOf[CowCatalog].getName)

  /** Base relation: documents with `doc_id % 3 <> 0` as (doc_id, source,
    * score = n_chars) — the third that's missing makes NOT MATCHED
    * branches provably fire at any fixture size. `mor = true` creates the
    * table MERGE-ON-READ (`TBLPROPERTIES ('graft.mode' = 'mor')`): same
    * SQL surface, delta-based writes.
    */
  private def freshBaseTable(spark: SparkSession, d: String, tag: String,
                             mor: Boolean = false,
                             eqKey: Option[String] = None): String = {
    ensureCatalog(spark)
    // UUID-suffixed: Bench runs every query twice and test suites share
    // the JVM-global store — each invocation is fully self-contained.
    val tbl = s"$CatalogName.ops.${tag}_${UUID.randomUUID().toString.replace("-", "")}"
    val props = (if (mor) Seq("'graft.mode' = 'mor'") else Seq.empty) ++
      eqKey.map(c => s"'graft.delete-key' = '$c'")
    val propsSql =
      if (props.isEmpty) "" else props.mkString(" TBLPROPERTIES (", ", ", ")")
    // The delete-key column is the row identity — declared NOT NULL
    // (Catalyst refuses nullable row-id attributes).
    val docIdDecl =
      if (eqKey.contains("doc_id")) "doc_id BIGINT NOT NULL"
      else "doc_id BIGINT"
    spark.sql(
      s"CREATE TABLE $tbl ($docIdDecl, source STRING, score BIGINT)$propsSql")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    tbl
  }

  private def finalState(spark: SparkSession, tbl: String): DataFrame =
    spark.sql(s"SELECT doc_id, source, score FROM $tbl ORDER BY doc_id")

  /** q_merge_into — three-branch `MERGE INTO` (conditional DELETE, UPDATE,
    * INSERT) with first-matching-clause-wins semantics: changes are the
    * even doc_ids rescored to n_chars + 1000; multiples of 6 are absent
    * from the base (NOT MATCHED → INSERT), matched rows whose new score
    * is a multiple of 5 are DELETEd, the rest UPDATEd.
    */
  def qMergeInto(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "merge")
    spark.sql(
      s"""MERGE INTO $tbl t
         |USING (SELECT doc_id, source, n_chars + 1000 AS new_score
         |       FROM parquet.`$d/documents.parquet`
         |       WHERE doc_id % 2 = 0) s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED AND s.new_score % 5 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET score = s.new_score
         |WHEN NOT MATCHED THEN
         |  INSERT (doc_id, source, score) VALUES (s.doc_id, s.source, s.new_score)
         |""".stripMargin)
    finalState(spark, tbl)
  }

  /** q_merge_into_mor — the IDENTICAL three-branch MERGE as
    * [[qMergeInto]], against a MERGE-ON-READ table
    * (`TBLPROPERTIES ('graft.mode' = 'mor')`): Catalyst plans a
    * `WriteDelta` instead of `ReplaceData`, so matched DELETEs/UPDATEs
    * commit O(changed rows) positional-delete entries + one insert file
    * rather than rewriting every touched file — the write-amplification
    * fix for hot-row workloads (see [[graft.sources.CowCatalog]]). Same
    * oracle as q_merge_into: strategy must be invisible to results.
    */
  def qMergeIntoMor(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "mergemor", mor = true)
    spark.sql(
      s"""MERGE INTO $tbl t
         |USING (SELECT doc_id, source, n_chars + 1000 AS new_score
         |       FROM parquet.`$d/documents.parquet`
         |       WHERE doc_id % 2 = 0) s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED AND s.new_score % 5 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET score = s.new_score
         |WHEN NOT MATCHED THEN
         |  INSERT (doc_id, source, score) VALUES (s.doc_id, s.source, s.new_score)
         |""".stripMargin)
    finalState(spark, tbl)
  }

  /** q_merge_into_eq — the MERGE scenario through EQUALITY DELETES
    * (`TBLPROPERTIES ('graft.mode'='mor', 'graft.delete-key'='doc_id')`,
    * Iceberg equality-delete files in miniature — the round-15 verdict's
    * #4): the row id IS the key column, so matched UPDATE/DELETE commit
    * O(keys) equality-delete entries — no positions located, no data
    * files read at commit — and readers drop matching rows from files
    * that PREDATE each entry (write-time sequence numbers keep the
    * upsert's own inserts alive). Same oracle as q_merge_into /
    * q_merge_into_mor: the delete STRATEGY must be invisible to
    * results. CowCatalogSpec pins the zero-scan keyed DELETE plan,
    * sequencing, folding via optimize, durability, and the loud
    * streaming/CDF refusals.
    */
  def qMergeIntoEq(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "mergeeq", mor = true,
      eqKey = Some("doc_id"))
    spark.sql(
      s"""MERGE INTO $tbl t
         |USING (SELECT doc_id, source, n_chars + 1000 AS new_score
         |       FROM parquet.`$d/documents.parquet`
         |       WHERE doc_id % 2 = 0) s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED AND s.new_score % 5 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET score = s.new_score
         |WHEN NOT MATCHED THEN
         |  INSERT (doc_id, source, score) VALUES (s.doc_id, s.source, s.new_score)
         |""".stripMargin)
    finalState(spark, tbl)
  }

  /** q_cow_expire — TIME-based retention
    * (`CALL graft_cow.expire_snapshots(table, older_than_us)` —
    * Iceberg's expire_snapshots, the scheduler-friendly twin of
    * count-based VACUUM): versions committed at or before the cutoff
    * are dropped with the files only they reference, while TAGS, branch
    * heads and the current version survive ANY cutoff. The scripted
    * lineage tags v1, rewrites twice, then expires with a
    * far-future cutoff — v0 and the middle rewrite die, the tagged v1
    * and current v3 survive, and the CURRENT relation is untouched
    * (the oracle). CowCatalogSpec pins the report, the protections and
    * the loud time travel past the horizon.
    */
  def qCowExpire(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"exp_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
         |FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(s"CALL $CatalogName.tag('ops.$name', 'blessed', 1L)")
    spark.sql(s"UPDATE $tbl SET score = score + 1000 WHERE doc_id % 2 = 0")
    spark.sql(s"UPDATE $tbl SET score = score * 2 WHERE doc_id % 5 = 0")
    spark.sql(s"CALL $CatalogName.expire_snapshots('ops.$name', " +
      s"${System.currentTimeMillis() * 1000L + 3600L * 1000000L}L)")
    finalState(spark, tbl)
  }

  /** q_cow_eqdeletes — `SELECT … FROM <table>.eqdeletes`: the LIVE
    * equality-delete entries as a metadata relation (round 18's parquet
    * delete-file representation made observable): per entry its commit
    * version, key count and long-key range, driver-computed from the
    * snapshot at metadata cost — `sum(key_count)` is the
    * churn-waiting-for-optimize number a lakehouse dashboard alerts on.
    * Scripted flow: keyed base, two disjoint keyed DELETEs; the oracle
    * states both entries' counts and ranges declaratively (the
    * delete-file path is run-scoped and stays out of the projection).
    */
  def qCowEqDeletes(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "eqmeta", mor = true,
      eqKey = Some("doc_id"))                             // v0 + v1
    spark.sql(s"DELETE FROM $tbl WHERE doc_id % 7 = 3")   // v2: entry 1
    spark.sql(                                            // v3: entry 2
      s"DELETE FROM $tbl WHERE doc_id % 5 = 1 AND doc_id % 7 <> 3")
    spark.sql(
      s"""SELECT version, key_count, key_min, key_max
         |FROM $tbl.eqdeletes ORDER BY version""".stripMargin)
  }

  /** q_cow_refs — `SELECT … FROM <table>.refs` (Iceberg's refs metadata
    * table): every named pointer into the version history — main, each
    * branch, each tag — as one relation with its version, at metadata
    * cost. The scripted lineage forks a branch and pins a tag; the
    * oracle states the three pointers literally.
    */
  def qCowRefs(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"refs_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, score BIGINT)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 2 = 0""".stripMargin)
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 2 = 1""".stripMargin)
    spark.sql(s"CALL $CatalogName.tag('ops.$name', 'blessed', 1L)")
    spark.sql(s"CALL $CatalogName.branch('ops.$name', 'wip')")
    spark.sql(s"INSERT INTO $tbl.branch_wip VALUES (100000L, 7L)")
    spark.sql(
      s"""SELECT name, type, version FROM $tbl.refs
         |ORDER BY type, name""".stripMargin)
  }

  /** q_cow_colstats — `SELECT … FROM <table>.colstats` (the CBO
    * column-statistics feed AS A RELATION — E360's planner numbers made
    * operator-visible): per column, the merged-KMV distinct-count
    * estimate (EXACT below k=32 — `exact` says which), the total null
    * count, and long [min, max], all from manifests with zero data
    * files opened. The fixture's domains all sit under k, so the oracle
    * states the EXACT SQL aggregates — the sketch path must agree to
    * the row. CowCatalogSpec's CBO test pins the estimator's envelope
    * above k and the broadcast flip the same numbers drive.
    */
  def qCowColstats(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"cstat_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id % 20, source,
         |       CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars % 25 END
         |FROM parquet.`$d/documents.parquet`""".stripMargin)
    spark.sql(
      s"""SELECT column, ndv, exact, null_count, min_long, max_long
         |FROM $tbl.colstats ORDER BY column""".stripMargin)
  }

  /** q_cow_vacuum — RETENTION as a SQL maintenance verb:
    * `CALL graft_cow.vacuum(table, retain)` (the DSv2 `ProcedureCatalog`
    * surface) keeps the newest `retain` versions and deletes data files +
    * manifests referenced only by older ones. The scripted lineage is
    * create (v0) → single-file insert (v1) → UPDATE (v2) → UPDATE (v3);
    * vacuum retain 2 drops v0–v2's exclusive files (v1's original file
    * was replaced in v2 — it dies; v2's rewrite survives only if v3 kept
    * it). The query returns the final table state — vacuum must be
    * invisible to the CURRENT version (CowCatalogSpec pins the file
    * deletion, the loud time-travel error past the horizon, and
    * post-vacuum recovery from the pruned log).
    */
  def qCowVacuum(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"vac_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
         |FROM parquet.`$d/documents.parquet` WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(s"UPDATE $tbl SET score = score * 2 + 1 WHERE doc_id % 7 = 0")
    spark.sql(s"UPDATE $tbl SET score = score + 5 WHERE doc_id % 5 = 0")
    spark.sql(s"CALL $CatalogName.vacuum('ops.$name', 2)")
    finalState(spark, tbl)
  }

  /** q_cow_evolve — `ALTER TABLE … ADD COLUMN` schema evolution (the
    * writable twin of E110 q_schema_merge): the column is a METADATA
    * commit (same files, extended schema — no rewrite); files written
    * BEFORE the evolution read NULL for it (each file's write-time stats
    * record the column set it carries), files written after carry real
    * values. `VERSION AS OF` a pre-evolution commit reads the OLD schema
    * (snapshots pin schema, not just files — spec-pinned).
    */
  def qCowEvolve(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.evolve_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 1""".stripMargin)
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN bonus BIGINT")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars, n_chars + 7
         |FROM parquet.`$d/documents.parquet` WHERE doc_id % 3 = 2""".stripMargin)
    spark.sql(
      s"SELECT doc_id, source, score, bonus FROM $tbl ORDER BY doc_id")
  }

  /** q_cow_default — `ALTER TABLE … ADD COLUMN … DEFAULT <literal>`
    * (round-19 brief #4; Iceberg initial-default semantics, the one
    * schema-evolution verb a migrating user hit a refusal on): the ADD
    * stays a METADATA commit — same files, no rewrite — but files
    * written BEFORE the evolution now serve the declared literal
    * instead of NULL (the default is keyed by the new FIELD ID in the
    * snapshot; a post-ADD file that physically holds the column serves
    * its values, including genuine NULLs). New INSERTs that OMIT the
    * column are filled by the analyzer from the stamped
    * CURRENT_DEFAULT metadata — both halves of the Iceberg/Delta
    * initial/write-default contract. Time travel to a pre-ADD commit
    * reads the old shape (snapshots pin schema AND defaults).
    */
  def qCowDefault(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.default_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 1""".stripMargin)
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN tier BIGINT DEFAULT 7")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN label STRING DEFAULT 'base'")
    // Post-ADD writes with explicit values…
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars, n_chars % 5, 'fresh'
         |FROM parquet.`$d/documents.parquet` WHERE doc_id % 3 = 2""".stripMargin)
    // …and a column-list INSERT omitting the defaulted columns: the
    // analyzer fills them from CURRENT_DEFAULT — materialized 7/'base'.
    spark.sql(
      s"""INSERT INTO $tbl (doc_id, source, score)
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 0 AND doc_id % 2 = 0""".stripMargin)
    spark.sql(
      s"SELECT doc_id, source, score, tier, label FROM $tbl ORDER BY doc_id")
  }

  /** q_cow_txn — ATOMIC MULTI-TABLE COMMIT (round-19 brief #5,
    * [[graft.sources.CowStore.transact]]): each ingest wave stages its
    * fact files AND the recomputed gold aggregate, then publishes both
    * under ONE store lock — readers (who resolve state through the
    * same lock) can never observe the fact batch without its gold
    * update, the fact-ahead-of-gold race direct gold readers pay when
    * the two land as separate commits. Validation is all-or-nothing:
    * the query also drives a transact whose second commit CONFLICTS
    * (replaces a file a concurrent commit already replaced) and pins
    * that the first table's version did NOT advance. The returned gold
    * contents equal the declarative aggregate of everything the fact
    * table holds — atomicity must be invisible to the numbers.
    */
  def qCowTxn(spark: SparkSession, d: String): DataFrame = {
    import graft.sources.CowStore
    ensureCatalog(spark)
    val sfx = UUID.randomUUID().toString.replace("-", "")
    val fact = s"$CatalogName.ops.txn_fact_$sfx"
    val gold = s"$CatalogName.ops.txn_gold_$sfx"
    spark.sql(s"CREATE TABLE $fact (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(s"CREATE TABLE $gold (source STRING, n BIGINT, sum_score BIGINT)")
    def identOf(t: String) = {
      val p = t.split("\\.").drop(1)
      org.apache.spark.sql.connector.catalog.Identifier.of(p.init, p.last)
    }
    val (factId, goldId) = (identOf(fact), identOf(gold))
    // Two ingest waves; each lands fact-append + gold-replace as ONE
    // atomic publication.
    for (parity <- Seq(0, 1)) {
      val wave = spark.read.parquet(s"$d/documents.parquet")
        .where(s"doc_id % 3 <> 0 AND doc_id % 2 = $parity")
        .selectExpr("doc_id", "source", "n_chars AS score")
      val (ff, fstats) = CowStore.stageWrite(CatalogName, factId, wave)
      val newGold = spark.table(fact).unionByName(wave)
        .groupBy("source")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("score").as("sum_score"))
      val (gf, gstats) = CowStore.stageWrite(CatalogName, goldId, newGold)
      val goldCurrent = CowStore.get(CatalogName, goldId).get.files.toSet
      CowStore.transact(Seq(
        CowStore.TxCommit(CatalogName, factId, ff, fstats),
        CowStore.TxCommit(CatalogName, goldId, gf, gstats,
          remove = Some(goldCurrent))))
      // Between waves the invariant holds: gold IS the fact aggregate.
      val (fSum, gSum) = (
        spark.sql(s"SELECT COALESCE(sum(score), 0) FROM $fact").head.getLong(0),
        spark.sql(s"SELECT COALESCE(sum(sum_score), 0) FROM $gold").head.getLong(0))
      require(fSum == gSum, s"fact/gold diverged after a transact: $fSum vs $gSum")
    }
    // ALL-OR-NOTHING pin: a transact whose SECOND commit conflicts
    // (removes an already-replaced file) must leave the FIRST table's
    // version untouched.
    val factV = CowStore.get(CatalogName, factId).get.version
    try {
      CowStore.transact(Seq(
        CowStore.TxCommit(CatalogName, factId),
        CowStore.TxCommit(CatalogName, goldId,
          remove = Some(Set("no-such-file.parquet")))))
      require(false, "a conflicting transact must throw")
    } catch {
      case _: java.util.ConcurrentModificationException => () // expected
    }
    require(CowStore.get(CatalogName, factId).get.version == factV,
      "a refused transact must publish NOTHING — fact version moved")
    spark.sql(s"SELECT source, n, sum_score FROM $gold ORDER BY source")
  }

  /** q_cow_tag — NAMED TAGS over the version history (Iceberg refs in
    * miniature): `CALL graft_cow.tag(table, 'baseline', v)` pins commit v
    * under a stable name; `VERSION AS OF 'baseline'` reads it — the
    * release/reproducibility workflow (tag the blessed training
    * snapshot, keep mutating, re-read the tag forever; tags also protect
    * their versions from VACUUM, spec-pinned). The query tags the
    * pristine insert, UPDATEs, and joins CURRENT against the tag —
    * q_time_travel's audit with the version number replaced by a name.
    */
  def qCowTag(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "tagq")
    val name = tbl.split("\\.").last
    spark.sql(s"CALL $CatalogName.tag('ops.$name', 'baseline', 1)")
    spark.sql(s"UPDATE $tbl SET score = score + 500 WHERE doc_id % 4 = 0")
    spark.sql(
      s"""SELECT c.doc_id, b.score AS score_tagged, c.score AS score_now
         |FROM $tbl c
         |JOIN (SELECT doc_id, score FROM $tbl VERSION AS OF 'baseline') b
         |  ON c.doc_id = b.doc_id
         |ORDER BY c.doc_id""".stripMargin)
  }

  /** q_time_travel_ts — `TIMESTAMP AS OF` time travel (E311's second
    * axis): every commit stamps its wall clock (µs) into the commit log,
    * and a timestamp resolves to the newest version committed at or
    * before it — "the table as of last night's run", the travel form
    * schedulers and debuggers actually use (they know WHEN, not which
    * version number). The query captures a wall-clock instant strictly
    * between the insert and the update (busy-waiting one clock tick so
    * the update's stamp is provably later), then joins CURRENT against
    * `TIMESTAMP AS OF <captured>` — which must resolve to the insert.
    * The RESULT is deterministic (same shape as q_time_travel) even
    * though the timestamps are not; boundary/error behavior is
    * spec-pinned.
    */
  def qTimeTravelTs(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "ttts")
    // Strictly after the insert commit's stamp, strictly before the
    // update's: stamps are wall-clock ms (scaled to µs), so waiting for
    // the millisecond to tick over guarantees both inequalities.
    val t0 = System.currentTimeMillis()
    while (System.currentTimeMillis() <= t0) Thread.`yield`()
    // Epoch-based expression, not a timestamp string: a string literal
    // parses in the SESSION timezone while Timestamp.toString renders in
    // the JVM default — timestamp_micros sidesteps both.
    val cutUs = System.currentTimeMillis() * 1000L
    val t1 = System.currentTimeMillis()
    while (System.currentTimeMillis() <= t1) Thread.`yield`()
    spark.sql(s"UPDATE $tbl SET score = score + 900 WHERE doc_id % 6 = 0")
    spark.sql(
      s"""SELECT c.doc_id, b.score AS score_then, c.score AS score_now
         |FROM $tbl c
         |JOIN (SELECT doc_id, score FROM $tbl
         |      TIMESTAMP AS OF timestamp_micros(${cutUs}L)) b
         |  ON c.doc_id = b.doc_id
         |ORDER BY c.doc_id""".stripMargin)
  }

  /** q_update_where — SQL `UPDATE … WHERE` through the same group-based
    * rewrite (update = replace group with carried + reassigned rows).
    */
  def qUpdateWhere(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "upd")
    spark.sql(s"UPDATE $tbl SET score = score * 2 + 1 WHERE doc_id % 7 = 0")
    finalState(spark, tbl)
  }

  /** q_delete_where — SQL `DELETE … WHERE` (no metadata-delete shortcut:
    * the predicate touches data, so the group rewrite carries survivors).
    */
  def qDeleteWhere(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "del")
    spark.sql(s"DELETE FROM $tbl WHERE score % 4 < 2")
    finalState(spark, tbl)
  }

  /** q_time_travel — `VERSION AS OF` reads on the COW catalog: because
    * commits swap a version pointer and never delete superseded files,
    * every commit's file list stays readable. The query UPDATEs the base
    * table (commit 2) and joins the CURRENT state against `VERSION AS OF
    * 1` (the insert commit) — the audit/debug/reproducibility read every
    * lakehouse exposes, here proving both that the old snapshot is
    * intact post-rewrite and that exactly the predicate's rows changed.
    */
  def qTimeTravel(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "tt")
    spark.sql(s"UPDATE $tbl SET score = score + 1000 WHERE doc_id % 5 = 0")
    spark.sql(
      s"""SELECT c.doc_id, b.score AS score_v1, c.score AS score_now,
         |       c.score <> b.score AS changed
         |FROM $tbl c
         |JOIN (SELECT doc_id, score FROM $tbl VERSION AS OF 1) b
         |  ON c.doc_id = b.doc_id
         |ORDER BY c.doc_id""".stripMargin)
  }

  /** q_cow_compact — small-files MAINTENANCE on the COW catalog (the
    * lakehouse compaction job, E-q_compact's discipline on the writable
    * table): four fragment inserts build a 4-file table, then one
    * self-`INSERT OVERWRITE` (scan snapshots the old file list at plan
    * time; the truncate-write commits a new one — reading and replacing
    * the same table is safe exactly because commits swap pointers and
    * never delete read snapshots) rewrites the content into a single
    * file. Content is provably unchanged (the oracle is the plain base
    * relation); the file-count collapse is pinned in CowCatalogSpec.
    */
  def qCowCompact(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.compact_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    for (m <- 0 until 4)
      spark.sql(
        s"""INSERT INTO $tbl
           |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
           |FROM parquet.`$d/documents.parquet`
           |WHERE doc_id % 3 <> 0 AND doc_id % 4 = $m""".stripMargin)
    spark.sql(
      s"INSERT OVERWRITE $tbl SELECT /*+ COALESCE(1) */ * FROM $tbl")
    finalState(spark, tbl)
  }

  /** q_cow_skipping — PLAN-TIME FILE SKIPPING from write-time statistics
    * (the Iceberg-manifest miniature): four disjoint doc_id-range
    * fragments are written as one file each (every writer records its
    * per-long-column [min, max] in the commit), then a range predicate
    * touching one fragment prunes the other three files BEFORE any I/O —
    * the scan description shows `1 of 4 files, 3 skipped`, pinned in
    * CowCatalogSpec. Skipping is pruning-only: every pushed filter is
    * also kept as a residual Spark evaluates, so stats can only save
    * I/O, never change answers. The same stats make the table a SIZED
    * relation (`SupportsReportStatistics`), so small COW tables broadcast.
    */
  def qCowSkipping(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.skip_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    val n = spark.read.parquet(s"$d/documents.parquet").count()
    for (q <- 0 until 4)
      spark.sql(
        s"""INSERT INTO $tbl
           |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
           |FROM parquet.`$d/documents.parquet`
           |WHERE doc_id % 3 <> 0
           |  AND doc_id >= ${q * n / 4} AND doc_id < ${(q + 1) * n / 4}
           |""".stripMargin)
    spark.sql(
      s"""SELECT doc_id, source, score FROM $tbl
         |WHERE doc_id >= ${n / 2} AND doc_id < ${n / 2 + n / 8}
         |ORDER BY doc_id""".stripMargin)
  }

  /** q_cow_cluster — CLUSTERED compaction: the maintenance job that makes
    * file statistics SELECTIVE. The table is first built hash-fragmented
    * (four `doc_id % 4` inserts — every file spans the full key range, so
    * a range predicate's min/max check keeps all four files: stats exist
    * but prune nothing). One self-`INSERT OVERWRITE … REPARTITION_BY_RANGE
    * (4, doc_id)` rewrites the same rows into four RANGE-DISJOINT files —
    * after which the same predicate skips three of them. This is why
    * lakehouse compaction clusters rather than merely concatenates:
    * Z-order/sort-cluster layout (E86's lesson) applied to the writable
    * table, with the before/after skip counts pinned in CowCatalogSpec.
    */
  def qCowCluster(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.cluster_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    for (m <- 0 until 4) // hash fragments: each spans the full key range
      spark.sql(
        s"""INSERT INTO $tbl
           |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
           |FROM parquet.`$d/documents.parquet`
           |WHERE doc_id % 3 <> 0 AND doc_id % 4 = $m""".stripMargin)
    spark.sql(
      s"""INSERT OVERWRITE $tbl
         |SELECT /*+ REPARTITION_BY_RANGE(4, doc_id) */ doc_id, source, score
         |FROM $tbl""".stripMargin)
    val n = spark.read.parquet(s"$d/documents.parquet").count()
    spark.sql(
      s"""SELECT doc_id, source, score FROM $tbl
         |WHERE doc_id >= ${n / 2} AND doc_id < ${n / 2 + n / 8}
         |ORDER BY doc_id""".stripMargin)
  }

  /** q_cow_history — the table's COMMIT HISTORY as a queryable relation
    * (Delta's `DESCRIBE HISTORY` in miniature, and the natural companion
    * of E311's `VERSION AS OF`): every commit's version and ROW COUNT,
    * computed from the store's version → file-list history joined to the
    * write-time per-file stats (E314) — metadata only, no data files
    * opened. The scripted lineage is create (v0, empty) → single-file
    * insert (v1) → UPDATE (v2, same cardinality) → DELETE (v3, shrunk),
    * so the history readout doubles as an audit that row-level commits
    * changed exactly the cardinality they claimed. File counts are
    * deliberately NOT in the output: rewrite task counts depend on
    * session partitioning (the spec pins them instead, under a fixed
    * config).
    */
  def qCowHistory(spark: SparkSession, d: String): DataFrame = {
    val tbl = s"$CatalogName.ops.hist_${UUID.randomUUID().toString.replace("-", "")}"
    ensureCatalog(spark)
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
         |FROM parquet.`$d/documents.parquet` WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(s"UPDATE $tbl SET score = score * 2 + 1 WHERE doc_id % 7 = 0")
    spark.sql(s"DELETE FROM $tbl WHERE score % 4 < 2")
    // Since round 14 the commit log is ALSO a SQL relation
    // (`<table>.history`, the Delta DESCRIBE HISTORY shape served by
    // [[graft.sources.CowHistoryTable]]): version-exact row counts from
    // write-time metadata — no data files opened, no store API needed.
    spark.sql(
      s"SELECT version, n_rows FROM $tbl.history ORDER BY version")
  }

  /** q_cow_files — the MANIFEST as a relation (`SELECT … FROM
    * <table>.files`, Iceberg's files metadata table in miniature): one
    * row per data file carrying the write-time statistics that power
    * E314's plan-time skipping (row counts, per-long-column [min, max]).
    * Four disjoint doc_id-range fragments are written one file each, so
    * the relation's (n_rows, ranges) per file equal the per-quartile
    * aggregates the oracle computes declaratively — the check that the
    * skipping metadata is EXACT, not merely conservative. Zero data
    * files opened: the rows come from store metadata.
    */
  def qCowFiles(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.files_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    val n = spark.read.parquet(s"$d/documents.parquet").count()
    // The last fragment is UNBOUNDED above, mirroring the oracle's ELSE
    // bucket: both sides must partition the same doc_id domain even when
    // ids are not dense in [0, n) (round-14 ADVICE).
    for (q <- 0 until 4) {
      val hi = if (q == 3) "" else s" AND doc_id < ${(q + 1) * n / 4}"
      spark.sql(
        s"""INSERT INTO $tbl
           |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
           |FROM parquet.`$d/documents.parquet`
           |WHERE doc_id % 3 <> 0
           |  AND doc_id >= ${q * n / 4}$hi
           |""".stripMargin)
    }
    spark.sql(
      s"""SELECT n_rows, min_doc_id, max_doc_id, min_score, max_score
         |FROM $tbl.files ORDER BY min_doc_id""".stripMargin)
  }

  /** q_cow_ctas — ATOMIC `CREATE TABLE … AS SELECT` then `REPLACE TABLE
    * … AS SELECT` through the `StagingTableCatalog` surface: the CTAS
    * table is invisible until its single staged commit, and the RTAS
    * swaps content + schema as ONE new version on the existing history
    * (the pre-replace snapshot stays time-travelable — spec-pinned).
    * The oracle is the replace query's relation: whatever the staging
    * machinery does, the final state must equal the declared SELECT.
    */
  def qCowCtas(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.ctas_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(
      s"""CREATE TABLE $tbl AS
         |SELECT doc_id, source, n_chars AS score
         |FROM parquet.`$d/documents.parquet` WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(
      s"""REPLACE TABLE $tbl AS
         |SELECT doc_id, source, n_chars * 2 AS score
         |FROM parquet.`$d/documents.parquet` WHERE doc_id % 2 = 0""".stripMargin)
    finalState(spark, tbl)
  }

  /** q_cow_partitioned — PARTITIONED tables on the writable catalog
    * (`PARTITIONED BY (source)`, the identity transform): writers route
    * rows to per-partition files executor-side (one file per (task,
    * partition), with the write's REQUIRED clustered distribution
    * bounding that at O(partitions)); the manifest records each file's
    * partition tuple; and a partition predicate prunes files at PLAN
    * time — before stats skipping, before any I/O. The scripted flow
    * UPDATEs one partition (the row-level rewrite is partition-pruned to
    * that partition's files — every other partition's files stay
    * byte-identical, spec-pinned) and reads another back with a
    * partition-pruned scan. At 100 TB this is the first pruning lever:
    * the predicate drops whole partitions from the listing where stats
    * skipping still walks every manifest entry.
    */
  def qCowPartitioned(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.part_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT) " +
      "PARTITIONED BY (source)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    // One-partition UPDATE: runtime group filtering + partition pruning
    // narrow the rewrite to the min(source) partition's files.
    val lit = spark.sql(
      s"SELECT min(source) FROM parquet.`$d/documents.parquet`").head.getString(0)
    spark.sql(s"UPDATE $tbl SET score = score + 100 WHERE source = '$lit'")
    spark.sql(
      s"""SELECT doc_id, source, score FROM $tbl
         |WHERE source = '$lit' ORDER BY doc_id""".stripMargin)
  }

  /** q_cow_days — TEMPORAL partition transform (`PARTITIONED BY
    * (days(ts))`, Iceberg's day transform): the catalog supports real
    * TIMESTAMP columns (written as annotated int64 epoch micros), writers
    * route each row to its UTC epoch-day partition, and a RANGE predicate
    * on the RAW timestamp column prunes to the covered day bins at plan
    * time — no derived partition column in the query, the engine maps
    * `ts >= T1 AND ts < T2` to day bins itself. At 100 TB this is THE
    * pruning lever for event tables: "last 7 days of a 3-year table"
    * reads 7/1095ths of the listing before any I/O (CowCatalogSpec pins
    * the `N of M partitions` scan description and the hours twin). The
    * query aggregates a 3-day window of the 30-day events fixture; the
    * oracle computes the same window declaratively — routing and pruning
    * must be invisible to results.
    */
  def qCowDays(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.days_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (event_id BIGINT, ts TIMESTAMP, " +
      "user_id BIGINT, value DOUBLE) PARTITIONED BY (days(ts))")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT event_id, ts, user_id, value FROM parquet.`$d/events.parquet`
         |""".stripMargin)
    // Day-aligned literal bounds (computed once, inlined — partition
    // pruning happens at PLAN time, so the predicate must be literal).
    val r = spark.sql(
      s"""SELECT CAST(date_trunc('DAY', min(ts)) + INTERVAL 2 DAYS AS STRING),
         |       CAST(date_trunc('DAY', min(ts)) + INTERVAL 5 DAYS AS STRING)
         |FROM parquet.`$d/events.parquet`""".stripMargin).head
    val (lo, hi) = (r.getString(0), r.getString(1))
    spark.sql(
      s"""SELECT date_format(ts, 'yyyy-MM-dd') AS day, count(*) AS n,
         |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
         |FROM $tbl
         |WHERE ts >= TIMESTAMP '$lo' AND ts < TIMESTAMP '$hi'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** q_cow_spec_evolve — PARTITION SPEC EVOLUTION (`CALL
    * graft_cow.set_spec(table, spec)`, Iceberg `REPLACE PARTITION FIELD`
    * in miniature): a metadata-only commit switches what NEW writes route
    * under; every existing file keeps its tuple AND its spec id, and
    * scans prune each file under the spec that WROTE it (per-file spec
    * resolution — a same-length spec change can never misprune, the
    * CowCatalogSpec motivating-bug test). Compaction migrates old files
    * to the current layout as a side effect of rewriting them. At 100 TB
    * this is how a table re-partitions without rewriting history: the
    * "we should have partitioned by day" fix is one metadata commit, not
    * a 100 TB copy. The scripted flow backfills an identity(source)
    * table, evolves to bucket(4, doc_id), inserts the remaining third,
    * and reads one source back — the old files partition-pruned, the new
    * ones residual-filtered; the oracle is the declarative union.
    */
  def qCowSpecEvolve(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"evo_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT) " +
      "PARTITIONED BY (source)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(s"CALL $CatalogName.set_spec('ops.$name', 'bucket(4, doc_id)')")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 0""".stripMargin)
    val lit = spark.sql(
      s"SELECT min(source) FROM parquet.`$d/documents.parquet`").head.getString(0)
    spark.sql(
      s"""SELECT doc_id, source, score FROM $tbl
         |WHERE source = '$lit' ORDER BY doc_id""".stripMargin)
  }

  /** q_cow_write_order — declarative WRITE SORT ORDER (`CALL
    * graft_cow.set_write_order(table, 'score')`, Iceberg
    * `write.sort-order` in miniature): future batch writes request an
    * ORDERED distribution + in-task sort on the given columns, so each
    * write's files carry DISJOINT [min, max] ranges and range predicates
    * skip all but the covering files — the q_cow_cluster compaction
    * one-shot turned into a standing table property every writer honors.
    * At 100 TB this is the difference between every write needing a
    * follow-up clustering pass and the table clustering ITSELF as it
    * grows. The query reads a score band back; the oracle filters the
    * raw fixture — ordering must be invisible to results (CowCatalogSpec
    * pins the disjoint ranges, the skip metrics and the no-order
    * control).
    */
  def qCowWriteOrder(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"wo_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(s"CALL $CatalogName.set_write_order('ops.$name', 'score')")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    // A fixed band of the score domain, computed once and inlined so the
    // range predicate skips at plan time.
    val r = spark.sql(
      s"""SELECT min(n_chars) + 3 * (max(n_chars) - min(n_chars)) DIV 10,
         |       min(n_chars) + 6 * (max(n_chars) - min(n_chars)) DIV 10
         |FROM parquet.`$d/documents.parquet` WHERE doc_id % 3 <> 0""".stripMargin).head
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    spark.sql(
      s"""SELECT doc_id, source, score FROM $tbl
         |WHERE score >= $lo AND score < $hi ORDER BY doc_id""".stripMargin)
  }

  /** q_cow_partitions — `<table>.partitions` metadata relation (Iceberg's
    * partitions table): one row per (spec id, partition tuple) with
    * file/row/byte/delete counts, rolled up FROM MANIFEST STATS — zero
    * data files opened. The operator's first question about a partitioned
    * table ("how skewed is it? which partitions are fat?") answered at
    * metadata cost; at 100 TB this is the difference between a skew
    * diagnosis in milliseconds and a full-table GROUP BY. The oracle is
    * that full-table GROUP BY — the metadata rollup must equal the data.
    */
  def qCowPartitions(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.pmeta_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT) " +
      "PARTITIONED BY (source)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(
      s"""SELECT partition, n_rows FROM $tbl.partitions
         |ORDER BY partition""".stripMargin)
  }

  /** q_cow_orphans — `CALL graft_cow.remove_orphan_files(table,
    * older_than_ms)` (Iceberg's remove_orphan_files in miniature):
    * deletes data files in the table directory that NO retained version
    * references — the residue of crashed/abandoned write attempts whose
    * commit never happened. Complements VACUUM (which removes files old
    * versions reference); files younger than the horizon are presumed
    * in-flight and kept. The scripted flow plants an orphan next to real
    * data, scans it away, and reads the table back — cleanup must be
    * invisible to results (CowCatalogSpec pins the age guard and that
    * referenced + superseded files survive).
    */
  def qCowOrphans(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"orph_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    val st = graft.sources.CowStore.get(CatalogName,
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("ops"), name)).get
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(st.files.head),
      java.nio.file.Paths.get(st.dir, s"data-${UUID.randomUUID()}.parquet"))
    // horizon 0 + explicit force: the scripted flow KNOWS no write is in
    // flight — without force the age guard refuses sub-hour horizons.
    spark.sql(
      s"CALL $CatalogName.remove_orphan_files('ops.$name', 0L, true)")
    finalState(spark, tbl)
  }

  /** q_cow_dpp — DYNAMIC PARTITION PRUNING on the catalog (SPARK-35779,
    * the star-schema lever): a plain scan of a partitioned table reports
    * its partition source columns as runtime-filterable
    * (`SupportsRuntimeV2Filtering`), so a dim-filtered broadcast join
    * injects the join key's VALUE SET at execution and the fact scan
    * drops every partition outside it before any I/O. At 100 TB this is
    * the difference between scanning the whole fact table and scanning
    * the 3 sources the dimension filter selected — static pruning can't
    * see through a join, DPP can. Each runtime literal runs through the
    * SAME encode as the writer's routing, per the spec that wrote each
    * file (evolution-safe). The oracle is the declarative join — pruning
    * must be invisible to results (CowCatalogSpec pins the dynamicpruning
    * runtime filter in the plan and the partition-count narrowing).
    */
  def qCowDpp(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val sfx = UUID.randomUUID().toString.replace("-", "")
    val fact = s"$CatalogName.ops.dppf_$sfx"
    val dim = s"$CatalogName.ops.dppd_$sfx"
    spark.sql(s"CREATE TABLE $fact (doc_id BIGINT, source STRING, score BIGINT) " +
      "PARTITIONED BY (source)")
    spark.sql(
      s"""INSERT INTO $fact
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(s"CREATE TABLE $dim (source STRING, grp STRING)")
    spark.sql(
      s"""INSERT INTO $dim
         |SELECT DISTINCT source,
         |       CASE WHEN length(source) % 2 = 0 THEN 'even' ELSE 'odd' END
         |FROM parquet.`$d/documents.parquet`""".stripMargin)
    spark.sql(
      s"""SELECT f.doc_id, f.source, f.score
         |FROM $fact f JOIN $dim d ON f.source = d.source
         |WHERE d.grp = 'even'
         |ORDER BY f.doc_id""".stripMargin)
  }

  /** q_cow_limit — LIMIT pushdown to the scan (`SupportsPushDownLimit`):
    * a bare `LIMIT n` plans only enough files to cover n rows from
    * manifest row counts (net of delete vectors) — on a 100 TB table a
    * `LIMIT 10` preview reads ONE file, not the listing. Partial-push
    * contract: Spark's own Limit still rules the row count, so planning
    * too many files costs I/O only (and too few is impossible — files
    * without stats keep everything). Residual filters block the push
    * (CowCatalogSpec pins the planned-file counts, the filter fallback
    * and the DV netting); the table fragments into four files and the
    * query counts a two-file LIMIT — the count is the oracle-checkable
    * surface of a nondeterministic row set.
    */
  def qCowLimit(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.lim_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    for (m <- 0 until 4)
      spark.sql(
        s"""INSERT INTO $tbl
           |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
           |FROM parquet.`$d/documents.parquet`
           |WHERE doc_id % 3 <> 0 AND doc_id % 4 = $m""".stripMargin)
    spark.sql(
      s"SELECT count(*) AS n FROM (SELECT * FROM $tbl LIMIT 40)")
  }

  /** q_cow_str_skipping — STRING min/max file skipping: write-time
    * per-string-column [min, max] bounds in the manifest prune files on
    * string equality/range predicates the way long/timestamp ranges
    * already do — recorded ONLY when every value in the file is pure
    * ASCII (Java order == UTF-8 byte order == Spark's comparison there;
    * one non-ASCII value disables the column's range rather than risking
    * a collation-order misprune — spec-pinned). Composed with the
    * declared write order on the string column, every write's bounds
    * come out DISJOINT, so a `source = 'x'` lookup reads one file — the
    * dictionary-style string point-lookup at 100 TB. The oracle filters
    * the raw fixture; skipping must be invisible to results.
    */
  def qCowStrSkipping(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"sstr_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    spark.sql(s"CALL $CatalogName.set_write_order('ops.$name', 'source')")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(
      s"""SELECT doc_id, source, score FROM $tbl
         |WHERE source = 'src3' ORDER BY doc_id""".stripMargin)
  }

  /** q_cow_dbl_skipping — DOUBLE-column min/max file skipping
    * (completing E314/E348's family: longs, timestamps, ASCII strings
    * and now doubles all prune at plan time): write-time per-double
    * [min, max] bounds ride the manifests — NaN-guarded (one NaN in a
    * file disables that column's range: NaN breaks the total order
    * pruning relies on) — and a pushed range predicate drops files
    * whose bounds cannot satisfy it, before any I/O. With a declared
    * write order on the double column the value space is clustered, so
    * the range predicate reads only the covering files (CowCatalogSpec
    * pins the skip count from the plan description and the NaN guard).
    * The oracle is the plain filtered relation — skipping must be
    * invisible to answers.
    */
  def qCowDblSkipping(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"sdbl_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, score DOUBLE)")
    spark.sql(s"CALL $CatalogName.set_write_order('ops.$name', 'score')")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, CAST(n_chars AS DOUBLE) / 4.0
         |FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(
      s"""SELECT doc_id, score FROM $tbl
         |WHERE score >= 100.0 ORDER BY doc_id""".stripMargin)
  }

  /** q_cow_truncate — SQL `TRUNCATE TABLE` (`TruncatableTable`): one
    * metadata commit removes every current file — zero rewrites, old
    * versions stay time-travelable, delete vectors and equality entries
    * fold away with the files they applied to. The scripted flow
    * truncates a MOR table carrying live positional deletes, reloads a
    * fresh slice, and reads back — the reload must be exactly the fresh
    * slice, untouched by any pre-truncate state (CowCatalogSpec pins
    * the version lineage, time travel to the pre-truncate snapshot and
    * the DV/eq fold).
    */
  def qCowTruncate(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "trunc", mor = true)
    spark.sql(s"DELETE FROM $tbl WHERE score % 5 = 0") // live DVs
    spark.sql(s"TRUNCATE TABLE $tbl")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 0""".stripMargin)
    finalState(spark, tbl)
  }

  /** q_cow_delete_partition — METADATA-ONLY partition DELETE
    * (`SupportsDeleteV2`'s second path — Iceberg's metadata delete):
    * `DELETE FROM t WHERE <identity partition col> IN (…)` covers whole
    * partitions EXACTLY, so it commits by REMOVING those files — zero
    * reads, zero writes, the "drop yesterday's partition" verb that at
    * 100 TB replaces a full rewrite of every matched file. Anything
    * inexact (ranges, non-identity transforms, other columns) falls
    * back to the row-level rewrite — correctness never rides the
    * optimization (CowCatalogSpec pins the scanless plan, the file
    * drops, and the fallbacks). Oracle = the surviving relation.
    */
  def qCowDeletePartition(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"pdel_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, " +
      "score BIGINT) PARTITIONED BY (source)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(s"DELETE FROM $tbl WHERE source IN ('src3', 'src7')")
    finalState(spark, tbl)
  }

  /** q_cow_overwrite — PARTITION-LEVEL `INSERT OVERWRITE`
    * (`SupportsOverwrite` + `SupportsDynamicOverwrite`): the static form
    * (`PARTITION (source = 'x')`) replaces exactly the named identity
    * partitions' files, the dynamic form
    * (`partitionOverwriteMode=dynamic`) replaces exactly the partitions
    * the incoming data touches — the idempotent-backfill write mode
    * (re-running a day's job replaces that day, nothing else). Unlike
    * scan pruning, an overwrite's remove set must be EXACT, so anything
    * undecidable file-exactly fails loudly at plan time: non-identity
    * source columns (a bucket/temporal equality doesn't align with
    * partition boundaries) and mixed-spec tables both refuse
    * (CowCatalogSpec pins untouched partitions byte-identical and the
    * loud gates). The scripted flow overwrites one source partition; the
    * oracle rebuilds the final state declaratively.
    */
  def qCowOverwrite(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.ovw_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT) " +
      "PARTITIONED BY (source)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    val lit = spark.sql(
      s"SELECT min(source) FROM parquet.`$d/documents.parquet`").head.getString(0)
    spark.sql(
      s"""INSERT OVERWRITE $tbl PARTITION (source = '$lit')
         |SELECT doc_id, n_chars * 2 FROM parquet.`$d/documents.parquet`
         |WHERE source = '$lit' AND doc_id % 2 = 0""".stripMargin)
    finalState(spark, tbl)
  }

  /** q_cow_rollback — `CALL graft_cow.rollback(table, version)`
    * (Iceberg's rollback_to_snapshot): main moves FORWARD to a new
    * commit whose content is a retained version's snapshot verbatim —
    * the bad-deploy undo that never deletes history (the bad commits
    * stay time-travelable; only versions on main's lineage are valid
    * targets, spec-pinned). The scripted flow poisons the table with an
    * UPDATE, rolls back, and returns the restored state; the oracle is
    * the pre-poison relation.
    */
  def qCowRollback(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "rbk") // v0 create + v1 insert
    spark.sql(s"UPDATE $tbl SET score = -1 WHERE doc_id >= 0") // v2: poison
    val name = tbl.split("\\.").drop(1).mkString(".")
    spark.sql(s"CALL $CatalogName.rollback('$name', 1L)")
    finalState(spark, tbl)
  }

  /** q_cow_drop_column — `ALTER TABLE … DROP COLUMN` (subtractive schema
    * evolution): a metadata-only commit narrows the schema — no data
    * rewritten, readers stop projecting the column, old snapshots keep
    * their contemporary shape. Without field ids a re-added name would
    * RESURRECT old files' stale values, so the name is TOMBSTONED and
    * re-adding it fails loudly (spec-pinned, durable through recovery).
    * The oracle is the narrowed projection.
    */
  def qCowDropColumn(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "dropc")
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN score")
    spark.sql(s"SELECT doc_id, source FROM $tbl ORDER BY doc_id")
  }

  /** q_cow_rename — `ALTER TABLE … RENAME COLUMN` through STABLE FIELD
    * IDS (Iceberg rename in miniature, the round-15 verdict's #3): a
    * METADATA-ONLY commit — zero files rewritten — after which reads
    * resolve the new name back to each pre-rename file's physical column
    * by id. The scripted flow exercises the whole contract: pre-rename
    * files (score), the rename (score→rating), post-rename files
    * (written as rating), and the rename→re-add cycle (a NEW column
    * takes the vacated name `score` and must read NULL everywhere — the
    * old files' physical `score` belongs to rating's id, never to the
    * newcomer). CowCatalogSpec pins old-snapshot reads keeping the old
    * name, durability through recover, and the skipping/agg-pushdown
    * resolution.
    */
  def qCowRename(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "rename") // v1: thirds under `score`
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN score TO rating")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 0""".stripMargin)
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN score BIGINT")
    spark.sql(
      s"SELECT doc_id, source, rating, score FROM $tbl ORDER BY doc_id")
  }

  /** q_dedup_incremental — INCREMENTAL near-dup over the lakehouse: the
    * change-data feed names the batch's NEW documents, and the df-capped
    * trigram-Jaccard inverted-index join is RESTRICTED to pairs touching
    * them — new×new plus new×existing, never existing×existing. This is
    * THE training-pipeline composition at 100 TB: a daily ingest dedupes
    * in O(new × bucket) against a corpus that only ever grows, instead
    * of re-running the corpus-quadratic join every day. The corpus lives
    * IN the catalog (v1 = two thirds, v2 = the new third); `.changes`
    * (E337) supplies the new ids with zero table rescan; the df cap is
    * `TextOps.DfCap`'s hot-shingle bound. The oracle is the full capped
    * Jaccard filtered to pairs touching the new third — the incremental
    * plan must find exactly what the batch plan would.
    */
  def qDedupIncremental(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.incdup_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, text STRING) " +
      "TBLPROPERTIES ('graft.mode' = 'mor')")
    spark.sql(
      s"""INSERT INTO $tbl SELECT doc_id, text
         |FROM parquet.`$d/documents.parquet` WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(
      s"""INSERT INTO $tbl SELECT doc_id, text
         |FROM parquet.`$d/documents.parquet` WHERE doc_id % 3 = 0""".stripMargin)
    // The batch's new documents, from the commit log alone.
    val newIds = spark.read
      .option("startVersion", "1").option("endVersion", "2")
      .table(s"$tbl.changes")
      .filter(col("_change_type") === "insert")
      .select(col("doc_id").as("new_id"))
    val sh0 = TextOps.shingledOf(spark.table(tbl))
    val kept = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= TextOps.DfCap).select(col("s"))
    val sh = sh0.join(kept, "s").select(col("doc_id"), col("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val isNew = newIds.select(col("new_id").as("doc_id"))
    val newSh = sh.join(isNew, Seq("doc_id"), "left_semi")
    val oldSh = sh.join(isNew, Seq("doc_id"), "left_anti")
    // new×new once (a<b), new×existing once (any order, canonicalized) —
    // existing×existing pairs are never formed: the incremental lever.
    val candNN = newSh.select(col("doc_id").as("doc_a"), col("s"))
      .join(newSh.select(col("doc_id").as("doc_b"), col("s").as("s2")),
        col("s") === col("s2") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val candNO = newSh.select(col("doc_id").as("doc_n"), col("s"))
      .join(oldSh.select(col("doc_id").as("doc_o"), col("s").as("s2")),
        col("s") === col("s2"))
      .select(least(col("doc_n"), col("doc_o")).as("doc_a"),
        greatest(col("doc_n"), col("doc_o")).as("doc_b"))
    val inter = candNN.unionAll(candNO)
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id"), col("n_sh").as("na")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("n_sh").as("nb")),
        col("doc_b") === col("doc_id"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jacc"))
      .orderBy(col("jacc").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** q_stream_backlog — streaming ADMISSION CONTROL on the table source
    * (`option("maxVersionsPerBatch", n)` + `SupportsTriggerAvailableNow`
    * — Delta's maxFilesPerTrigger in miniature): a backlogged consumer
    * catches up in BOUNDED micro-batches (at most n commits per batch)
    * instead of one batch over the whole backlog — at 100 TB, the
    * difference between a catch-up that fits executor memory per batch
    * and one that doesn't. Trigger.AvailableNow pins the catch-up target
    * at query start and loops bounded batches until reached
    * (spec-pinned 8/8/4 drain + the unbounded default). The scripted
    * flow drains a 5-commit backlog at 2 versions/batch and reports
    * (n_batches, n_rows) — both exact by construction.
    */
  def qStreamBacklog(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.bklg_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, score BIGINT)")
    for (h <- 0 until 5)
      spark.sql(
        s"""INSERT INTO $tbl
           |SELECT doc_id, n_chars FROM parquet.`$d/documents.parquet`
           |WHERE doc_id % 5 = $h""".stripMargin)
    val ck = java.nio.file.Files.createTempDirectory("graft_bklg_ck_").toString
    val batches = new java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]()
    spark.readStream
      .option("maxVersionsPerBatch", "2")
      .table(tbl)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches.add(df.count()): Unit
      }
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    import scala.jdk.CollectionConverters._
    val counts = batches.asScala.map(_.longValue())
    spark.createDataFrame(Seq(
      (counts.size.toLong, counts.sum))).toDF("n_batches", "n_rows")
  }

  /** q_cow_drop_refs — ref LIFECYCLE (`CALL graft_cow.drop_tag` /
    * `drop_branch`, the abandon half of WAP): a failed audit's branch is
    * DROPPED — the ref stops resolving, its head loses VACUUM
    * protection, and retention collects the abandoned work; same for
    * stale tags. The scripted flow forks a branch, writes the backfill
    * to it, abandons it, drops a stale tag, vacuums — and main is
    * exactly the never-polluted base relation (the oracle): abandoned
    * work must leave no trace in answers.
    */
  def qCowDropRefs(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "dref")
    val name = tbl.split("\\.").drop(1).mkString(".")
    spark.sql(s"CALL $CatalogName.tag('$name', 'candidate', 1L)")
    spark.sql(s"CALL $CatalogName.branch('$name', 'audit')")
    spark.sql(
      s"""INSERT INTO $tbl.branch_audit
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 0""".stripMargin)
    spark.sql(s"CALL $CatalogName.drop_branch('$name', 'audit')") // audit failed
    spark.sql(s"CALL $CatalogName.drop_tag('$name', 'candidate')")
    spark.sql(s"CALL $CatalogName.vacuum('$name', 1)")
    finalState(spark, tbl)
  }

  /** q_cow_agg_pushdown — MANIFEST-ONLY aggregate pushdown
    * (`SupportsPushDownAggregates`, the Iceberg/Delta metadata-query
    * lever): COUNT(*), MIN/MAX over long/timestamp columns, and GROUP BY
    * identity-partition columns are answered ENTIRELY from write-time
    * manifest stats — the executed plan is a LocalTableScan, zero data
    * files opened. At 100 TB, `SELECT count(*) FROM t` reads a few KB of
    * commit log instead of the table. The pushdown is complete-only and
    * refuses anything the stats can't answer EXACTLY: WHERE clauses stay
    * residual (fall back to a real scan), delete vectors poison MIN/MAX
    * but not COUNT(*), non-partition group-bys and non-min/max/count
    * aggregates scan data (all spec-pinned). The query groups the events
    * fixture by its identity partition column with count/min/max/max-ts
    * per group; the oracle computes the same declaratively — the
    * metadata answer must equal the data answer.
    */
  def qCowAggPushdown(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.aggp_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (event_id BIGINT, ts TIMESTAMP, " +
      "event_type STRING, value DOUBLE) PARTITIONED BY (event_type)")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT event_id, ts, event_type, value
         |FROM parquet.`$d/events.parquet`""".stripMargin)
    spark.sql(
      s"""SELECT event_type, count(*) AS n, min(event_id) AS min_id,
         |       max(event_id) AS max_id, unix_micros(max(ts)) AS max_ts_us
         |FROM $tbl GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** q_cow_bucketed — STORAGE-PARTITIONED JOIN on the writable catalog
    * (`PARTITIONED BY (bucket(8, doc_id))` + `SupportsReportPartitioning`
    * + the catalog's `bucket` FunctionCatalog entry): two tables bucketed
    * by the same transform join WITHOUT ANY EXCHANGE — the scan reports
    * its files' key-grouping, each read task carries its bucket key, and
    * Spark proves co-partitioning because both sides bind the identical
    * canonical bucket function. The Iceberg SPJ design: at 100 TB this
    * deletes the largest shuffle in fact-fact joins that share a bucket
    * layout (the join cost becomes a per-bucket zip, no network). The
    * spec pins the no-Exchange plan; this query pins the RESULT equals
    * the plain relational join, bucketing invisible to answers.
    */
  def qCowBucketed(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val sfx = UUID.randomUUID().toString.replace("-", "")
    val t1 = s"$CatalogName.ops.bktA_$sfx"
    val t2 = s"$CatalogName.ops.bktB_$sfx"
    spark.sql(s"CREATE TABLE $t1 (doc_id BIGINT, score BIGINT) " +
      "PARTITIONED BY (bucket(8, doc_id))")
    spark.sql(
      s"""INSERT INTO $t1
         |SELECT doc_id, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    spark.sql(s"CREATE TABLE $t2 (doc_id BIGINT, n_tokens BIGINT) " +
      "PARTITIONED BY (bucket(8, doc_id))")
    spark.sql(
      s"""INSERT INTO $t2
         |SELECT doc_id, n_chars + 7 FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 2 = 0""".stripMargin)
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try
      spark.sql(
        s"""SELECT a.doc_id, a.score, b.n_tokens
           |FROM $t1 a JOIN $t2 b ON a.doc_id = b.doc_id
           |ORDER BY a.doc_id""".stripMargin)
        // Materialize the join under the SPJ confs; the restored session
        // confs must not re-plan it (the caller only sees the result).
        .localCheckpoint()
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** q_cow_changes — CHANGE DATA FEED between versions (`<table>.changes`
    * with `startVersion`/`endVersion` read options — Delta's
    * `table_changes(t, v1, v2)` in miniature): row-level insert/delete
    * records reconstructed from the COMMIT LOG alone. On a merge-on-read
    * table the reconstruction is exact and O(changed rows): an added
    * file's rows are inserts, a delete-vector's growth names exactly the
    * deleted positions (read back as the pre-image rows), and an UPDATE —
    * delta-committed as delete + insert — surfaces as its pre/post pair
    * in the same commit. COW group rewrites don't record row-level
    * changes and fail loudly with the MOR remedy (spec-pinned). This is
    * the incremental-downstream-sync primitive: consumers reconcile
    * O(changes), never O(table).
    */
  def qCowChanges(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "cdf", mor = true)      // v0 + v1
    spark.sql(s"UPDATE $tbl SET score = score + 1000 WHERE doc_id % 5 = 0") // v2
    spark.sql(s"DELETE FROM $tbl WHERE score % 4 < 2")                      // v3
    spark.read
      .option("startVersion", "1").option("endVersion", "3")
      .table(s"$tbl.changes")
      .orderBy("_commit_version", "_change_type", "doc_id")
  }

  /** q_cow_branch — WRITE-AUDIT-PUBLISH through branch refs (Iceberg
    * branches in miniature): `CALL graft_cow.branch(t, 'audit')` forks a
    * writable branch at main's head; writes addressed to
    * `<table>.branch_audit` accumulate versions OFF-MAIN (main's readers
    * never see them — the audit isolation, spec-pinned); `CALL
    * graft_cow.publish(t, 'audit')` fast-forwards main to the branch
    * head after genuine ancestry validation (a main that moved since the
    * fork fails loudly instead of losing commits — each commit records
    * its parent, so lineage is decidable, not assumed). The scripted
    * flow backfills the missing doc_id%3=0 third plus an UPDATE on the
    * branch, then publishes; the oracle is the final merged state.
    */
  def qCowBranch(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "wap")          // main: %3<>0 rows
    val name = tbl.split("\\.").drop(1).mkString(".")
    spark.sql(s"CALL $CatalogName.branch('$name', 'audit')")
    spark.sql(                                          // branch-only write
      s"""INSERT INTO $tbl.branch_audit
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 0""".stripMargin)
    spark.sql(                                          // audit fix-up
      s"UPDATE $tbl.branch_audit SET score = score + 40 WHERE doc_id % 9 = 0")
    spark.sql(s"CALL $CatalogName.publish('$name', 'audit')")
    finalState(spark, tbl)
  }

  /** q_cow_rebase — BRANCH AUTO-REBASE on disjoint files (the round-17
    * verdict brief's #2): [[qCowBranch]]'s WAP flow, except MAIN takes
    * an interim commit between the fork and the publish (the hourly
    * ingest that never pauses for an audit). The publish is no longer a
    * fast-forward; [[graft.sources.CowStore.publishBranch]] validates
    * that the two lineages touched DISJOINT files and neither evolved
    * snapshot metadata, then replays the branch's cumulative file diff
    * onto main's head in ONE commit — the branch backfill (new files),
    * its COW audit fix-up (a rewrite of branch-added files only) and
    * main's interim append all land; overlapping rewrites and schema /
    * equality-delete divergence still refuse loudly with the same
    * conflict signal `retrySql` validates (spec-pinned). The oracle is
    * the fully merged state: every document, with the fix-up's +40 on
    * the branch rows it touched (doc_id % 18 = 0 — the even-doc_id
    * backfill rows that are multiples of 9).
    */
  def qCowRebase(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "rebase")       // main: %3<>0 rows
    val name = tbl.split("\\.").drop(1).mkString(".")
    spark.sql(s"CALL $CatalogName.branch('$name', 'audit')")
    spark.sql(                               // branch-only backfill (even)
      s"""INSERT INTO $tbl.branch_audit
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 0 AND doc_id % 2 = 0""".stripMargin)
    spark.sql(                               // audit fix-up on the branch
      s"UPDATE $tbl.branch_audit SET score = score + 40 WHERE doc_id % 9 = 0")
    spark.sql(                               // DISJOINT main interim commit
      s"""INSERT INTO $tbl
         |SELECT doc_id, source, n_chars FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 = 0 AND doc_id % 2 = 1""".stripMargin)
    spark.sql(s"CALL $CatalogName.publish('$name', 'audit')") // auto-rebase
    finalState(spark, tbl)
  }

  /** q_cow_optimize — POLICY compaction (`CALL graft_cow.optimize(table,
    * target_bytes)`, Iceberg `rewrite_data_files` in miniature): small
    * files are picked FROM MANIFEST STATS (zero I/O to plan), bin-packed
    * per partition up to the target, each bin rewritten by one Spark
    * task, all landing as ONE snapshot-safe commit that replaces exactly
    * the rewritten files. Delete vectors on rewritten files FOLD — this
    * is how a hot MOR table's accumulated DVs are paid down without the
    * full INSERT OVERWRITE of q_cow_compact. The scripted flow fragments
    * a MOR table (4 small files), DELETEs a slice (DVs), then optimizes
    * with a table-sized target; the oracle is the plain surviving
    * relation — maintenance must be invisible to results (CowCatalogSpec
    * pins the file/DV mechanics: sub-target-only rewrites, partition
    * isolation, stats refresh).
    */
  def qCowOptimize(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val name = s"opt_${UUID.randomUUID().toString.replace("-", "")}"
    val tbl = s"$CatalogName.ops.$name"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT) " +
      "TBLPROPERTIES ('graft.mode' = 'mor')")
    for (m <- 0 until 4)
      spark.sql(
        s"""INSERT INTO $tbl
           |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
           |FROM parquet.`$d/documents.parquet`
           |WHERE doc_id % 3 <> 0 AND doc_id % 4 = $m""".stripMargin)
    spark.sql(s"DELETE FROM $tbl WHERE score % 5 = 0") // positional DVs
    spark.sql(s"CALL $CatalogName.optimize('ops.$name', ${64L * 1024 * 1024}L)")
    finalState(spark, tbl)
  }

  /** The bounded OPTIMISTIC-WRITER LOOP behind [[retrySql]] (split out so
    * the spec can drive it deterministically): run `body`, and when it
    * fails with a write-write conflict (the store's DEDICATED
    * [[graft.sources.CowStore.CommitConflictException]] anywhere in the
    * cause chain — Spark wraps executor/commit errors; a bare JDK
    * `ConcurrentModificationException` from unrelated code never
    * matches, so a real concurrency bug is never silently re-run —
    * round-17 ADVICE), run it again, up to `maxAttempts` total. Returns
    * (result, attempts used). Non-conflict failures propagate
    * immediately — retry is a remedy for losing a race, never for a
    * broken statement — and a conflict on the final attempt rethrows
    * loudly (persistent contention must surface, not spin).
    */
  private[graft] def retryOnConflict[T](maxAttempts: Int)(
      body: Int => T): (T, Int) = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    def isConflict(t: Throwable): Boolean = {
      var c: Throwable = t
      while (c != null) {
        if (c.isInstanceOf[graft.sources.CowStore.CommitConflictException])
          return true
        c = if (c.getCause eq c) null else c.getCause
      }
      false
    }
    var attempt = 1
    while (attempt < maxAttempts) {
      try return (body(attempt), attempt)
      catch { case t: Throwable if isConflict(t) => attempt += 1 }
    }
    (body(attempt), attempt)
  }

  /** AUTOMATIC COMMIT RETRY (the round-16 verdict brief's #5 — the
    * optimistic-writer loop every production lakehouse writer runs,
    * Delta/Iceberg's commit retry at the COMMAND seam): run a row-level
    * SQL statement, and when its commit loses a write-write race
    * (`ConcurrentModificationException` from
    * [[graft.sources.CowStore.commit]]/`commitDelta` — the store-level
    * detection stays exactly as loud as before), RE-RUN the statement.
    * Re-execution re-plans against the NEW table head, which is the
    * whole re-validation: row-level SQL is declarative, so running it
    * against the successor snapshot IS the serialized outcome (the
    * conflicting predicate re-reads the current rows; work already
    * applied by the winner is simply not re-applied). Bounded attempts:
    * persistent contention after `maxAttempts` rethrows the conflict
    * instead of spinning, and non-conflict errors never retry. The raw
    * single-shot path is untouched — a caller that wants
    * fail-on-first-conflict just calls `spark.sql`.
    */
  def retrySql(spark: SparkSession, stmt: String,
               maxAttempts: Int = 3): (DataFrame, Int) =
    retryOnConflict(maxAttempts)(_ => spark.sql(stmt))

  /** q_merge_evolve — MERGE WITH SCHEMA EVOLUTION
    * ([[graft.sources.CowStore.mergeEvolve]], Delta's
    * `withSchemaEvolution` — the round-16 verdict brief's #4): the
    * upsert source carries TWO columns the target lacks (`lang` string,
    * `extra` bigint — the upstream-added-a-field ingest shape), and ONE
    * commit extends the schema under fresh field ids, lands the insert
    * files and dooms the matched keys via an equality-delete entry —
    * schema change and data change atomic, zero target files read.
    * Matched rows are replaced wholesale (UPDATE SET * semantics), NOT
    * MATCHED rows insert, untouched target rows read NULL for the new
    * columns — the declarative full-outer rebuild is the oracle.
    * CowCatalogSpec pins the one-commit atomicity (version +1,
    * time-travel parent keeps the pre-merge shape), durability, and the
    * loud guards (non-keyed table, uncovered target column, tombstoned
    * name, concurrent same-name race).
    */
  def qMergeEvolve(spark: SparkSession, d: String): DataFrame = {
    val tbl = freshBaseTable(spark, d, "mevolve", mor = true,
      eqKey = Some("doc_id"))
    // SQL-driven since round 18 (the round-17 verdict brief's #3): the
    // statement parses through [[graft.plans.GraftSqlParser]] straight
    // to CowStore.mergeEvolve's ONE-commit path — schema + files +
    // equality-delete entry atomically, exactly the Scala API's
    // semantics (PlanSpec pins the parse; CowCatalogSpec the atomicity).
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t
         |USING (SELECT doc_id, source, n_chars + 1000 AS score,
         |              lang, n_chars * 2 AS extra
         |       FROM parquet.`$d/documents.parquet`
         |       WHERE doc_id % 2 = 0) s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql(
      s"SELECT doc_id, source, score, lang, extra FROM $tbl ORDER BY doc_id")
  }

  /** q_commit_retry — two INTERLEAVED row-level writers against the SAME
    * single-file table, each through [[retrySql]]: both threads plan
    * their COW DELETE against the same head, the race's loser hits the
    * store's write-write conflict (its rewrite replaces a file the
    * winner already replaced) and the loop re-runs it against the new
    * head — NEITHER surfaces an error, BOTH commits land, and the final
    * state equals the serial application of both predicates (the rows
    * are disjoint, so the outcome is interleave-independent — what makes
    * this drivable under a deterministic oracle). CowCatalogSpec pins
    * the loop itself (conflict-only retry, bounded exhaustion) and that
    * the store-level detection stays loud for unretried commits.
    */
  def qCommitRetry(spark: SparkSession, d: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$CatalogName.ops.retry_${UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, source STRING, score BIGINT)")
    // ONE file: both writers' rewrites target the same group, so a true
    // interleave conflicts at commit (disjoint-file interleaves commit
    // cleanly without retry — the store validates against the live head).
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT /*+ COALESCE(1) */ doc_id, source, n_chars
         |FROM parquet.`$d/documents.parquet`
         |WHERE doc_id % 3 <> 0""".stripMargin)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = Seq(
        "score % 2 = 0",
        "score % 2 = 1 AND doc_id % 5 = 0").map { pred =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          override def call(): Int = {
            barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
            retrySql(spark, s"DELETE FROM $tbl WHERE $pred")._2
          }
        })
      }
      futures.foreach(_.get(): Unit)
    } finally pool.shutdown()
    finalState(spark, tbl)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_commit_retry"    -> qCommitRetry _,
    "q_merge_evolve"    -> qMergeEvolve _,
    "q_cow_optimize"    -> qCowOptimize _,
    "q_cow_partitioned" -> qCowPartitioned _,
    "q_cow_days"        -> qCowDays _,
    "q_cow_agg_pushdown" -> qCowAggPushdown _,
    "q_cow_spec_evolve" -> qCowSpecEvolve _,
    "q_cow_write_order" -> qCowWriteOrder _,
    "q_cow_partitions"  -> qCowPartitions _,
    "q_cow_orphans"     -> qCowOrphans _,
    "q_cow_dpp"         -> qCowDpp _,
    "q_cow_limit"       -> qCowLimit _,
    "q_cow_str_skipping" -> qCowStrSkipping _,
    "q_cow_dbl_skipping" -> qCowDblSkipping _,
    "q_cow_truncate"    -> qCowTruncate _,
    "q_cow_delete_partition" -> qCowDeletePartition _,
    "q_cow_overwrite"   -> qCowOverwrite _,
    "q_cow_rollback"    -> qCowRollback _,
    "q_cow_drop_column" -> qCowDropColumn _,
    "q_cow_rename"      -> qCowRename _,
    "q_dedup_incremental" -> qDedupIncremental _,
    "q_stream_backlog"  -> qStreamBacklog _,
    "q_cow_drop_refs"   -> qCowDropRefs _,
    "q_cow_expire"      -> qCowExpire _,
    "q_cow_refs"        -> qCowRefs _,
    "q_cow_eqdeletes"   -> qCowEqDeletes _,
    "q_cow_colstats"    -> qCowColstats _,
    "q_cow_bucketed"    -> qCowBucketed _,
    "q_cow_changes"     -> qCowChanges _,
    "q_cow_branch"      -> qCowBranch _,
    "q_cow_rebase"      -> qCowRebase _,
    "q_cow_history"  -> qCowHistory _,
    "q_merge_into"   -> qMergeInto _,
    "q_merge_into_mor" -> qMergeIntoMor _,
    "q_merge_into_eq" -> qMergeIntoEq _,
    "q_cow_vacuum"   -> qCowVacuum _,
    "q_cow_evolve"   -> qCowEvolve _,
    "q_cow_default"  -> qCowDefault _,
    "q_cow_txn"      -> qCowTxn _,
    "q_cow_files"    -> qCowFiles _,
    "q_cow_ctas"     -> qCowCtas _,
    "q_cow_tag"      -> qCowTag _,
    "q_time_travel_ts" -> qTimeTravelTs _,
    "q_cow_compact"  -> qCowCompact _,
    "q_cow_skipping" -> qCowSkipping _,
    "q_cow_cluster"  -> qCowCluster _,
    "q_update_where" -> qUpdateWhere _,
    "q_delete_where" -> qDeleteWhere _,
    "q_time_travel"  -> qTimeTravel _,
  )

  /** The MERGE scenario's declarative rebuild — shared verbatim by the
    * copy-on-write and merge-on-read variants: the write STRATEGY must be
    * invisible to query results.
    */
  private val mergeOracle =
    """WITH base AS (
      |  SELECT doc_id, source, n_chars AS score FROM documents
      |  WHERE doc_id % 3 <> 0
      |), chg AS (
      |  SELECT doc_id, source, n_chars + 1000 AS new_score FROM documents
      |  WHERE doc_id % 2 = 0
      |)
      |SELECT doc_id, source, score FROM (
      |  SELECT b.doc_id AS doc_id, b.source AS source, c.new_score AS score
      |  FROM base b JOIN chg c ON b.doc_id = c.doc_id
      |  WHERE c.new_score % 5 <> 0
      |  UNION ALL
      |  SELECT b.doc_id, b.source, b.score FROM base b
      |  WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.doc_id = b.doc_id)
      |  UNION ALL
      |  SELECT c.doc_id, c.source, c.new_score FROM chg c
      |  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.doc_id = c.doc_id)
      |) ORDER BY doc_id""".stripMargin

  /** DuckDB rebuilds the final state declaratively from the same
    * base/changes definitions — MERGE == relational rebuild.
    */
  val oracle: Map[String, String] = Map(
    // The partition routing/pruning must be invisible to results: the
    // min(source) partition after its +100 update, rebuilt declaratively.
    "q_cow_partitioned" ->
      """SELECT doc_id, source, n_chars + 100 AS score
        |FROM documents
        |WHERE doc_id % 3 <> 0
        |  AND source = (SELECT min(source) FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // The incremental plan must find exactly what the batch plan would:
    // the full capped Jaccard restricted to pairs touching the new third.
    "q_dedup_incremental" ->
      s"""WITH sh0 AS (
         |  ${TextOps.shingleSql}
         |), kept AS (
         |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= ${TextOps.DfCap}
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN kept USING (s)
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  WHERE a.doc_id % 3 = 0 OR b.doc_id % 3 = 0
         |  GROUP BY doc_a, doc_b
         |)
         |SELECT doc_a, doc_b, inter,
         |       na + nb - inter AS uni,
         |       CAST(inter AS DOUBLE) / (na + nb - inter) AS jacc
         |FROM inter
         |JOIN (SELECT doc_id, n_sh AS na FROM sizes) sa ON doc_a = sa.doc_id
         |JOIN (SELECT doc_id, n_sh AS nb FROM sizes) sb ON doc_b = sb.doc_id
         |ORDER BY jacc DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    // The bounded drain's shape is exact by construction: 5 commits at
    // <=2 versions/batch = 3 batches; rows = the whole documents table.
    "q_stream_backlog" ->
      """SELECT CAST(3 AS BIGINT) AS n_batches,
        |       (SELECT count(*) FROM documents) AS n_rows""".stripMargin,
    // Abandoned refs must leave no trace in answers: main is the plain
    // base relation.
    "q_cow_drop_refs" ->
      """SELECT doc_id, source, n_chars AS score
        |FROM documents WHERE doc_id % 3 <> 0
        |ORDER BY doc_id""".stripMargin,
    // Rollback must restore the pre-poison relation exactly.
    "q_cow_rollback" ->
      """SELECT doc_id, source, n_chars AS score
        |FROM documents WHERE doc_id % 3 <> 0
        |ORDER BY doc_id""".stripMargin,
    // DROP COLUMN is the narrowed projection, nothing else.
    "q_cow_drop_column" ->
      """SELECT doc_id, source
        |FROM documents WHERE doc_id % 3 <> 0
        |ORDER BY doc_id""".stripMargin,
    // Expiry must be invisible to the current relation: the composed
    // rewrites, nothing else.
    "q_cow_expire" ->
      """SELECT doc_id, source, score FROM (
        |  SELECT doc_id, source,
        |         (n_chars + CASE WHEN doc_id % 2 = 0 THEN 1000 ELSE 0 END)
        |           * (CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END) AS score
        |  FROM documents WHERE doc_id % 3 <> 0)
        |ORDER BY doc_id""".stripMargin,
    // Sub-k domains: the sketch path must agree with exact SQL.
    "q_cow_colstats" ->
      """SELECT "column", ndv, exact, null_count, min_long, max_long FROM (
        |  SELECT 'doc_id' AS "column",
        |         count(DISTINCT doc_id % 20) AS ndv, TRUE AS exact,
        |         CAST(0 AS BIGINT) AS null_count,
        |         min(doc_id % 20) AS min_long,
        |         max(doc_id % 20) AS max_long
        |  FROM documents
        |  UNION ALL
        |  SELECT 'score',
        |         count(DISTINCT CASE WHEN doc_id % 7 = 0 THEN NULL
        |                             ELSE n_chars % 25 END), TRUE,
        |         count(CASE WHEN doc_id % 7 = 0 THEN 1 END),
        |         min(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars % 25 END),
        |         max(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars % 25 END)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'source', count(DISTINCT source), TRUE, CAST(0 AS BIGINT),
        |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM documents
        |) ORDER BY "column"""".stripMargin,
    // The three pointers, stated literally.
    "q_cow_refs" ->
      """SELECT name, type, version FROM (VALUES
        |  ('main', 'branch', CAST(2 AS BIGINT)),
        |  ('wip', 'branch', CAST(3 AS BIGINT)),
        |  ('blessed', 'tag', CAST(1 AS BIGINT))) AS t(name, type, version)
        |ORDER BY type, name""".stripMargin,
    // The two keyed DELETEs' entries, restated declaratively: version,
    // key count and long-key range per entry (the delete-file path is
    // run-scoped and excluded).
    "q_cow_eqdeletes" ->
      """WITH base AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 3 <> 0
        |)
        |SELECT CAST(2 AS BIGINT) AS version,
        |       CAST(count(*) AS BIGINT) AS key_count,
        |       CAST(min(doc_id) AS BIGINT) AS key_min,
        |       CAST(max(doc_id) AS BIGINT) AS key_max
        |FROM base WHERE doc_id % 7 = 3
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
        |       CAST(min(doc_id) AS BIGINT), CAST(max(doc_id) AS BIGINT)
        |FROM base WHERE doc_id % 5 = 1 AND doc_id % 7 <> 3
        |ORDER BY version""".stripMargin,
    // RENAME is lossless relabeling: every row's value rides under the
    // new name regardless of which side of the rename wrote its file,
    // and the re-added old name is NULL everywhere (fresh identity).
    "q_cow_rename" ->
      """SELECT doc_id, source, n_chars AS rating,
        |       CAST(NULL AS BIGINT) AS score
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // Partition overwrite rebuilt declaratively: the min(source)
    // partition's rows replaced by the doubled-even slice, the rest
    // untouched.
    "q_cow_overwrite" ->
      """WITH lit AS (SELECT min(source) AS s FROM documents)
        |SELECT doc_id, source, score FROM (
        |  SELECT doc_id, source, n_chars AS score FROM documents, lit
        |  WHERE doc_id % 3 <> 0 AND source <> lit.s
        |  UNION ALL
        |  SELECT doc_id, source, n_chars * 2 FROM documents, lit
        |  WHERE source = lit.s AND doc_id % 2 = 0
        |) ORDER BY doc_id""".stripMargin,
    // String skipping must be invisible to results: the same source
    // lookup filtered declaratively.
    "q_cow_str_skipping" ->
      """SELECT doc_id, source, n_chars AS score
        |FROM documents
        |WHERE doc_id % 3 <> 0 AND source = 'src3'
        |ORDER BY doc_id""".stripMargin,
    // The dropped partitions' rows, nothing else.
    "q_cow_delete_partition" ->
      """SELECT doc_id, source, n_chars AS score
        |FROM documents
        |WHERE doc_id % 3 <> 0 AND source NOT IN ('src3', 'src7')
        |ORDER BY doc_id""".stripMargin,
    // Truncation wipes the slate: only the reload is visible.
    "q_cow_truncate" ->
      """SELECT doc_id, source, n_chars AS score
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY doc_id""".stripMargin,
    // Double skipping must be invisible to answers (bit-exact: /4.0 is
    // a power-of-two divide).
    "q_cow_dbl_skipping" ->
      """SELECT doc_id, CAST(n_chars AS DOUBLE) / 4.0 AS score
        |FROM documents
        |WHERE doc_id % 3 <> 0 AND CAST(n_chars AS DOUBLE) / 4.0 >= 100.0
        |ORDER BY doc_id""".stripMargin,
    // The LIMIT's cardinality is the deterministic surface of a
    // nondeterministic row set.
    "q_cow_limit" ->
      """SELECT count(*) AS n FROM (
        |  SELECT * FROM documents WHERE doc_id % 3 <> 0 LIMIT 40
        |)""".stripMargin,
    // Runtime pruning must be invisible to results: the declarative
    // dim-filtered join.
    "q_cow_dpp" ->
      """WITH dim AS (
        |  SELECT DISTINCT source,
        |         CASE WHEN length(source) % 2 = 0 THEN 'even' ELSE 'odd' END AS grp
        |  FROM documents
        |)
        |SELECT f.doc_id, f.source, f.n_chars AS score
        |FROM documents f JOIN dim d ON f.source = d.source
        |WHERE f.doc_id % 3 <> 0 AND d.grp = 'even'
        |ORDER BY f.doc_id""".stripMargin,
    // The metadata rollup must equal the data: per-source row counts
    // rebuilt with a full GROUP BY.
    "q_cow_partitions" ->
      """SELECT source AS partition, count(*) AS n_rows
        |FROM documents WHERE doc_id % 3 <> 0
        |GROUP BY source ORDER BY partition""".stripMargin,
    // Orphan cleanup must be invisible to results: the plain relation.
    "q_cow_orphans" ->
      """SELECT doc_id, source, n_chars AS score
        |FROM documents WHERE doc_id % 3 <> 0
        |ORDER BY doc_id""".stripMargin,
    // Write ordering must be invisible to results: the same score band
    // filtered declaratively from the raw fixture (integer floor-div
    // band bounds, both engines on non-negative ints).
    "q_cow_write_order" ->
      """WITH b AS (
        |  SELECT min(n_chars) + (3 * (max(n_chars) - min(n_chars))) // 10 AS lo,
        |         min(n_chars) + (6 * (max(n_chars) - min(n_chars))) // 10 AS hi
        |  FROM documents WHERE doc_id % 3 <> 0
        |)
        |SELECT doc_id, source, n_chars AS score
        |FROM documents, b
        |WHERE doc_id % 3 <> 0 AND n_chars >= b.lo AND n_chars < b.hi
        |ORDER BY doc_id""".stripMargin,
    // Spec evolution must be invisible to results: one source's rows
    // across both the pre- and post-evolution writes.
    "q_cow_spec_evolve" ->
      """SELECT doc_id, source, n_chars AS score
        |FROM documents
        |WHERE source = (SELECT min(source) FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // The manifest answer must equal the data answer: per-partition
    // count/min/max rebuilt declaratively from the raw fixture.
    "q_cow_agg_pushdown" ->
      """SELECT event_type, count(*) AS n, min(event_id) AS min_id,
        |       max(event_id) AS max_id,
        |       CAST(epoch_us(max(ts)) AS BIGINT) AS max_ts_us
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // The temporal routing/pruning must be invisible to results: the
    // same day-aligned 3-day window, computed declaratively.
    "q_cow_days" ->
      """WITH b AS (SELECT date_trunc('day', min(ts)) AS t0 FROM events)
        |SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM events, b
        |WHERE ts >= b.t0 + INTERVAL 2 DAY AND ts < b.t0 + INTERVAL 5 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Optimize must be invisible to results: the surviving relation
    // after the %5 delete, whatever the file layout did.
    "q_cow_optimize" ->
      """SELECT doc_id, source, n_chars AS score
        |FROM documents
        |WHERE doc_id % 3 <> 0 AND n_chars % 5 <> 0
        |ORDER BY doc_id""".stripMargin,
    // The published state rebuilt declaratively: base third-less rows
    // plus the branch's backfill, with the branch UPDATE applied to
    // multiples of 9 (all of which arrived via the backfill or the base).
    "q_cow_branch" ->
      """SELECT doc_id, source,
        |       n_chars + (CASE WHEN doc_id % 9 = 0 THEN 40 ELSE 0 END) AS score
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The auto-rebased publish, rebuilt declaratively: base + branch
    // backfill (+40 where the fix-up hit it: even multiples of 9) +
    // main's disjoint interim append — ONE merged relation covering
    // every document.
    "q_cow_rebase" ->
      """SELECT doc_id, source,
        |       n_chars + (CASE WHEN doc_id % 18 = 0 THEN 40 ELSE 0 END) AS score
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The change feed rebuilt declaratively: v2's UPDATE (doc_id%5=0)
    // emits a pre-image delete + post-image insert pair; v3's DELETE
    // emits pre-image deletes of the then-current state.
    "q_cow_changes" ->
      """WITH base AS (
        |  SELECT doc_id, source, n_chars AS score FROM documents
        |  WHERE doc_id % 3 <> 0
        |), upd AS (
        |  SELECT doc_id, source, score, score + 1000 AS new_score
        |  FROM base WHERE doc_id % 5 = 0
        |), cur AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 5 = 0 THEN score + 1000 ELSE score END AS score
        |  FROM base
        |)
        |SELECT doc_id, source, score, _change_type, _commit_version FROM (
        |  SELECT doc_id, source, score, 'delete' AS _change_type,
        |         CAST(2 AS BIGINT) AS _commit_version FROM upd
        |  UNION ALL
        |  SELECT doc_id, source, new_score, 'insert', CAST(2 AS BIGINT) FROM upd
        |  UNION ALL
        |  SELECT doc_id, source, score, 'delete', CAST(3 AS BIGINT)
        |  FROM cur WHERE score % 4 < 2
        |) ORDER BY _commit_version, _change_type, doc_id""".stripMargin,
    // The SPJ must be invisible to results: the bucketed join equals the
    // plain relational join of the two slices.
    "q_cow_bucketed" ->
      """SELECT a.doc_id, a.n_chars AS score, b.n_chars + 7 AS n_tokens
        |FROM documents a JOIN documents b ON a.doc_id = b.doc_id
        |WHERE a.doc_id % 3 <> 0 AND b.doc_id % 2 = 0
        |ORDER BY a.doc_id""".stripMargin,
    "q_merge_into_mor" -> mergeOracle,
    "q_merge_into_eq" -> mergeOracle,
    // Blind keyed upsert with evolution: matched keys take the source
    // row wholesale, unmatched target rows read NULL for the columns
    // the merge added — the full-outer rebuild, stated declaratively.
    "q_merge_evolve" ->
      """WITH base AS (
        |  SELECT doc_id, source, n_chars AS score FROM documents
        |  WHERE doc_id % 3 <> 0
        |), chg AS (
        |  SELECT doc_id, source, n_chars + 1000 AS score,
        |         lang, n_chars * 2 AS extra
        |  FROM documents WHERE doc_id % 2 = 0
        |)
        |SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
        |       COALESCE(c.source, b.source) AS source,
        |       COALESCE(c.score, b.score) AS score,
        |       c.lang AS lang, c.extra AS extra
        |FROM base b FULL OUTER JOIN chg c ON b.doc_id = c.doc_id
        |ORDER BY doc_id""".stripMargin,
    // Interleave-independent by construction: the two racing DELETEs'
    // rows are disjoint, so the serial rebuild is the answer under any
    // commit order (and under any number of retries).
    "q_commit_retry" ->
      """SELECT doc_id, source, n_chars AS score FROM documents
        |WHERE doc_id % 3 <> 0
        |  AND NOT (n_chars % 2 = 0)
        |  AND NOT (n_chars % 2 = 1 AND doc_id % 5 = 0)
        |ORDER BY doc_id""".stripMargin,
    // Two sequential UPDATEs then vacuum: retention must be invisible to
    // the current version — the oracle is the plain double-update rebuild.
    "q_cow_vacuum" ->
      """SELECT doc_id, source,
        |       (CASE WHEN doc_id % 7 = 0 THEN n_chars * 2 + 1 ELSE n_chars END)
        |         + (CASE WHEN doc_id % 5 = 0 THEN 5 ELSE 0 END) AS score
        |FROM documents WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin,
    // One row per fragment file: the write-time stats must equal the
    // per-quartile aggregates exactly (fragment q covers
    // [(q*cnt)//4, ((q+1)*cnt)//4) after the %3 cut).
    "q_cow_files" ->
      """WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
        |frag AS (
        |  SELECT doc_id, n_chars,
        |         CASE WHEN doc_id < (1 * cnt) // 4 THEN 0
        |              WHEN doc_id < (2 * cnt) // 4 THEN 1
        |              WHEN doc_id < (3 * cnt) // 4 THEN 2 ELSE 3 END AS q
        |  FROM documents, n WHERE doc_id % 3 <> 0
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
        |       MIN(n_chars) AS min_score, MAX(n_chars) AS max_score
        |FROM frag GROUP BY q ORDER BY min_doc_id""".stripMargin,
    // The captured instant resolves to the pristine insert; the current
    // state carries the one update.
    "q_time_travel_ts" ->
      """SELECT doc_id, n_chars AS score_then,
        |       CASE WHEN doc_id % 6 = 0 THEN n_chars + 900 ELSE n_chars END
        |         AS score_now
        |FROM documents WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin,
    // The tag resolves to the pristine insert; the current state carries
    // the one update.
    "q_cow_tag" ->
      """SELECT doc_id, n_chars AS score_tagged,
        |       CASE WHEN doc_id % 4 = 0 THEN n_chars + 500 ELSE n_chars END
        |         AS score_now
        |FROM documents WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin,
    // The RTAS relation IS the final state, whatever the staging
    // machinery did in between.
    "q_cow_ctas" ->
      """SELECT doc_id, source, n_chars * 2 AS score
        |FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""".stripMargin,
    // Pre-evolution rows (doc_id % 3 = 1) read NULL for the added column;
    // post-evolution rows carry written values.
    "q_cow_evolve" ->
      """SELECT doc_id, source, n_chars AS score,
        |       CASE WHEN doc_id % 3 = 2 THEN n_chars + 7 ELSE NULL END AS bonus
        |FROM documents WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin,
    // Pre-ADD rows (doc_id % 3 = 1) serve the declared DEFAULTs; the
    // explicit post-ADD wave carries written values; the column-list
    // INSERT wave (doc_id % 3 = 0, even) is analyzer-filled with the
    // same defaults — all three wavefronts declaratively.
    // The transacted gold table IS the declarative fact aggregate —
    // atomic publication must be invisible to the numbers.
    "q_cow_txn" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_score
        |FROM documents WHERE doc_id % 3 <> 0
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_cow_default" ->
      """SELECT doc_id, source, n_chars AS score,
        |       CASE WHEN doc_id % 3 = 2 THEN n_chars % 5 ELSE 7 END AS tier,
        |       CASE WHEN doc_id % 3 = 2 THEN 'fresh' ELSE 'base' END AS label
        |FROM documents
        |WHERE doc_id % 3 <> 0 OR doc_id % 2 = 0
        |ORDER BY doc_id""".stripMargin,
    "q_merge_into" ->
      """WITH base AS (
        |  SELECT doc_id, source, n_chars AS score FROM documents
        |  WHERE doc_id % 3 <> 0
        |), chg AS (
        |  SELECT doc_id, source, n_chars + 1000 AS new_score FROM documents
        |  WHERE doc_id % 2 = 0
        |)
        |SELECT doc_id, source, score FROM (
        |  SELECT b.doc_id AS doc_id, b.source AS source, c.new_score AS score
        |  FROM base b JOIN chg c ON b.doc_id = c.doc_id
        |  WHERE c.new_score % 5 <> 0
        |  UNION ALL
        |  SELECT b.doc_id, b.source, b.score FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.doc_id = b.doc_id)
        |  UNION ALL
        |  SELECT c.doc_id, c.source, c.new_score FROM chg c
        |  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.doc_id = c.doc_id)
        |) ORDER BY doc_id""".stripMargin,
    "q_update_where" ->
      """SELECT doc_id, source,
        |       CASE WHEN doc_id % 7 = 0 THEN n_chars * 2 + 1 ELSE n_chars END
        |         AS score
        |FROM documents WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin,
    "q_delete_where" ->
      """SELECT doc_id, source, n_chars AS score
        |FROM documents
        |WHERE doc_id % 3 <> 0 AND NOT (n_chars % 4 < 2)
        |ORDER BY doc_id""".stripMargin,
    "q_cow_compact" ->
      """SELECT doc_id, source, n_chars AS score FROM documents
        |WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin,
    // The scripted lineage's cardinalities: v0 empty, v1 = base insert,
    // v2 = UPDATE (same rows), v3 = DELETE survivors of the UPDATED
    // scores.
    "q_cow_history" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN n_chars * 2 + 1
        |              ELSE n_chars END AS upd
        |  FROM documents WHERE doc_id % 3 <> 0
        |)
        |SELECT CAST(version AS BIGINT) AS version, n_rows FROM (
        |  SELECT 0 AS version, CAST(0 AS BIGINT) AS n_rows
        |  UNION ALL SELECT 1, (SELECT COUNT(*) FROM base)
        |  UNION ALL SELECT 2, (SELECT COUNT(*) FROM base)
        |  UNION ALL SELECT 3,
        |    (SELECT COUNT(*) FROM base WHERE NOT (upd % 4 < 2))
        |) ORDER BY version""".stripMargin,
    "q_cow_cluster" ->
      """WITH n AS (SELECT COUNT(*) AS cnt FROM documents)
        |SELECT doc_id, source, n_chars AS score FROM documents, n
        |WHERE doc_id % 3 <> 0
        |  AND doc_id >= cnt // 2 AND doc_id < cnt // 2 + cnt // 8
        |ORDER BY doc_id""".stripMargin,
    // The query range [n/2, n/2 + n/8) sits strictly inside the third
    // fragment for any n > 8, so the fragment bounds never clip it.
    "q_cow_skipping" ->
      """WITH n AS (SELECT COUNT(*) AS cnt FROM documents)
        |SELECT doc_id, source, n_chars AS score FROM documents, n
        |WHERE doc_id % 3 <> 0
        |  AND doc_id >= cnt // 2 AND doc_id < cnt // 2 + cnt // 8
        |ORDER BY doc_id""".stripMargin,
    "q_time_travel" ->
      """SELECT doc_id, n_chars AS score_v1,
        |       CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000 ELSE n_chars END
        |         AS score_now,
        |       doc_id % 5 = 0 AS changed
        |FROM documents WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin,
  )
}
