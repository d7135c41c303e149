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

  /** Shared replay staging for the round-11 chaos tests: one half of the
    * feed lands as `tickN-*` files with strictly increasing mtimes (the
    * (mtime, path) order FileStreamSource batches by).
    */
  private def arriveTick(replay: java.nio.file.Path,
                         half: org.apache.spark.sql.DataFrame,
                         tick: Int): Unit = {
    val scratch = Files.createTempDirectory(s"graft_chaos_half$tick")
    half.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    scratch.toFile.listFiles.filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
        val dst = replay.resolve(f"tick$tick%d-$i%05d.parquet")
        Files.move(f.toPath, dst)
        dst.toFile.setLastModified(1600000000000L + tick * 60000L): Unit
      }
  }

  test("bitmap word state restart: a straddling day's word keeps its pre-cut bits") {
    // q_stream_bitmap's state is one bit_or word per (day, bucket). Cut
    // the replay at the median timestamp (mid-day), restart, and the
    // straddling day — emitted only after the restart, when the
    // watermark closes it — must pop-count to the FULL day's distinct
    // users: bits set by tick1 events live only in recovered state.
    val rocks = rocksSession()
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)
    val cut = raw.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong
    val dayUs = 86400L * 1000000L
    val dayStart = Math.floorDiv(cut, dayUs) * dayUs
    // Load-bearing precondition: some user is active in the cut's day
    // ONLY before the cut — their bit exists nowhere but in state.
    val dayRows = raw.filter(col("ts") >= dayStart && col("ts") < dayStart + dayUs)
    val preOnly = dayRows.groupBy(col("user_id")).agg(max(col("ts")).as("mx"))
      .filter(col("mx") <= cut).count()
    assert(preOnly > 0, "fixture: the median day needs a pre-cut-only user")

    def words(events: org.apache.spark.sql.DataFrame) = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"),
        expr("user_id DIV 63").as("bucket"))
      .agg(expr(
        "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)))")
        .as("word"))
      .select(unix_timestamp(col("w.start")).as("w_epoch"), col("bucket"),
        col("word"))
    val replay = Files.createTempDirectory("graft_bitmap_replay_")
    val ckpt = Files.createTempDirectory("graft_bitmap_ckpt_").toString
    def drain(outDir: String, checkpoint: String): Seq[(Long, Long, Long)] = {
      val q = words(StreamOps.eventsStream(rocks, replay.toString))
        .writeStream.option("checkpointLocation", checkpoint)
        .format("parquet").option("path", outDir).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      rocks.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    val out = Files.createTempDirectory("graft_bitmap_out_").toString
    arriveTick(replay, raw.filter(col("ts") <= cut), 1)
    val run1 = drain(out, ckpt)
    arriveTick(replay, raw.filter(col("ts") > cut), 2)
    val all = drain(out, ckpt)
    assert(all.size == all.toSet.size, "bitmap words re-emitted after restart")
    // The straddling day emitted post-restart with the FULL day's users.
    val dayEpoch = dayStart / 1000000L
    val emittedDau = (all.toSet -- run1.toSet)
      .filter(_._1 == dayEpoch).toSeq
      .map(w => java.lang.Long.bitCount(w._3).toLong).sum
    val wantDau = dayRows.select(col("user_id")).distinct().count()
    assert(emittedDau == wantDau && wantDau > 0,
      s"straddling day popped $emittedDau of $wantDau users — " +
        "tick1 bits were lost across the restart")
    // Interrupted == uninterrupted.
    val whole = drain(Files.createTempDirectory("graft_bitmap_out2_").toString,
      Files.createTempDirectory("graft_bitmap_ckpt2_").toString)
    assert(all.toSet == whole.toSet && whole.nonEmpty,
      "restarted bitmap stream must equal the uninterrupted run")
  }

  test("histogram sketch restart: a straddling day's bin counts merge across the boundary") {
    // q_stream_quantile's state is (day, type, bin)→count. The sketch
    // contract is MERGEABILITY under any slicing — including a slicing
    // interrupted by a restart: the straddling day's final bin counts
    // must equal the full-day batch histogram, which needs the tick1
    // partial counts recovered from state.
    val rocks = rocksSession()
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)
    val dayUs = 86400L * 1000000L
    // Choose the cut FROM a provably straddle-able cell: a (type, bin,
    // day) with two distinct timestamps — cutting between them puts
    // counts of ONE cell on both sides of the restart, so its final
    // count is a genuine state merge, not a tick2-only count. (The
    // sf0.001 fixture is too sparse for a blind median-ts cut to land
    // inside a multi-event cell.)
    val cell = raw.filter(col("value").isNotNull)
      .groupBy(col("event_type"), floor(col("value")).cast("long").as("bin"),
        expr(s"ts DIV $dayUs").as("day"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .filter(col("lo") < col("hi"))
      .orderBy(col("day"), col("event_type"), col("bin")).limit(1).collect()
    assert(cell.nonEmpty, "fixture: need a multi-event (type, bin, day) cell")
    val cut = (cell.head.getAs[Long]("lo") + cell.head.getAs[Long]("hi")) / 2
    val dayStart = cell.head.getAs[Long]("day") * dayUs
    val dayRows = raw
      .filter(col("ts") >= dayStart && col("ts") < dayStart + dayUs &&
        col("value").isNotNull)
      .select(col("event_type"), floor(col("value")).cast("long").as("bin"),
        col("ts"))

    def hist(events: org.apache.spark.sql.DataFrame) = events
      .filter(col("value").isNotNull)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"),
        floor(col("value")).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("w_epoch"),
        col("event_type"), col("bin"), col("n"))
    val replay = Files.createTempDirectory("graft_quant_replay_")
    val ckpt = Files.createTempDirectory("graft_quant_ckpt_").toString
    def drain(outDir: String, checkpoint: String): Seq[(Long, String, Long, Long)] = {
      val q = hist(StreamOps.eventsStream(rocks, replay.toString))
        .writeStream.option("checkpointLocation", checkpoint)
        .format("parquet").option("path", outDir).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      rocks.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    }
    val out = Files.createTempDirectory("graft_quant_out_").toString
    arriveTick(replay, raw.filter(col("ts") <= cut), 1)
    val run1 = drain(out, ckpt)
    arriveTick(replay, raw.filter(col("ts") > cut), 2)
    val all = drain(out, ckpt)
    assert(all.size == all.toSet.size, "histogram rows re-emitted after restart")
    // Straddling day: emitted bins == the full-day batch histogram.
    val dayEpoch = dayStart / 1000000L
    val emitted = (all.toSet -- run1.toSet)
      .filter(_._1 == dayEpoch).map(r => (r._2, r._3) -> r._4).toMap
    val want = dayRows.groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(emitted == want && want.nonEmpty,
      "straddling day's bins must merge tick1 state with tick2 arrivals")
    val whole = drain(Files.createTempDirectory("graft_quant_out2_").toString,
      Files.createTempDirectory("graft_quant_ckpt2_").toString)
    assert(all.toSet == whole.toSet && whole.nonEmpty,
      "restarted histogram stream must equal the uninterrupted run")
  }

  test("window quota restart: the seen-counter resumes, verdicts equal the batch rank") {
    // q_stream_throttle's state is one long per (user, day). Cut the
    // replay between two same-(user, day) events: the post-restart
    // event's seq must CONTINUE the recovered counter (a reset would
    // re-admit it as seq 1), and the full verdict set must equal the
    // batch row_number oracle.
    val rocks = rocksSession()
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)
    val winUs = StreamOps.ThrottleWinUs
    val pair = raw
      .select(col("user_id"), col("ts"),
        expr(s"ts DIV $winUs").as("day"),
        lead(col("ts"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), expr(s"ts DIV $winUs"))
          .orderBy(col("ts"), col("event_id"))).as("nxt"))
      .filter(col("nxt").isNotNull && col("nxt") > col("ts"))
      .orderBy(col("ts")).limit(1).collect()
    assert(pair.nonEmpty, "fixture: need a (user, day) with 2+ events")
    val cut = (pair.head.getAs[Long]("ts") + pair.head.getAs[Long]("nxt")) / 2
    val (qUser, qDay) = (pair.head.getAs[Long]("user_id"),
      pair.head.getAs[Long]("day") * winUs)

    def quota(events: org.apache.spark.sql.DataFrame) = {
      import rocks.implicits._
      events.select(col("user_id"), col("ts"), col("event_id"))
        .as[(Long, Long, Long)]
        .groupByKey(r => (r._1, Math.floorDiv(r._2, winUs) * winUs))
        .transformWithState(
          new graft.streaming.WindowQuotaProcessor(StreamOps.ThrottleK),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF()
    }
    val replay = Files.createTempDirectory("graft_quota_replay_")
    val ckpt = Files.createTempDirectory("graft_quota_ckpt_").toString
    def drain(outDir: String, checkpoint: String): Set[(Long, Long, Long, Long, Boolean)] = {
      val q = quota(rocks.readStream.schema(StreamOps.eventsRawSchema)
          .option("maxFilesPerTrigger", "1").parquet(replay.toString))
        .writeStream.option("checkpointLocation", checkpoint)
        .format("parquet").option("path", outDir).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = rocks.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toSeq
      assert(rows.size == rows.toSet.size, "quota verdicts re-emitted")
      rows.toSet
    }
    val out = Files.createTempDirectory("graft_quota_out_").toString
    arriveTick(replay, raw.filter(col("ts") <= cut), 1)
    val run1 = drain(out, ckpt)
    arriveTick(replay, raw.filter(col("ts") > cut), 2)
    val all = drain(out, ckpt)
    // The boundary (user, day)'s post-restart seqs CONTINUE the counter.
    val preSeqs = run1.filter(v => v._1 == qUser && v._2 == qDay).map(_._4)
    val postSeqs = (all -- run1).filter(v => v._1 == qUser && v._2 == qDay)
      .map(_._4)
    assert(preSeqs.nonEmpty && postSeqs.nonEmpty &&
        postSeqs.min == preSeqs.max + 1,
      s"seen-counter did not resume: pre=$preSeqs post=$postSeqs")
    // Full verdict set == the batch rank oracle.
    // floor division, NOT `ts DIV winUs`: DIV truncates toward zero while
    // the stream buckets with Math.floorDiv — the oracle must pin the
    // floor semantics so pre-epoch (negative-µs) timestamps would disagree
    // loudly here if the stream ever regressed to truncation.
    val floorWin = s"(ts DIV $winUs - (CASE WHEN ts < 0 AND ts % $winUs <> 0" +
      s" THEN 1 ELSE 0 END))"
    val want = raw.select(col("user_id"),
        expr(s"$floorWin * $winUs").as("win_us"), col("event_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), expr(floorWin))
          .orderBy(col("ts"), col("event_id"))).as("seq"))
      .select(col("user_id"), col("win_us"), col("event_id"), col("seq"),
        (col("seq") <= StreamOps.ThrottleK).as("admitted"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3).toLong, r.getBoolean(4))).toSet
    assert(all == want && all.nonEmpty,
      "restarted quota verdicts must equal the batch row_number plan")
  }

  test("band-claim state restart: tick-1 claims reject tick-2 near-dups through the gate") {
    // The BandClaimProcessor family (q_stream_neardup / q_stream_winnow /
    // q_stream_quality) holds one first-owner long per band key. Cut the
    // DOCUMENT replay at the median doc_id, restart from the same
    // checkpoint, and a tick-2 quality-passing near-dup of a tick-1
    // passer must still be rejected — its rejection exists only in
    // recovered state. Runs the QUALITY-GATED variant so the claims-
    // after-filter ordering is exercised through the restart too.
    val rocks = rocksSession()
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    val docs = Tables.documents(rocks, sfDir).select(col("doc_id"), col("text"))
    // The q_stream_quality gate, restated (StreamingSpec pins the rule).
    val keep = {
      val toks = split(col("text"), " ")
      (size(toks) >= 10) &&
        (expr("size(filter(split(text, ' '), t -> t IN ('the', 'a')))") * 2
          <= size(toks)) &&
        (size(array_distinct(toks)) * 25 >= size(toks) * 8)
    }
    val cut = docs.stat.approxQuantile("doc_id", Array(0.5), 0.0).head.toLong
    // Load-bearing precondition: a cross-cut band-sharing pair of
    // quality PASSERS exists (tick-2 member rejected only via state).
    val passers = docs.filter(keep).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val crossPairs = graft.operators.TextOps.qMinhashLsh(rocks, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) =>
        passers(a) && passers(b) && a <= cut && b > cut }
    assert(crossPairs.nonEmpty,
      "fixture: need a quality-passing near-dup pair straddling the cut")

    val replay = Files.createTempDirectory("graft_band_replay_")
    val ckpt = Files.createTempDirectory("graft_band_ckpt_").toString
    def drain(outDir: String, checkpoint: String): Map[Long, Long] = {
      import rocks.implicits._
      val q = graft.operators.TextOps.minhashBandRows(
          rocks.readStream.schema(docSchema)
            .option("maxFilesPerTrigger", "1").parquet(replay.toString)
            .filter(keep))
        .select(col("band_key"), col("doc_id"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.BandClaimProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF()
        .writeStream.option("checkpointLocation", checkpoint)
        .format("parquet").option("path", outDir).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      rocks.read.parquet(outDir)
        .groupBy(col("doc_id"))
        .agg(sum(when(col("lost"), 1L).otherwise(0L)).as("n_lost"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val out = Files.createTempDirectory("graft_band_out_").toString
    arriveTick(replay, docs.filter(col("doc_id") <= cut), 1)
    val run1 = drain(out, ckpt)
    arriveTick(replay, docs.filter(col("doc_id") > cut), 2)
    val all = drain(out, ckpt)
    // The straddling rejection happened, and only post-restart.
    crossPairs.map(_._2).foreach { b =>
      assert(all.getOrElse(b, 0L) > 0L,
        s"tick-2 near-dup $b admitted — tick-1 band claims were lost")
      assert(!run1.contains(b), s"doc $b voted before it arrived")
    }
    // Interrupted == uninterrupted, and equal to the declarative rule
    // (min passing owner per band) via the batch pair set.
    val whole = drain(Files.createTempDirectory("graft_band_out2_").toString,
      Files.createTempDirectory("graft_band_ckpt2_").toString)
    assert(all == whole && all.nonEmpty,
      "restarted band-claim votes must equal the uninterrupted run")
    val passerLosers = graft.operators.TextOps.qMinhashLsh(rocks, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, b) if passers(a) && passers(b) => b }.toSet
    all.foreach { case (d, n) =>
      assert((n > 0L) == passerLosers(d), s"doc $d verdict vs batch rule")
    }
  }

  test("state-store reader after restart: recovered state contents equal the batch plan") {
    // q_state_read's surface, through a crash: run the complete-mode
    // tumbling aggregation in two drains against ONE checkpoint, then
    // read the RocksDB state back with the statestore reader — the
    // recovered-and-updated state CONTENTS (not just sink output) must
    // equal the batch GROUP BY over the full feed.
    val rocks = rocksSession()
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)
    val cut = raw.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong
    val replay = Files.createTempDirectory("graft_sread_replay_")
    val ckpt = Files.createTempDirectory("graft_sread_ckpt_").toString
    def drain(sink: String): Unit = {
      val q = StreamOps.tumblingCounts(
          StreamOps.eventsStream(rocks, replay.toString))
        .writeStream.option("checkpointLocation", ckpt)
        .format("memory").queryName(sink).outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    arriveTick(replay, raw.filter(col("ts") <= cut), 1)
    drain("sread_run1")
    arriveTick(replay, raw.filter(col("ts") > cut), 2)
    drain("sread_run2")
    val state = rocks.read.format("statestore").load(ckpt)
    // Same name-based projection contract as StreamOps.qStateRead.
    val keyFields = state.select(col("key.*")).schema.fieldNames.toSeq
    assert(keyFields == Seq("window", "event_type"),
      s"state key layout changed: $keyFields")
    val got = state.select(col("key.window.start").cast("long").as("s"),
        col("key.event_type").as("t"),
        col("value.count").cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = Tables.events(rocks, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("s"),
        col("event_type").as("t"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty,
      "post-restart state-store contents must equal the batch plan")
  }

  test("state change feed after restart: per-batch deltas equal the uninterrupted run's") {
    // q_state_changefeed's surface, through a crash: the same two-drain
    // replay against ONE checkpoint, then the change feed read over the
    // whole batch range must record exactly the deltas the uninterrupted
    // run records — batch 0 = tick-1 touched keys with tick-1 counts,
    // batch 1 = keys a tick-2 row touched with ACCUMULATED counts. The
    // restart must neither replay batch 0's changelog nor lose it.
    val rocks = rocksSession()
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)
    val cut = raw.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong
    def feedOf(ckpt: String): Seq[(Long, String, Long, String, Long)] = {
      val feed = rocks.read.format("statestore")
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", "0").load(ckpt)
      val rows = feed.select(col("batch_id").cast("long"),
          col("change_type").cast("string"),
          col("key.window.start").cast("long"),
          col("key.event_type"), col("value.count").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3), r.getLong(4))).toSeq
      // Normalize batch ids to their RANK so an empty admin batch in one
      // schedule can't shift the comparison — the CONTENT per data batch
      // is the contract.
      val rank = rows.map(_._1).distinct.sorted.zipWithIndex.toMap
      rows.map(r => (rank(r._1).toLong, r._2, r._3, r._4, r._5)).sorted
    }
    def drain(replay: java.nio.file.Path, ckpt: String, sink: String): Unit = {
      val q = StreamOps.tumblingCounts(
          StreamOps.eventsStream(rocks, replay.toString))
        .writeStream.option("checkpointLocation", ckpt)
        .format("memory").queryName(sink).outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // Interrupted: tick1, crash boundary, tick2 — one checkpoint.
    val replayA = Files.createTempDirectory("graft_cfeed_replay_")
    val ckptA = Files.createTempDirectory("graft_cfeed_ckpt_").toString
    arriveTick(replayA, raw.filter(col("ts") <= cut), 1)
    drain(replayA, ckptA, "cfeed_run1")
    arriveTick(replayA, raw.filter(col("ts") > cut), 2)
    drain(replayA, ckptA, "cfeed_run2")
    val interrupted = feedOf(ckptA)
    // Uninterrupted control: both ticks staged before one drain.
    val replayB = Files.createTempDirectory("graft_cfeed_replayB_")
    val ckptB = Files.createTempDirectory("graft_cfeed_ckptB_").toString
    arriveTick(replayB, raw.filter(col("ts") <= cut), 1)
    arriveTick(replayB, raw.filter(col("ts") > cut), 2)
    drain(replayB, ckptB, "cfeed_whole")
    val whole = feedOf(ckptB)
    assert(interrupted == whole && whole.nonEmpty,
      "restarted change feed must equal the uninterrupted run's deltas")
    // And batch 1's deltas are exactly the tick-2-touched groups with
    // accumulated counts (the incremental-audit contract).
    val want2 = raw.filter(col("ts") > cut)
      .select((col("ts") - pmod(col("ts"), lit(3600L * 1000000L))).as("w"),
        col("event_type")).distinct()
      .collect().map(r => (r.getLong(0) / 1000000L, r.getString(1))).toSet
    val got2 = interrupted.filter(_._1 == 1L).map(r => (r._3, r._4)).toSet
    assert(got2 == want2 && got2.nonEmpty,
      "batch-1 deltas must be exactly the tick-2-touched (window, type) keys")
  }

  test("streaming MERGE upsert restart: one table through two drains == batch argmax; a retried batch is a no-op") {
    // q_stream_merge's crash story: the same COW table and checkpoint
    // through a tick-boundary restart must land on the per-user argmax,
    // and RE-MERGING an already-applied batch (a foreachBatch retry)
    // must leave the committed state bit-identical — idempotence comes
    // from the monotone match condition, not replay bookkeeping.
    val rocks = rocksSession()
    graft.operators.RowLevelOps.ensureCatalog(rocks)
    val raw = StreamOps.eventsRawMicros(rocks, sfDir)
    val cut = raw.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong
    val tbl = s"graft_cow.spec.smerge_${System.nanoTime()}"
    rocks.sql(s"CREATE TABLE $tbl (user_id BIGINT, last_us BIGINT, " +
      "last_event_id BIGINT, last_type STRING)")
    def mergeLatest(s: org.apache.spark.sql.SparkSession,
                    src: org.apache.spark.sql.DataFrame): Unit = {
      val latest = src.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"))
            .orderBy(col("us").desc, col("event_id").desc)))
        .filter(col("rn") === 1).drop("rn")
      latest.createOrReplaceTempView("smerge_chaos_src")
      s.sql(
        s"""MERGE INTO $tbl t USING smerge_chaos_src s ON t.user_id = s.user_id
           |WHEN MATCHED AND (s.us > t.last_us OR
           |                  (s.us = t.last_us AND s.event_id >= t.last_event_id))
           |  THEN UPDATE SET last_us = s.us, last_event_id = s.event_id,
           |                  last_type = s.event_type
           |WHEN NOT MATCHED THEN
           |  INSERT (user_id, last_us, last_event_id, last_type)
           |  VALUES (s.user_id, s.us, s.event_id, s.event_type)
           |""".stripMargin): Unit
    }
    val replay = Files.createTempDirectory("graft_smerge_replay_")
    val ckpt = Files.createTempDirectory("graft_smerge_ckpt_").toString
    def drain(): Unit = {
      val q = StreamOps.eventsStream(rocks, replay.toString)
        .select(col("user_id"), expr("unix_micros(ts)").as("us"),
          col("event_id"), col("event_type"))
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          mergeLatest(batch.sparkSession, batch)
        }
        .start()
      q.awaitTermination()
    }
    arriveTick(replay, raw.filter(col("ts") <= cut), 1)
    drain()
    arriveTick(replay, raw.filter(col("ts") > cut), 2)
    drain()
    def stateNow(): Seq[(Long, Long, Long, String)] =
      rocks.sql(s"SELECT user_id, last_us, last_event_id, last_type " +
          s"FROM $tbl ORDER BY user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val afterRestart = stateNow()
    val want = raw.withColumn("us", col("ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("us"), col("event_id"), col("event_type"))
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(afterRestart == want && want.nonEmpty,
      "restarted streaming merge must equal the batch argmax")
    // The retry: re-apply tick 2 (and then tick 1, the stale half) — the
    // monotone condition must leave the state unchanged both times.
    mergeLatest(rocks, raw.filter(col("ts") > cut).withColumnRenamed("ts", "us"))
    assert(stateNow() == afterRestart, "a retried batch must be a no-op")
    mergeLatest(rocks, raw.filter(col("ts") <= cut).withColumnRenamed("ts", "us"))
    assert(stateNow() == afterRestart, "a stale batch must never regress state")
  }
}
