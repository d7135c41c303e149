package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (the [[CatScanProbe]] pattern) pricing the round-18
  * equality-delete KEY-RANGE PRUNING: a table whose churn concentrates
  * in a hot key range (monotonic ids — the common stream) should make
  * its COLD files free of delete work entirely — no delete-file load,
  * no per-row key-set probe, the UNFILTERED columnar path — while only
  * the hot files pay. The probe builds `nCold` cold files plus one hot
  * file with DISJOINT long-key ranges, lands `epochs` keyed upsert
  * commits inside the hot range only, then times a full-table aggregate
  * with pruning on (default) vs off (`-Dgraft.cow.eqprune=false` —
  * every file probes every entry, the pre-round-18 behavior).
  *
  * Run: `sbt "runMain graft.EqPruneProbe [rowsPerFile] [nCold] [cpus]
  * [long|string]"`; one JSON line. Findings land in BASELINE.md.
  * The `string` mode (round 19) keys the table by zero-padded ASCII
  * document-id strings — the dedup-pipeline norm — exercising the
  * strMin/strMax entry ranges against write-time strRanges.
  */
object EqPruneProbe {
  def main(args: Array[String]): Unit = {
    val rowsPerFile = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nCold = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = args.lift(2).map(_.toInt).getOrElse(32)
    val stringKey = args.lift(3).contains("string")
    val epochs = 4
    val churn = 100000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.RowLevelOps.ensureCatalog(spark)

    val name = "eqpruneprobe"
    val tbl = s"graft_cow.ops.$name"
    val idType = if (stringKey) "STRING" else "BIGINT"
    // 19-digit zero-padding keeps ASCII order == numeric order, so the
    // string mode's file ranges are disjoint exactly like the long
    // mode's.
    def sid(expr: String): String =
      if (stringKey) s"concat('k', lpad(CAST($expr AS STRING), 19, '0'))"
      else expr
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (id $idType NOT NULL, v BIGINT) " +
      "TBLPROPERTIES ('graft.mode'='mor', 'graft.delete-key'='id')")
    // nCold cold files + 1 hot file, disjoint consecutive id ranges.
    for (i <- 0 to nCold) {
      val lo = i * rowsPerFile
      spark.sql(s"INSERT INTO $tbl SELECT ${sid("id")}, id FROM " +
        s"range($lo, ${lo + rowsPerFile}, 1, 1)")
    }
    val hotLo = nCold * rowsPerFile
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("ops"), name)
    // Hot-range churn: epochs keyed upsert entries, all inside the hot
    // file's range.
    def keyOf(k: Long): String =
      if (stringKey) "k" + ("%019d".format(k)) else k.toString
    for (e <- 1 to epochs) {
      val keys = (0L until churn)
        .map(k => hotLo + (k * epochs + e) % rowsPerFile)
        .distinct.map(keyOf).toVector
      graft.sources.CowStore.commitDeltaEq("graft_cow", ident,
        Seq.empty, Map.empty, keys)
    }
    val st = graft.sources.CowStore.get("graft_cow", ident).get
    println(s"[eq-prune] ${st.files.size} files x $rowsPerFile rows, " +
      s"${st.snapshot.eqDeletes.map(_.count).sum} live keys in " +
      s"${st.snapshot.eqDeletes.size} entries (hot range only)")

    def time(side: String): Double = {
      def run(): Unit =
        spark.sql(s"SELECT sum(v), count(*) FROM $tbl").collect(): Unit
      run() // warmup: codegen + delete-file cache load off the clock
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      println(f"[eq-prune] $side%-10s ${med}%7.3f s")
      med
    }
    // A-B-A ordering: JIT keeps warming across sides, so a single
    // A-then-B read is biased toward whichever ran second — the final
    // pruned leg is the comparable number.
    val pruned1 = time("pruned")
    sys.props("graft.cow.eqprune") = "false"
    val full = time("unpruned")
    sys.props.remove("graft.cow.eqprune")
    val pruned = time("pruned2")
    println(s"""{"metric":"eq_prune_scan","key_type":"${if (stringKey) "string" else "long"}","rows_per_file":$rowsPerFile,""" +
      s""""cold_files":$nCold,"live_keys":${st.snapshot.eqDeletes.map(_.count).sum},""" +
      s""""pruned_first_s":$pruned1,"unpruned_s":$full,"pruned_s":$pruned,""" +
      s""""speedup":${full / pruned}}""")
    spark.sql(s"DROP TABLE $tbl")
    spark.stop()
  }
}
