package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Tests for the corpus-forensics surface (Corpus.scala). Beyond the
  * driver's DuckDB hash gate, every statistic is re-derived here by an
  * independent brute-force computation on collected fixture rows (tiny at
  * sf0.001), so a bug mirrored into the oracle SQL would still be caught.
  */
class CorpusSpec extends SparkSpec {

  private lazy val docs: Array[(Long, String, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  test("q_substring_dup equals brute-force shared-run coverage") {
    val L = Corpus.SubDupL
    val toks = docs.map { case (id, t, _, _) => id -> t.split(" ", -1).toSeq }
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, ts) <- toks; i <- 0 to ts.length - L) {
      val g = ts.slice(i, i + L).mkString(" ")
      gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
    }
    val dup = gramDocs.collect { case (g, ds) if ds.size >= 2 => g }.toSet
    val expected = toks.map { case (id, ts) =>
      val covered = Array.fill(ts.length)(false)
      for (i <- 0 to ts.length - L
           if dup(ts.slice(i, i + L).mkString(" "));
           j <- i until i + L) covered(j) = true
      id -> ((ts.length.toLong, covered.count(identity).toLong))
    }.toMap
    val got = Corpus.qSubstringDup(spark, sfDir).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (n, dupToks) = expected(r.getLong(0))
      assert(r.getLong(1) == n, s"doc ${r.getLong(0)} n_toks")
      assert(r.getLong(2) == dupToks,
        s"doc ${r.getLong(0)}: got ${r.getLong(2)} want $dupToks")
      assert(r.getDouble(3) == dupToks.toDouble / n.toDouble)
    }
    // The fixture's perturbed near-duplicate families must actually light
    // this signal up — an all-zero column would mean the operator is
    // vacuous at the corpus it ships against.
    assert(got.count(_.getLong(2) > 0) > 0)
  }

  test("q_cdc_chunks equals brute-force content-defined chunking") {
    val w = Corpus.CdcW
    val weights = Array(1L, 31L, 961L, 29791L, 923521L, 28629151L,
      887503681L, 27512614111L)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chunksOf(t: String): Seq[String] = {
      val n = t.length
      val bounds = 1 +: (2 to n - w + 1).filter { i =>
        val p = (0 until w).map(j => t.charAt(i - 1 + j).toLong * weights(j)).sum
        p % Corpus.CdcDivisor == 0
      }
      bounds.zipAll(bounds.drop(1).map(_ - 1), 0, n).map {
        case (s, e) => t.substring(s - 1, e)
      }
    }
    val bySource = docs.groupBy(_._3).map { case (src, ds) =>
      val cs = ds.toSeq.flatMap(d => chunksOf(d._2))
      val uniq = cs.map(c => (md5hex(c), c.length)).distinct
      src -> ((cs.size.toLong, uniq.size.toLong,
        cs.map(_.length.toLong).sum, uniq.map(_._2.toLong).sum))
    }
    val got = Corpus.qCdcChunks(spark, sfDir).collect()
    assert(got.length == bySource.size)
    got.foreach { r =>
      val (nc, nu, tc, uc) = bySource(r.getString(0))
      assert(r.getLong(1) == nc, s"${r.getString(0)} n_chunks")
      assert(r.getLong(2) == nu, s"${r.getString(0)} n_uniq")
      assert(r.getLong(3) == tc && r.getLong(4) == uc)
      assert(r.getDouble(5) == uc.toDouble / tc.toDouble)
      // Content-defined boundaries must actually fire (not one chunk per
      // doc) and some re-served bytes must exist in a corpus with
      // near-duplicate families.
      assert(nc > ds(r.getString(0)), s"${r.getString(0)}: no boundaries cut")
      assert(uc < tc, s"${r.getString(0)}: no duplicated chunks")
    }
  }

  private lazy val ds: Map[String, Long] =
    docs.groupBy(_._3).view.mapValues(_.length.toLong).toMap

  test("q_ttr equals brute-force type/token/hapax counts") {
    val expected = docs.groupBy(_._3).map { case (src, rows) =>
      val all = rows.toSeq.flatMap(_._2.split(" ", -1))
      val counts = all.groupBy(identity).view.mapValues(_.size).toMap
      src -> ((all.size.toLong, counts.size.toLong,
        counts.count(_._2 == 1).toLong))
    }
    val got = Corpus.qTtr(spark, sfDir).collect()
    got.foreach { r =>
      val (tok, typ, hap) = expected(r.getString(0))
      assert(r.getLong(1) == tok && r.getLong(2) == typ && r.getLong(3) == hap,
        s"${r.getString(0)}: got (${r.getLong(1)},${r.getLong(2)},${r.getLong(3)}) want ($tok,$typ,$hap)")
      assert(r.getDouble(4) == typ.toDouble / tok.toDouble)
      assert(r.getDouble(5) == hap.toDouble / typ.toDouble)
    }
  }

  test("q_fertility equals brute-force piece/word counts per lang") {
    val re = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9 ]")
    val expected = docs.groupBy(_._4).map { case (lang, rows) =>
      val words = rows.map(_._2.split(" ", -1).length.toLong).sum
      val pieces = rows.map { r =>
        val m = re.matcher(r._2); var c = 0L; while (m.find()) c += 1; c
      }.sum
      val chars = rows.map(_._2.length.toLong).sum
      lang -> ((words, pieces, chars))
    }
    val got = Corpus.qFertility(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (wds, pcs, chs) = expected(r.getString(0))
      assert(r.getLong(1) == wds && r.getLong(2) == pcs && r.getLong(3) == chs)
      assert(r.getDouble(4) == pcs.toDouble / wds.toDouble)
      assert(r.getDouble(5) == chs.toDouble / pcs.toDouble)
    }
  }

  test("q_kn_bigram matches brute force and its mass sums to 1 per history") {
    val bigrams = docs.toSeq.flatMap { case (_, t, _, _) =>
      val ts = t.split(" ", -1); ts.dropRight(1).zip(ts.drop(1))
    }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nfw = c12.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val nbw = c12.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val t = c12.size.toLong
    val d = Corpus.KnD
    def pkn(w1: String, w2: String): Double =
      ((c12((w1, w2)).toDouble - d) / c1(w1).toDouble) +
        ((d * nfw(w1).toDouble) / c1(w1).toDouble) *
          (nbw(w2).toDouble / t.toDouble)
    val got = Corpus.qKnBigram(spark, sfDir).collect()
    assert(got.length == 20)
    val handTop = c12.keys.toSeq
      .map { case (w1, w2) => (w1, w2, pkn(w1, w2)) }
      .sortBy { case (w1, w2, p) => (-p, w1, w2) }.take(20)
    got.zip(handTop).foreach { case (r, (w1, w2, p)) =>
      assert(r.getString(0) == w1 && r.getString(1) == w2,
        s"rank order: got (${r.getString(0)},${r.getString(1)}) want ($w1,$w2)")
      assert(r.getLong(2) == c12((w1, w2)))
      assert(math.abs(r.getDouble(3) - p) < 1e-15)
    }
    // Kneser-Ney mass identity: for any observed history w1, the observed
    // terms plus the backoff mass over the FULL continuation vocabulary
    // sum to exactly 1 — the property that distinguishes a correctly
    // interpolated model from an ad-hoc score.
    val w1 = handTop.head._1
    val observed = c12.keys.collect { case (a, b) if a == w1 => b }
    val mass = observed.toSeq.sorted.map(pkn(w1, _)).sum +
      (d * nfw(w1).toDouble / c1(w1).toDouble) *
        ((t - observed.map(nbw).sum).toDouble / t.toDouble)
    assert(math.abs(mass - 1.0) < 1e-9, s"KN mass for '$w1': $mass")
  }

  test("q_ngram_coverage equals brute-force head mass and is monotone") {
    val counts = docs.toSeq
      .flatMap { case (_, t, _, _) =>
        val ts = t.split(" ", -1)
        (0 to ts.length - 3).map(i => ts.slice(i, i + 3).mkString(" "))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val ranked = counts.toSeq.sortBy { case (g, n) => (-n, g) }
    val got = Corpus.qNgramCoverage(spark, sfDir).collect()
    assert(got.length == Corpus.CoverageKs.length)
    got.foreach { r =>
      val k = r.getLong(0).toInt
      val top = ranked.take(k).map(_._2).sum
      assert(r.getLong(1) == top && r.getLong(2) == total)
      assert(r.getDouble(3) == top.toDouble / total.toDouble)
    }
    // Monotone in k, and the head must carry REAL mass on this corpus.
    val shares = got.sortBy(_.getLong(0)).map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last > 0.01)
  }

  test("q_train_split equals the brute-force hash assignment and covers every language") {
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    def splitOf(id: Long): String = {
      val b = bucket(id)
      if (b < Corpus.SplitTrainPct) "train"
      else if (b < Corpus.SplitValPct) "val" else "test"
    }
    val expected = docs.groupBy(r => (r._4, splitOf(r._1)))
      .map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_._2.length.toLong).sum))
      }
    val langTotals = docs.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val got = Corpus.qTrainSplit(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nd, nc) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == nd, s"(${r.getString(0)},${r.getString(1)})")
      assert(r.getLong(3) == nc)
      assert(r.getDouble(4) ==
        nd.toDouble / langTotals(r.getString(0)).toDouble)
    }
    // Every language must have a train split, and the assignment must be
    // a real partition (shares per language sum to 1).
    val langs = docs.map(_._4).distinct
    assert(langs.forall(l =>
      got.exists(r => r.getString(0) == l && r.getString(1) == "train")))
    langs.foreach { l =>
      val s = got.filter(_.getString(0) == l).map(_.getDouble(4)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"$l shares sum $s")
    }
  }

  test("q_quantile_merge replays the summary merge and honors the 1/Q rank bound") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val q = Corpus.QmergeQ
    val bySrc = docs.groupBy(_._1)
    val summary = bySrc.toSeq.flatMap { case (s, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val n = sorted.length.toLong
      (1 to q).map { j =>
        val rank = ((j * n + q - 1) / q).toInt
        (sorted(rank - 1)._2, s, j, n)
      }
    }.sortBy { case (v, s, j, _) => (v, s, j) }
    val nTotal = docs.length.toLong
    val got = Corpus.qQuantileMerge(spark, sfDir).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val p4 = r.getLong(0)
      var cum = 0L
      var est = Long.MaxValue
      summary.foreach { case (v, _, _, wt) =>
        cum += wt
        if (cum * 4 >= p4 * q * nTotal && v < est) est = v
      }
      // min v among qualifying = first qualifying in sorted order
      cum = 0L
      val qualifying = summary.map { case (v, _, _, wt) => cum += wt; (v, cum) }
        .filter { case (_, c) => c * 4 >= p4 * q * nTotal }.map(_._1)
      assert(r.getLong(1) == qualifying.min, s"est at p4=$p4")
      val sortedAll = docs.map(_._2).sorted
      val exact = sortedAll(
        (((p4 * nTotal + 3) / 4).toInt - 1).max(0))
      assert(r.getLong(2) == exact, s"exact disc at p4=$p4")
      val nLe = docs.count(_._2 <= r.getLong(1)).toLong
      assert(r.getLong(3) == nLe)
      assert(r.getDouble(4) ==
        math.abs(nLe * 4 - p4 * nTotal).toDouble / (nTotal * 4).toDouble)
      // the merge theorem: rank error of a Q-point equi-rank summary
      // merge is bounded by 1/Q of the population
      assert(r.getDouble(4) <= 1.0 / q.toDouble,
        s"rank error ${r.getDouble(4)} above 1/Q")
    }
  }

  test("q_simpson equals brute-force Simpson concentration per source") {
    val bySrc = docs.groupBy(_._3)
    val expected = bySrc.toSeq.sortBy(_._1).map { case (s, rows) =>
      val toks = rows.flatMap(_._2.split(" ", -1))
      val counts = toks.groupBy(identity).map(_._2.size.toLong)
      val n = counts.sum
      val types = counts.size.toLong
      val sumCc = counts.map(c => c * (c - 1)).sum
      val simpson = sumCc.toDouble / (n * (n - 1)).toDouble
      (s, n, types, sumCc, simpson)
    }
    val got = Corpus.qSimpson(spark, sfDir).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (s, n, types, sumCc, simpson)) =>
      assert(r.getString(0) == s)
      assert(r.getLong(1) == n, s"$s n_tokens")
      assert(r.getLong(2) == types, s"$s n_types")
      assert(r.getLong(3) == sumCc, s"$s sum_cc")
      assert(r.getDouble(4) == simpson, s"$s simpson")
      assert(r.getDouble(5) == 1.0 - simpson, s"$s gini_simpson")
      // a without-replacement same-type probability is a proper one
      assert(simpson >= 0.0 && simpson <= 1.0)
    }
    // repeated tokens exist in every source, so concentration is
    // strictly positive - the statistic is non-vacuous on the fixture
    assert(got.forall(_.getLong(3) > 0L))
  }

  test("q_dataset_card equals the brute-force datasheet") {
    val rows = Tables.documents(spark, sfDir)
      .select(col("source"), col("lang"), col("n_chars"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val nDocs = rows.length.toLong
    val toks = rows.map(_._4.split(" ", -1).length.toLong)
    val totalTokens = toks.sum
    val nShort = toks.count(_ < 10L).toLong
    val prefDup = rows.map(_._4.take(16)).groupBy(identity)
      .map(_._2.size.toLong).filter(_ >= 2L).sum
    val (topLang, topDocs) = rows.groupBy(_._2).view
      .mapValues(_.size.toLong).toSeq
      .minBy { case (l, c) => (-c, l) }
    val r = Corpus.qDatasetCard(spark, sfDir).collect() match {
      case Array(one) => one
      case other      => fail(s"expected 1 row, got ${other.length}")
    }
    assert(r.getLong(0) == nDocs)
    assert(r.getLong(1) == rows.map(_._1).distinct.length.toLong)
    assert(r.getLong(2) == rows.map(_._2).distinct.length.toLong)
    assert(r.getLong(3) == totalTokens)
    assert(r.getLong(4) == rows.map(_._3).sum)
    assert(r.getDouble(5) == totalTokens.toDouble / nDocs.toDouble)
    assert(r.getDouble(6) == nShort.toDouble / nDocs.toDouble)
    assert(r.getDouble(7) == prefDup.toDouble / nDocs.toDouble)
    assert(r.getString(8) == topLang)
    assert(r.getDouble(9) == topDocs.toDouble / nDocs.toDouble)
    // the near-dup families share 64-char prefixes, so the cheap
    // boilerplate smell must be non-vacuous on the fixture
    assert(prefDup > 0L)
  }
}
