package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-forensics operators over `documents` — the round-10 additions to
  * the LLM-data-pipeline family (SURVEY.md §2f): exact shared-substring
  * duplication coverage, content-defined chunking dedup, lexical-diversity
  * and tokenizer-fertility profiling, and a Kneser-Ney smoothed bigram
  * model. The reference has no text analytics at all (its only string
  * handling renders insights, /root/reference/app.py:206-218); these are
  * the corpus-audit queries a training-data pipeline runs between ingest
  * and sampling.
  *
  * Determinism contract (the driver's hash gate): every statistic is
  * assembled from EXACT integer counts; every double is produced by a
  * pinned sequence of +,-,*,/ mirrored literally in the oracle SQL; chunk
  * identity is `md5` (bit-identical across engines); no RNG, no
  * engine-specific hash.
  *
  * Scale design (100 TB): every per-document step here is a per-row array
  * expression inside the scan projection (codegen, no shuffle); the only
  * shuffles are hash-aggregations on n-gram / chunk-hash / token keys,
  * all map-side-partial-aggregated. Nothing materializes per-position
  * rows except the n-gram posting explode, which is the same inverted-
  * index shape as [[TextOps]]' shingle pipeline (hot-key caps documented
  * there apply unchanged).
  */
object Corpus {

  // ---------------------------------------------------------------------
  // q_substring_dup — exact shared-substring duplication coverage
  // ---------------------------------------------------------------------

  /** Shared-run length, in tokens. Lee et al. (2022, "Deduplicating
    * Training Data Makes Language Models Better") use 50 BPE tokens over
    * a suffix array; at the fixture's ~40-token documents the same
    * statistic is meaningful at 8.
    */
  val SubDupL = 8

  /** q_substring_dup — per-document EXACT duplicated-substring coverage:
    * the fraction of token positions covered by some length-[[SubDupL]]
    * token run that also appears verbatim in at least one OTHER document.
    * This is the exact-substring dedup statistic of Lee et al. (2022) —
    * the signal that catches verbatim boilerplate MinHash's whole-doc
    * similarity dilutes away — re-expressed relationally: the suffix
    * array they build is a single-machine data structure; the distributed
    * equivalent is the n-gram inverted index (posting = (gram, doc, pos)),
    * a duplicated-gram filter, and a per-document interval union.
    *
    * Plan shape: gram generation is one per-row `transform` over the
    * token array (Generate — no shuffle); the posting aggregation
    * shuffles gram keys once (map-side partials); the interval union is
    * a per-document window over ONLY the duplicated positions (dup
    * postings, not all postings). At 100 TB the gram key becomes a
    * 64-bit hash instead of the literal text (the oracle-parity build
    * keeps the text so both engines group identically) and pathological
    * grams get the same df-cap guard as [[TextOps]]' hot-shingle path.
    *
    * Determinism: covered-token counts are exact integers from the
    * classic sweep (running max of span ends); the single division is
    * pinned.
    */
  def qSubstringDup(spark: SparkSession, d: String): DataFrame = {
    val L = SubDupL
    val toks = documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n_toks"))
    // The posting build (token-array slices + array_join per position) is
    // the query's expensive subtree and has TWO consumers — the
    // duplicated-gram aggregate and the span join back onto positions —
    // so it is computed once per invocation ([[graft.Tables
    // .cacheForSelfJoin]], the q_ngram_jaccard discipline): measured
    // 1.84 s → 1.59 s at sf0.1. In production this is the materialized
    // posting table the Lee et al. pipeline writes before the dedup scan.
    val grams = graft.Tables.cacheForSelfJoin(toks
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(toks) >= $L
           |THEN transform(sequence(1, size(toks) - ${L - 1}),
           |       i -> struct(CAST(i AS BIGINT) AS pos,
           |                   array_join(slice(toks, i, $L), ' ') AS gram))
           |ELSE CAST(array() AS ARRAY<STRUCT<pos: BIGINT, gram: STRING>>)
           |END""".stripMargin)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram")))
    val dupGrams = grams
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("gram"))
    val spans = grams.join(dupGrams, "gram")
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + lit(L - 1)).as("e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val covered = spans
      .withColumn("pmax", max(col("e")).over(w))
      .select(col("doc_id"),
        greatest(lit(0L),
          col("e") - greatest(col("s"), coalesce(col("pmax") + 1, col("s"))) + 1)
          .as("cov"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cov")).as("dup_toks"))
    toks.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("dup_toks"), lit(0L)).as("dup_toks"),
        (coalesce(col("dup_toks"), lit(0L)).cast("double") /
          col("n_toks").cast("double")).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q_cdc_chunks — content-defined chunking dedup
  // ---------------------------------------------------------------------

  /** Rolling-window width (chars) and boundary divisor: a cut lands where
    * the window hash ≡ 0 (mod [[CdcDivisor]]), so the EXPECTED chunk is
    * ~64 chars — the LBFS recipe (Muthitacharoen et al. 2001) scaled to
    * the fixture's ~150-400-char documents.
    */
  val CdcW = 8
  val CdcDivisor = 64

  /** Positional weights 31^j, j=0..7 — exact int64 literals so the window
    * hash is a pure integer polynomial both engines compute identically
    * (max value ≈ 3.5·10¹², far inside int64).
    */
  private val cdcWeights: Seq[Long] =
    Seq(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)

  /** Window polynomial over a PRE-MATERIALIZED char-code array `csCol`
    * (see [[qCdcChunks]]): `element_at` on an array is O(1), where the
    * previous `ascii(substr(text, i+j, 1))` formulation cost O(i) per
    * probe (UTF8String.substring walks from the front because UTF-8 is
    * variable-width) — 8 probes × n positions × O(n) walk = O(n²) per
    * document, the round-10 bench's one >5 s query (14.05 s → ~O(n)).
    */
  private def cdcPoly(csCol: String, posVar: String): String =
    cdcWeights.zipWithIndex.map { case (wgt, j) =>
      s"element_at($csCol, CAST($posVar AS INT) + $j) * ${wgt}L"
    }.mkString(" + ")

  /** q_cdc_chunks — content-defined chunking dedup per source: split every
    * document at positions where an 8-char rolling polynomial hash ≡ 0
    * (mod 64) — boundaries defined by CONTENT, so an insertion early in a
    * document shifts only the chunk it lands in, not every later boundary
    * (the property fixed-size chunking lacks, and the reason CDC is the
    * storage-dedup standard: LBFS, restic, borg, Data Domain). Chunks are
    * identified by md5; per source the query reports chunk count, distinct
    * chunk count, total vs distinct chunk bytes, and the dedup ratio —
    * the "how much of this feed is re-served bytes" capacity readout.
    *
    * Plan shape: boundary detection AND chunk extraction are per-row
    * array expressions (filter/transform over a char-position sequence —
    * codegen inside the scan projection, no per-position rows ever
    * shuffle); only (source, chunk-hash, len) rows reach the two
    * hash-aggregations. The char-code array is materialized ONCE per row
    * so the rolling window is O(1) per position (O(n) per document, not
    * the O(n²) an ascii(substr(text, i, 1)) probe chain costs on
    * variable-width UTF-8). At 100 TB the md5 becomes xxhash64 and the
    * chunk-hash agg is the only corpus-sized shuffle — bytes never move.
    *
    * Determinism: the polynomial is exact int64; chunk spans are integer
    * arithmetic; md5 is bit-identical across engines; the single double
    * division is pinned.
    */
  def qCdcChunks(spark: SparkSession, d: String): DataFrame = {
    val poly = cdcPoly("cs", "i")
    val chunks = documents(spark, d)
      .select(col("source"), col("text"),
        length(col("text")).cast("long").as("n"))
      // One O(n) pass materializes the char-code array; every window
      // probe below is then an O(1) element_at. Same int64 values as the
      // old ascii(substr(..)) form, so chunk boundaries — and therefore
      // md5 chunk identities — are bit-identical to the DuckDB oracle.
      .withColumn("cs",
        expr("transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))"))
      .withColumn("b", expr(
        s"""concat(array(CAST(1 AS BIGINT)),
           |  CASE WHEN n >= ${CdcW + 1}
           |  THEN filter(sequence(CAST(2 AS BIGINT), n - ${CdcW - 1}),
           |         i -> ($poly) % $CdcDivisor = 0)
           |  ELSE CAST(array() AS ARRAY<BIGINT>) END)""".stripMargin))
      .select(col("source"), col("text"), col("n"), explode(expr(
        """transform(sequence(1, size(b)),
          |  k -> struct(element_at(b, CAST(k AS INT)) AS s,
          |              CASE WHEN k < size(b)
          |                   THEN element_at(b, CAST(k + 1 AS INT)) - 1
          |                   ELSE n END AS e))""".stripMargin)).as("c"))
      .select(col("source"),
        md5(expr("substr(text, CAST(c.s AS INT), CAST(c.e - c.s + 1 AS INT))"))
          .as("h"),
        (col("c.e") - col("c.s") + 1).as("clen"))
    // ONE corpus pass: per-(source, h, clen) copy counts (the distinct
    // chunk identities — the oracle's SELECT DISTINCT groups), then a
    // source-sized roll-up derives BOTH the total and the distinct
    // statistics. The previous totals ⋈ uniques formulation referenced
    // `chunks` twice, re-reading and re-chunking the whole corpus.
    chunks.groupBy(col("source"), col("h"), col("clen"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_uniq"),
        sum(col("n") * col("clen")).as("total_chars"),
        sum(col("clen")).as("uniq_chars"))
      .select(col("source"), col("n_chunks"), col("n_uniq"),
        col("total_chars"), col("uniq_chars"),
        (col("uniq_chars").cast("double") / col("total_chars").cast("double"))
          .as("dedup_ratio"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------------
  // q_ttr — lexical diversity (type-token ratio + hapax share)
  // ---------------------------------------------------------------------

  /** q_ttr — per-source lexical diversity: token count, type (distinct
    * token) count, type-token ratio, hapax count (types occurring exactly
    * once in the source) and hapax share of types. Low TTR or a thin
    * hapax tail marks templated/boilerplate feeds (the Gopher/C4 rules
    * gate on exactly this kind of repetitiveness at the document level —
    * [[TextOps]]' q_repetition; this is the FEED-level roll-up a
    * curation pipeline ranks sources by).
    *
    * Plan: one tokenize-explode, one (source, token) count aggregation
    * (map-side partials), then a source-sized roll-up — the token
    * shuffle is the only corpus-sized stage. All-integer, two pinned
    * divisions.
    */
  def qTtr(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("n_hapax").cast("double") / col("n_types").cast("double"))
          .as("hapax_share"))
      .orderBy(col("source"))

  // ---------------------------------------------------------------------
  // q_fertility — tokenizer fertility by language
  // ---------------------------------------------------------------------

  /** q_fertility — tokenizer fertility per language: BPE-ish pieces per
    * whitespace word and chars per piece, using the same piece regex as
    * [[TextOps.qTokenBpe]]. Fertility is THE number a multilingual
    * pipeline checks before fixing a token budget per language (a
    * language at fertility 2× costs 2× the compute per word — the
    * mT5/XGLM papers tabulate exactly this); here it also cross-checks
    * the corpus: synthetic English-ish text should read ≈ 1 piece/word.
    *
    * Plan: per-row `size(regexp_extract_all)` + `size(split)` inside the
    * scan projection — the corpus is read ONCE and only (lang, 3 longs)
    * rows reach the aggregation. All-integer, two pinned divisions.
    */
  def qFertility(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("words"),
        expr("CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT)")
          .as("pieces"),
        col("n_chars"))
      .groupBy(col("lang"))
      .agg(sum(col("words")).as("n_words"),
        sum(col("pieces")).as("n_pieces"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_pieces"), col("n_chars"),
        (col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("chars_per_piece"))
      .orderBy(col("lang"))

  // ---------------------------------------------------------------------
  // q_kn_bigram — interpolated Kneser-Ney bigram model
  // ---------------------------------------------------------------------

  /** Absolute discount D. 0.75 is the standard Chen-Goodman fixed
    * discount; since every observed bigram has count ≥ 1 > D, the
    * max(c−D, 0) clamp never binds and the score is a clean pinned
    * arithmetic chain.
    */
  val KnD = 0.75

  /** q_kn_bigram — interpolated Kneser-Ney bigram probabilities, top-20:
    * P(w2|w1) = (c(w1w2) − D)/c(w1·) + (D·N₁₊(w1·)/c(w1·)) · N₁₊(·w2)/T,
    * where N₁₊(w1·)/N₁₊(·w2) are distinct-continuation counts and T the
    * bigram-type count — the smoothing that made n-gram LMs competitive
    * (Kneser-Ney 1995; Chen-Goodman 1999) and, in a data pipeline, the
    * cheap in-domain LM whose per-document cross-entropy drives
    * perplexity-based quality filtering ([[TextOps]]' q_ppl_buckets uses
    * a unigram band; this is the bigram upgrade with the zero-count mass
    * handled properly instead of add-one).
    *
    * Plan: ONE bigram explode (zip_with of two slices — per-row, no
    * shuffle) feeding one (w1,w2) count aggregation; every other relation
    * is derived from that count table (w1-grain, w2-grain, one 1-row
    * type-count broadcast) — the corpus is scanned once and shuffled
    * once at bigram grain, exactly how KenLM's distributed counting
    * stage works.
    *
    * Determinism: all counts exact integers; the probability is ONE
    * pinned parenthesization ((c12−D)/c1 + ((D·nfw)/c1)·(nbw/T)) both
    * engines evaluate literally; top-20 ordered (pkn desc, w1, w2).
    */
  def qKnBigram(spark: SparkSession, d: String): DataFrame = {
    val bg = documents(spark, d)
      .select(explode(expr(
        """zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
          |         slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
          |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val left = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("nfw"))
    val right = c12.groupBy(col("w2")).agg(count(lit(1)).as("nbw"))
    val types = c12.agg(count(lit(1)).as("t"))
    c12.join(left, "w1").join(right, "w2").crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c12"),
        (((col("c12").cast("double") - lit(KnD)) / col("c1").cast("double")) +
          ((lit(KnD) * col("nfw").cast("double")) / col("c1").cast("double")) *
            (col("nbw").cast("double") / col("t").cast("double"))).as("pkn"))
      .orderBy(col("pkn").desc, col("w1"), col("w2"))
      .limit(20)
  }

  // ---------------------------------------------------------------------
  // q_ngram_coverage — head-domination of the 3-gram distribution
  // ---------------------------------------------------------------------

  /** Cut depths of [[qNgramCoverage]]'s coverage curve. */
  val CoverageKs: Seq[Int] = Seq(10, 100, 1000)

  /** q_ngram_coverage — head-domination curve of the corpus 3-gram
    * distribution: for K ∈ {10, 100, 1000}, the share of ALL 3-gram
    * occurrences covered by the top-K most frequent 3-grams. A corpus
    * whose top-1000 trigrams carry most of the mass is template/
    * boilerplate-dominated (navigation chrome, legal footers) — the
    * feed-level readout that complements [[qTtr]]'s type diversity and
    * [[TextOps]]' per-document repetition gate, and the number that
    * predicts how much [[qSubstringDup]] will find before running it.
    *
    * Plan: ONE trigram explode + count agg (map-side partials — the only
    * corpus-sized stage); each K-cut is a TakeOrderedAndProject HEAP +
    * 1-row sum over K rows — never a global sort of the vocabulary (the
    * honest at-scale shape: a rank window over the vocab would funnel it
    * through one task). All-integer, one pinned division per row.
    */
  def qNgramCoverage(spark: SparkSession, d: String): DataFrame = {
    // cacheEager, not the lazy self-join cache: the vocabulary tier has
    // FOUR concurrent readers in the final DAG (the total mass + three
    // K-cut branches), and concurrent FIRST readers of a lazy cache
    // entry each recompute its plan (the q_kcore lesson recorded on
    // [[graft.Tables.cacheEager]]). Measured 2.20 s → 1.95 s at sf0.1.
    val counts = graft.Tables.cacheEager(
      documents(spark, d)
        .select(explode(expr(
          """CASE WHEN size(split(text, ' ')) >= 3
            |THEN transform(sequence(1, size(split(text, ' ')) - 2),
            |       i -> array_join(slice(split(text, ' '), i, 3), ' '))
            |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("n")))
    val total = counts.agg(sum(col("n")).as("total_mass"))
    CoverageKs.map { k =>
      counts.orderBy(col("n").desc, col("g")).limit(k)
        .agg(sum(col("n")).as("top_mass"))
        .select(lit(k.toLong).as("k"), col("top_mass"))
    }.reduce(_ unionAll _)
      .crossJoin(broadcast(total))
      .select(col("k"), col("top_mass"), col("total_mass"),
        (col("top_mass").cast("double") / col("total_mass").cast("double"))
          .as("share"))
      .orderBy(col("k"))
  }

  // ---------------------------------------------------------------------
  // q_train_split — deterministic hash split with per-language audit
  // ---------------------------------------------------------------------

  /** Percent cuts of [[qTrainSplit]]: buckets 0–89 train, 90–94 val,
    * 95–99 test.
    */
  val SplitTrainPct = 90
  val SplitValPct = 95

  /** q_train_split — the DETERMINISTIC train/val/test assignment every
    * training-data pipeline makes, audited per language: each document
    * lands in a split by key-hash bucket (md5(doc_id) mod 100 →
    * 90/5/5), so the assignment is reproducible across runs, engines
    * and partitionings, stratifiable for free, and content-independent
    * (assign by DOCUMENT IDENTITY, then dedup/decontaminate ACROSS
    * splits — [[TextOps]]' q_split_leakage is the audit that catches
    * near-dup pairs straddling the cut this query makes). `df.sample`/
    * `randomSplit` draw per-partition RNG streams — unreproducible
    * under AQE/repartition, and a re-run reassigns documents; hash-mod
    * is the production answer ([[graft.operators.Analytics
    * .qSampleHash]]'s contract, extended to a partition of the corpus).
    *
    * Output: per (lang, split) document/char counts and the within-
    * language share — the imbalance check (a language whose val split
    * went empty) read before training starts.
    */
  def qTrainSplit(spark: SparkSession, d: String): DataFrame = {
    val bucket = expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100")
    documents(spark, d)
      .select(col("lang"), col("n_chars"),
        when(bucket < SplitTrainPct, "train")
          .when(bucket < SplitValPct, "val")
          .otherwise("test").as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn("lang_docs",
        sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))))
      .select(col("lang"), col("split"), col("n_docs"), col("n_chars"),
        (col("n_docs").cast("double") / col("lang_docs").cast("double"))
          .as("share"))
      .orderBy(col("lang"), col("split"))
  }

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  /** Summary size (points per source) for [[qQuantileMerge]]. */
  val QmergeQ = 32

  /** q_quantile_merge — MERGEABLE quantile summaries with an exact rank
    * audit: each source condenses its n_chars distribution into
    * [[QmergeQ]] equi-rank summary points (the j-th point is the
    * ceil(j·n/Q)-th order statistic, carrying weight n), the per-source
    * summaries merge by weighted cumulative rank, and the merged
    * quartile estimates are audited against the TRUE global quartiles
    * plus their exact rank error. This is the distributed-systems
    * primitive under every approximate-quantile implementation
    * (t-digest, GK, Spark's own approxQuantile): shards ship Q values
    * each — not raw data — and a coordinator merges; the audit row is
    * what tells you Q is big enough for your SLA before you trust it
    * on a 100 TB column.
    *
    * Determinism: summary selection, merge thresholds (4·cumw ≥
    * p·Q·N) and both rank audits are ALL-INTEGER (no interpolation —
    * disc semantics end to end, the [[Analytics]] percentile_disc
    * convention); the only double is the final error-share division.
    *
    * Plan: per-source rank windows (source-partitioned), the merged
    * summary is |sources|·Q rows (the bounded-window stance for its
    * ONE unpartitioned cumsum), and the true quartiles come from the
    * VALUE HISTOGRAM cumsum — never a global row sort. Every stage
    * after the two first-pass aggregates is domain-sized.
    */
  def qQuantileMerge(spark: SparkSession, d: String): DataFrame = {
    val docs = documents(spark, d)
      .select(col("source"), col("n_chars"), col("doc_id"))
    // sizes and hist are each consumed twice, but their duplicated
    // subtrees sit under identical agg exchanges — ReuseExchange dedups
    // them at runtime (caching measured slower; see the scan-audit note
    // in ScanAuditSpec).
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val total = sizes.agg(sum(col("n_s")).as("n_total"))
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    val summary = docs
      .withColumn("rn", row_number().over(wSrc))
      .join(sizes, "source")
      .select(col("source"), col("n_chars"), col("rn"), col("n_s"),
        explode(sequence(lit(1), lit(QmergeQ))).as("j"))
      .filter(expr(s"(j * n_s + ${QmergeQ - 1}) DIV $QmergeQ") === col("rn"))
      .select(col("source"), col("j"), col("n_chars").as("v"),
        col("n_s").as("wt"))
    val wAll = Window.orderBy(col("v"), col("source"), col("j"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = summary.withColumn("cumw", sum(col("wt")).over(wAll))
    val quartiles = cum.crossJoin(broadcast(total))
      .select(col("v"), col("cumw"), col("n_total"),
        explode(sequence(lit(1), lit(3))).as("p4"))
      .filter(col("cumw") * 4L >= col("p4") * lit(QmergeQ.toLong) * col("n_total"))
      .groupBy(col("p4")).agg(min(col("v")).as("est_merged"))
    val hist = docs.groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val exact = hist.crossJoin(broadcast(total))
      .select(col("v"), col("cum"), col("n_total"),
        explode(sequence(lit(1), lit(3))).as("p4"))
      .filter(col("cum") * 4L >= col("p4") * col("n_total"))
      .groupBy(col("p4")).agg(min(col("v")).as("exact_disc"))
    quartiles.join(exact, "p4")
      .join(hist.select(col("v").as("est_merged"), col("cum").as("n_le_est")),
        "est_merged")
      .crossJoin(broadcast(total))
      .select(col("p4").cast("long").as("p4"), col("est_merged"),
        col("exact_disc"), col("n_le_est"),
        (abs(col("n_le_est") * 4L - col("p4") * col("n_total")).cast("double") /
          (col("n_total") * 4L).cast("double")).as("rank_err_share"))
      .orderBy(col("p4"))
  }

  /** q_simpson — Simpson concentration / Gini–Simpson diversity of each
    * source's token distribution, with the unbiased finite-sample form
    * λ̂ = Σc(c−1)/(N(N−1)) (Simpson 1949): the probability two tokens
    * drawn WITHOUT replacement are the same type. 1−λ̂ is the
    * Gini–Simpson diversity a curation dashboard tracks next to
    * [[qTtr]]'s type-token ratio — TTR measures vocabulary SIZE, this
    * measures vocabulary CONCENTRATION (a boilerplate feed repeating
    * ten templates scores high λ̂ at any vocabulary size), and unlike
    * entropy ([[graft.operators.TextOps]] q_entropy_by_source) it
    * needs no logarithm — the whole statistic is integer arithmetic
    * until one final division, so the gate is hash-exact with no libm
    * anywhere.
    *
    * Plan: one token explode → (source, token) count agg (map-side
    * partial — the corpus-sized stage), then a |vocab|-sized agg to
    * per-source moments; both Σc(c−1) and N(N−1) are exact BIGINTs
    * (bounded by N² ≤ 10¹⁸ at ~10⁹ tokens/source — the documented
    * DECIMAL escape hatch applies past that); λ̂ is ONE pinned
    * division and the diversity column is 1.0 minus that same double.
    */
  def qSimpson(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * (col("c") - lit(1L))).as("sum_cc"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("sum_cc"),
        (col("sum_cc").cast("double") /
          (col("n_tokens") * (col("n_tokens") - lit(1L))).cast("double"))
          .as("simpson"),
        (lit(1.0) - col("sum_cc").cast("double") /
          (col("n_tokens") * (col("n_tokens") - lit(1L))).cast("double"))
          .as("gini_simpson"))
      .orderBy(col("source"))

  /** q_dataset_card — the one-row dataset datasheet (Gebru et al.
    * "Datasheets for Datasets", the numbers section of every HF dataset
    * card): corpus size (docs / tokens / chars / sources / languages),
    * mean document length, short-document share (< 10 tokens), the
    * 16-char-prefix duplication share (the cheap boilerplate smell the
    * full dedup pass then quantifies), and the dominant language with
    * its share. The capstone summary a curation pipeline publishes
    * with each snapshot — every number here is re-derivable from the
    * dedicated operators, but THIS is the row that ships with the
    * data.
    *
    * Determinism: every count is an exact BIGINT; the four shares /
    * means are single pinned divisions. Plan: one corpus pass for the
    * base aggregate, one prefix groupBy (map-side partial, |prefixes|
    * rows), one |langs|-row ranking window — the three 1-row results
    * attach by broadcast crossJoin, nothing collects.
    */
  def qDatasetCard(spark: SparkSession, d: String): DataFrame = {
    val base = documents(spark, d).select(col("doc_id"), col("source"),
      col("lang"), col("n_chars"),
      size(split(col("text"), " ")).cast("long").as("n_toks"),
      substring(col("text"), 1, 16).as("p16"))
    val totals = base.agg(count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_toks")).as("total_tokens"),
      sum(col("n_chars")).as("total_chars"),
      sum(when(col("n_toks") < 10L, 1L).otherwise(0L)).as("n_short"))
    val prefDup = base.groupBy(col("p16"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") >= 2L, col("c")).otherwise(0L))
        .as("n_prefix_dup"))
    val topLang = base.groupBy(col("lang")).agg(count(lit(1)).as("lc"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("lc").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("lang").as("top_lang"), col("lc").as("top_lang_docs"))
    totals.crossJoin(broadcast(prefDup)).crossJoin(broadcast(topLang))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("total_tokens"), col("total_chars"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tokens"),
        (col("n_short").cast("double") / col("n_docs").cast("double"))
          .as("short_share"),
        (col("n_prefix_dup").cast("double") / col("n_docs").cast("double"))
          .as("prefix_dup_share"),
        col("top_lang"),
        (col("top_lang_docs").cast("double") / col("n_docs").cast("double"))
          .as("top_lang_share"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dataset_card"   -> qDatasetCard _,
    "q_simpson"        -> qSimpson _,
    "q_quantile_merge" -> qQuantileMerge _,
    "q_substring_dup" -> qSubstringDup _,
    "q_cdc_chunks"    -> qCdcChunks _,
    "q_ttr"           -> qTtr _,
    "q_fertility"     -> qFertility _,
    "q_kn_bigram"     -> qKnBigram _,
    "q_ngram_coverage" -> qNgramCoverage _,
    "q_train_split"   -> qTrainSplit _,
  )

  val oracle: Map[String, String] = Map(
    "q_dataset_card" ->
      """WITH base AS (
        |  SELECT doc_id, source, lang, n_chars,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |         substr(text, 1, 16) AS p16
        |  FROM documents
        |), totals AS (
        |  SELECT COUNT(*) AS n_docs,
        |         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |         CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
        |         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |         CAST(SUM(CASE WHEN n_toks < 10 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_short
        |  FROM base
        |), pref AS (
        |  SELECT CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
        |           AS n_prefix_dup
        |  FROM (SELECT p16, COUNT(*) AS c FROM base GROUP BY p16)
        |), toplang AS (
        |  SELECT lang AS top_lang, lc AS top_lang_docs
        |  FROM (SELECT lang, COUNT(*) AS lc,
        |               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, lang ASC)
        |                 AS rn
        |        FROM base GROUP BY lang)
        |  WHERE rn = 1
        |)
        |SELECT t.n_docs, t.n_sources, t.n_langs, t.total_tokens,
        |       t.total_chars,
        |       CAST(t.total_tokens AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
        |         AS mean_tokens,
        |       CAST(t.n_short AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
        |         AS short_share,
        |       CAST(p.n_prefix_dup AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
        |         AS prefix_dup_share,
        |       l.top_lang,
        |       CAST(l.top_lang_docs AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
        |         AS top_lang_share
        |FROM totals t CROSS JOIN pref p CROSS JOIN toplang l""".stripMargin,
    "q_simpson" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), cnt AS (
        |  SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok
        |), m AS (
        |  SELECT source,
        |         CAST(SUM(c) AS BIGINT) AS n_tokens,
        |         COUNT(*) AS n_types,
        |         CAST(SUM(c * (c - 1)) AS BIGINT) AS sum_cc
        |  FROM cnt GROUP BY source
        |)
        |SELECT source, n_tokens, n_types, sum_cc,
        |       CAST(sum_cc AS DOUBLE)
        |         / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) AS simpson,
        |       1.0 - CAST(sum_cc AS DOUBLE)
        |         / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) AS gini_simpson
        |FROM m
        |ORDER BY source""".stripMargin,
    "q_quantile_merge" ->
      s"""WITH docs AS (SELECT source, n_chars, doc_id FROM documents),
         |sizes AS (SELECT source, COUNT(*) AS n_s FROM docs GROUP BY source),
         |total AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_total FROM sizes),
         |ranked AS (
         |  SELECT d.source, d.n_chars,
         |         ROW_NUMBER() OVER (PARTITION BY d.source
         |           ORDER BY d.n_chars, d.doc_id) AS rn,
         |         s.n_s
         |  FROM docs d JOIN sizes s ON d.source = s.source
         |), summary AS (
         |  SELECT source, j, n_chars AS v, n_s AS wt
         |  FROM (SELECT source, n_chars, rn, n_s,
         |               unnest(generate_series(1, $QmergeQ)) AS j
         |        FROM ranked)
         |  WHERE (j * n_s + ${QmergeQ - 1}) // $QmergeQ = rn
         |), cum AS (
         |  SELECT v, CAST(SUM(wt) OVER (ORDER BY v, source, j
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
         |  FROM summary
         |), quart AS (
         |  SELECT p4, MIN(v) AS est_merged
         |  FROM (SELECT v, cumw, unnest([1, 2, 3]) AS p4 FROM cum) q
         |  CROSS JOIN total
         |  WHERE q.cumw * 4 >= q.p4 * $QmergeQ * total.n_total
         |  GROUP BY p4
         |), hist AS (
         |  SELECT v, CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
         |           AS BIGINT) AS cum
         |  FROM (SELECT n_chars AS v, COUNT(*) AS c FROM docs
         |        GROUP BY n_chars)
         |), ex AS (
         |  SELECT p4, MIN(v) AS exact_disc
         |  FROM (SELECT v, cum, unnest([1, 2, 3]) AS p4 FROM hist) h
         |  CROSS JOIN total
         |  WHERE h.cum * 4 >= h.p4 * total.n_total
         |  GROUP BY p4
         |)
         |SELECT CAST(q.p4 AS BIGINT) AS p4, q.est_merged, ex.exact_disc,
         |       h2.cum AS n_le_est,
         |       CAST(abs(h2.cum * 4 - q.p4 * t.n_total) AS DOUBLE)
         |         / CAST(t.n_total * 4 AS DOUBLE) AS rank_err_share
         |FROM quart q
         |JOIN ex ON q.p4 = ex.p4
         |JOIN hist h2 ON h2.v = q.est_merged
         |CROSS JOIN total t
         |ORDER BY p4""".stripMargin,
    "q_substring_dup" ->
      s"""WITH tok AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |), g0 AS (
         |  SELECT doc_id, l,
         |         unnest(generate_series(1, len(l) - ${SubDupL - 1})) AS i
         |  FROM tok WHERE len(l) >= $SubDupL
         |), g AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         array_to_string(l[i:i+${SubDupL - 1}], ' ') AS gram
         |  FROM g0
         |), dup AS (
         |  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
         |), sp AS (
         |  SELECT doc_id, pos AS s, pos + ${SubDupL - 1} AS e
         |  FROM g WHERE gram IN (SELECT gram FROM dup)
         |), m AS (
         |  SELECT doc_id, s, e,
         |         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |                      ROWS BETWEEN UNBOUNDED PRECEDING
         |                      AND 1 PRECEDING) AS pmax
         |  FROM sp
         |), cov AS (
         |  SELECT doc_id,
         |         CAST(SUM(GREATEST(0, e - GREATEST(s, COALESCE(pmax + 1, s))
         |                              + 1)) AS BIGINT) AS dup_toks
         |  FROM m GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(l) AS BIGINT) AS n_toks,
         |       COALESCE(dup_toks, 0) AS dup_toks,
         |       CAST(COALESCE(dup_toks, 0) AS DOUBLE)
         |         / CAST(len(l) AS DOUBLE) AS dup_frac
         |FROM tok t LEFT JOIN cov USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q_cdc_chunks" ->
      s"""WITH d AS (
         |  SELECT source, text, CAST(len(text) AS BIGINT) AS n,
         |         list_transform(string_split(text, ''),
         |                        c -> CAST(ascii(c) AS BIGINT)) AS cs
         |  FROM documents
         |), b AS (
         |  SELECT source, text, n,
         |    list_prepend(CAST(1 AS BIGINT),
         |      CASE WHEN n >= ${CdcW + 1}
         |      THEN list_filter(generate_series(CAST(2 AS BIGINT), n - ${CdcW - 1}),
         |             i -> (${cdcWeights.zipWithIndex.map { case (wgt, j) =>
                 s"cs[CAST(i AS INT) + $j] * CAST($wgt AS BIGINT)"
               }.mkString(" + ")}) % $CdcDivisor = 0)
         |      ELSE [] END) AS bnd
         |  FROM d
         |), c0 AS (
         |  SELECT source, text, n, bnd,
         |         unnest(generate_series(1, len(bnd))) AS k
         |  FROM b
         |), c AS (
         |  SELECT source,
         |    md5(substr(text, CAST(bnd[k] AS INT),
         |        CAST((CASE WHEN k < len(bnd) THEN bnd[k + 1] - 1 ELSE n END)
         |             - bnd[k] + 1 AS INT))) AS h,
         |    (CASE WHEN k < len(bnd) THEN bnd[k + 1] - 1 ELSE n END)
         |      - bnd[k] + 1 AS clen
         |  FROM c0
         |), tot AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |         CAST(SUM(clen) AS BIGINT) AS total_chars
         |  FROM c GROUP BY source
         |), unq AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_uniq,
         |         CAST(SUM(clen) AS BIGINT) AS uniq_chars
         |  FROM (SELECT DISTINCT source, h, clen FROM c) GROUP BY source
         |)
         |SELECT source, n_chunks, n_uniq, total_chars, uniq_chars,
         |       CAST(uniq_chars AS DOUBLE) / CAST(total_chars AS DOUBLE)
         |         AS dedup_ratio
         |FROM tot JOIN unq USING (source)
         |ORDER BY source""".stripMargin,
    "q_ttr" ->
      """WITH tc AS (
        |  SELECT source, tok, COUNT(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY source, tok
        |)
        |SELECT source,
        |       CAST(SUM(c) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(*) AS BIGINT) AS n_types,
        |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_hapax,
        |       CAST(COUNT(*) AS DOUBLE) / CAST(CAST(SUM(c) AS BIGINT)
        |         AS DOUBLE) AS ttr,
        |       CAST(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS hapax_share
        |FROM tc GROUP BY source ORDER BY source""".stripMargin,
    "q_fertility" ->
      """SELECT lang,
        |       CAST(SUM(words) AS BIGINT) AS n_words,
        |       CAST(SUM(pieces) AS BIGINT) AS n_pieces,
        |       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |       CAST(CAST(SUM(pieces) AS BIGINT) AS DOUBLE)
        |         / CAST(CAST(SUM(words) AS BIGINT) AS DOUBLE) AS fertility,
        |       CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE)
        |         / CAST(CAST(SUM(pieces) AS BIGINT) AS DOUBLE)
        |         AS chars_per_piece
        |FROM (
        |  SELECT lang, n_chars,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
        |         CAST(len(regexp_extract_all(text,
        |           '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS pieces
        |  FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_kn_bigram" ->
      s"""WITH tok AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |), bg0 AS (
         |  SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
         |  FROM tok WHERE len(l) >= 2
         |), bg AS (
         |  SELECT l[i] AS w1, l[i + 1] AS w2 FROM bg0
         |), c12 AS (
         |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
         |  FROM bg GROUP BY w1, w2
         |), lft AS (
         |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         |         CAST(COUNT(*) AS BIGINT) AS nfw
         |  FROM c12 GROUP BY w1
         |), rgt AS (
         |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS nbw FROM c12 GROUP BY w2
         |), ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM c12)
         |SELECT w1, w2, c12,
         |       ((CAST(c12 AS DOUBLE) - $KnD) / CAST(c1 AS DOUBLE))
         |       + (($KnD * CAST(nfw AS DOUBLE)) / CAST(c1 AS DOUBLE))
         |         * (CAST(nbw AS DOUBLE) / CAST(t AS DOUBLE)) AS pkn
         |FROM c12 JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN ty
         |ORDER BY pkn DESC, w1, w2 LIMIT 20""".stripMargin,
    "q_ngram_coverage" -> {
      val cuts = CoverageKs.map { k =>
        s"""SELECT CAST($k AS BIGINT) AS k,
           |       (SELECT CAST(SUM(n) AS BIGINT) FROM (
           |          SELECT n FROM counts ORDER BY n DESC, g LIMIT $k))
           |         AS top_mass""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH tok AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |), g0 AS (
         |  SELECT l, unnest(generate_series(1, len(l) - 2)) AS i
         |  FROM tok WHERE len(l) >= 3
         |), counts AS (
         |  SELECT array_to_string(l[i:i+2], ' ') AS g,
         |         CAST(COUNT(*) AS BIGINT) AS n
         |  FROM g0 GROUP BY g
         |), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_mass FROM counts),
         |cuts AS (
         |$cuts
         |)
         |SELECT k, top_mass, total_mass,
         |       CAST(top_mass AS DOUBLE) / CAST(total_mass AS DOUBLE) AS share
         |FROM cuts CROSS JOIN tot ORDER BY k""".stripMargin
    },
    "q_train_split" ->
      s"""WITH assigned AS (
         |  SELECT lang, n_chars,
         |         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |                   % 100 < $SplitTrainPct THEN 'train'
         |              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |                   % 100 < $SplitValPct THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM documents
         |), agg AS (
         |  SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |  FROM assigned GROUP BY lang, split
         |)
         |SELECT lang, split, n_docs, n_chars,
         |       CAST(n_docs AS DOUBLE)
         |         / CAST(CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
         |             AS DOUBLE) AS share
         |FROM agg ORDER BY lang, split""".stripMargin,
  )
}
