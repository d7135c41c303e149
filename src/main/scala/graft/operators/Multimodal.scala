package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted features for one media blob — the output schema of the decode
  * stage. At 100 TB this row is what the shuffle carries instead of the
  * blob itself.
  */
case class MediaFeature(doc_id: Long, n_bytes: Int, head_sum: Long, checksum: Long)

/** Multimodal-column plumbing (SURVEY.md §2e E11 extension): treat media as
  * opaque `binary` columns with typed metadata, and run the decode /
  * feature-extract stage as imperative per-partition code — the shape a
  * real image/audio decode (JPEG → pixels, PCM → spectrogram) takes on
  * Spark, where the decoder is a native library driven row-by-row inside
  * `mapPartitions`.
  *
  * The container has no media codecs, so the DECODE BODY IS A STUB: a
  * deterministic byte-level "feature extractor" (length, head-window sum,
  * rolling checksum) stands in for the real decoder. Everything around it —
  * binary column construction, the typed `Dataset` boundary, the
  * per-partition batch loop, the fixed output schema — is the real
  * production plumbing and is oracle-verified end to end.
  *
  * Scale notes: blobs never shuffle — the feature extraction is a
  * per-partition map directly over the scan, and only the small fixed-width
  * feature rows flow downstream. Partition sizing is the parquet reader's
  * (`spark.sql.files.maxPartitionBytes`), so a 100 TB blob table fans out
  * across executors without driver involvement.
  */
object Multimodal {

  /** q_multimodal_features — binary media column → per-document features
    * via a typed mapPartitions decode stage.
    */
  def qMultimodalFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val blobs = documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    blobs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        // --- STUB DECODE ---------------------------------------------
        // A real pipeline decodes `bytes` with an image/audio library
        // here (absent in this container). The fake features below are
        // deterministic functions of the raw bytes so the oracle can
        // verify the plumbing exactly.
        val head = bytes.take(16).map(b => (b & 0xff).toLong).sum
        var h = 0L
        var i = 0
        while (i < bytes.length) {
          h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
          i += 1
        }
        MediaFeature(id, bytes.length, head, h)
        // -------------------------------------------------------------
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** [[qMediaPhash]] geometry: byte window per difference, hash width,
    * and the Manku-Jain-Sarma block split (4 × 15 bits ⇒ any pair within
    * Hamming 3 shares a block exactly — the same pigeonhole as
    * [[graft.operators.TextOps]]' simhash banding).
    */
  val PhashWindow = 2
  val PhashBits = 60
  val PhashBlockBits = 15

  /** One perceptual-hash index row: the 60-bit dHash stand-in plus its
    * four 15-bit band keys, i.e. the record a media near-dup index
    * materializes per blob.
    */
  case class MediaPhash(doc_id: Long, phash: Long)

  /** q_media_phash — perceptual-hash INDEX BUILD over the binary media
    * column: each blob collapses to a 60-bit difference hash (dHash —
    * bit j set iff window j+1's intensity exceeds window j's; the
    * STANDARD image near-dup fingerprint) inside the mapPartitions
    * decode stage, then fans out its four 15-bit band keys — the row a
    * media dedup pipeline writes to its band index, completing the
    * dedup matrix across modalities (text: MinHash/SimHash/winnowing;
    * embeddings: sign-LSH/SemDeDup; media: THIS). Pair retrieval is the
    * identical banded equi-join the simhash family already runs
    * (pigeonhole: Hamming ≤ 3 ⇒ a shared block), so it is not repeated
    * here — on this text-derived fixture the blob space has no
    * byte-level near-dups, and an honest pair query would be empty.
    *
    * STUB DECODE contract (same as every op in this file): real dHash
    * resizes to 9×8 grayscale and compares adjacent pixels; the
    * container has no codecs, so adjacent [[PhashWindow]]-byte-window
    * sums stand in for pixel intensities — deterministic over the raw
    * bytes, oracle-verifiable, and shaped exactly like the real thing.
    * Scale: the blob never leaves the scan stage — 8 bytes of hash plus
    * four shorts flow downstream per blob.
    */
  def qMediaPhash(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val blobs = documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    val hashed = blobs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        // --- STUB DECODE ---------------------------------------------
        def winSum(k: Int): Long = {
          var acc = 0L
          var i = k * PhashWindow
          val end = math.min(bytes.length, (k + 1) * PhashWindow)
          while (i < end) { acc += bytes(i) & 0xff; i += 1 }
          acc
        }
        var h = 0L
        var j = 0
        while (j < PhashBits) {
          if (winSum(j + 1) > winSum(j)) h |= 1L << j
          j += 1
        }
        MediaPhash(id, h)
        // -------------------------------------------------------------
      }
    }.toDF()
    hashed.select(
      col("doc_id") +: col("phash") +:
        (0 until PhashBits / PhashBlockBits).map { b =>
          shiftright(col("phash"), PhashBlockBits * b)
            .bitwiseAND(lit((1L << PhashBlockBits) - 1)).as(s"bkey$b")
        }: _*)
      .orderBy(col("doc_id"))
  }

  /** Frame size (bytes) and sampling stride for [[qFrameSample]]. */
  val FrameBytes = 16
  val FrameStride = 4

  /** q_frame_sample — the frame-sampling shape of video/audio ingestion:
    * the blob is treated as consecutive [[FrameBytes]]-byte frames, every
    * [[FrameStride]]-th frame is decoded (STUB: byte sum stands in for
    * the pixel decode), and one feature row per SAMPLED frame flows
    * downstream — the blob itself never shuffles, and the output volume
    * is cut by the stride before anything leaves the scan stage, which
    * at 100 TB is the difference between shipping every frame and
    * shipping 1/stride of them.
    */
  def qFrameSample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val blobs = documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    blobs.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        (0 until bytes.length / FrameBytes).iterator
          .filter(_ % FrameStride == 0)
          .map { f =>
            // --- STUB FRAME DECODE (see qMultimodalFeatures) ---------
            var s = 0L
            var i = f * FrameBytes
            while (i < (f + 1) * FrameBytes) { s += bytes(i) & 0xff; i += 1 }
            (id, f, s)
          }
      }
    }.toDF("doc_id", "frame_idx", "frame_sum")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Scene-cut threshold for [[qFrameDiff]]: an adjacent-frame feature
    * delta above this flags a boundary (~p99 of the fixture's deltas —
    * the knob a real shot-boundary detector calibrates per corpus).
    */
  val CutThreshold = 200L

  /** q_frame_diff — the shot-boundary-detection shape of video
    * ingestion: every blob decodes to CONSECUTIVE frame features (no
    * stride — adjacency is the signal; [[qFrameSample]] owns the strided
    * thinning), each frame is scored by its absolute feature delta to
    * the previous frame, and deltas above [[CutThreshold]] are flagged
    * as cuts — the standard first pass that turns raw video into
    * trainable scene clips (STUB decode: byte-window sums stand in for
    * pixel histograms; the plumbing — per-partition frame loop, fixed
    * feature rows, windowed adjacency downstream — is the real shape).
    *
    * Scale: the blob never shuffles; only (doc, frame, sum) rows leave
    * the scan stage, and the lag window shuffles on doc_id once.
    * All-integer → hash-exact.
    */
  def qFrameDiff(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val blobs = documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    val frames = blobs.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        (0 until bytes.length / FrameBytes).iterator.map { f =>
          // --- STUB FRAME DECODE (see qMultimodalFeatures) -----------
          var s = 0L
          var i = f * FrameBytes
          while (i < (f + 1) * FrameBytes) { s += bytes(i) & 0xff; i += 1 }
          (id, f, s)
        }
      }
    }.toDF("doc_id", "frame_idx", "frame_sum")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .select(col("doc_id"), col("frame_idx"), col("frame_sum"),
        abs(col("frame_sum") - lag(col("frame_sum"), 1).over(w)).as("delta"))
      .filter(col("delta").isNotNull)
      .select(col("doc_id"), col("frame_idx"), col("frame_sum"), col("delta"),
        (col("delta") > CutThreshold).as("is_cut"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Downsampling factor for [[qResize]]: keep every k-th byte. */
  val ResizeFactor = 2

  /** q_resize — the resize/downsample shape: each blob is reduced to
    * every [[ResizeFactor]]-th byte (nearest-neighbor; a real resize
    * interpolates pixels — STUB like the other decodes) and only the
    * RESIZED blob's size and checksum leave the scan stage. Resize-on-
    * ingest is the standard way a media pipeline cuts 100 TB to the
    * resolution training actually uses before anything shuffles or
    * persists.
    */
  def qResize(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val blobs = documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    blobs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val out = Array.range(0, bytes.length, ResizeFactor).map(bytes)
        var h = 0L
        var i = 0
        while (i < out.length) {
          h = (h * 31 + (out(i) & 0xff)) % 1000000007L
          i += 1
        }
        (id, out.length, h)
      }
    }.toDF("doc_id", "n_bytes_out", "checksum_out")
      .orderBy(col("doc_id"))
  }

  /** q_media_dedup — fixed-block content-addressed dedup over the binary
    * media column: every blob splits into [[FrameBytes]]-byte segments
    * in the scan projection (the natural unit for media — video IS
    * fixed segments, and a re-encoded clip shares them
    * exactly), each segment collapses to its sha-256, and the top-20
    * most-copied segments report copy/document counts and the bytes a
    * content-addressed store reclaims. Completes the media dedup matrix
    * tiers: perceptual near-dup ([[qMediaPhash]]), fixed-block exact
    * (THIS — the control that edit-SHIFTED content defeats), and
    * content-defined chunking ([[graft.operators.Corpus]]' CDC, which
    * survives the shift). Whole-object dedup is this query at one
    * segment per blob.
    *
    * Scale: blobs never shuffle — only (32-byte hash, doc) rows leave
    * the scan; ONE hash-keyed aggregation with map-side partials; the
    * reclaim arithmetic is exact integers; top-20 is a
    * TakeOrderedAndProject heap. The segment hash is pure Catalyst —
    * `sha2(substring(blob, f*FrameBytes+1, FrameBytes), 256)` over an
    * exploded frame index — so the whole scan→explode→hash chain stays
    * inside WholeStageCodegen with column pruning intact (no typed
    * Dataset serialization boundary; `substring` on BinaryType slices
    * bytes at O(1) offsets).
    */
  def qMediaDedup(spark: SparkSession, d: String): DataFrame = {
    documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN length(blob) >= $FrameBytes
           |THEN transform(sequence(0, length(blob) div $FrameBytes - 1),
           |  f -> sha2(substring(blob, f * $FrameBytes + 1, $FrameBytes), 256))
           |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("canonical"))
      .filter(col("n_copies") >= 2)
      .select(col("h"), col("n_copies"), col("n_docs"), col("canonical"),
        ((col("n_copies") - 1) * lit(FrameBytes.toLong))
          .as("reclaimed_bytes"))
      .orderBy(col("n_copies").desc, col("h"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_dedup"         -> qMediaDedup _,
    "q_multimodal_features" -> qMultimodalFeatures _,
    "q_media_phash"         -> qMediaPhash _,
    "q_frame_sample"        -> qFrameSample _,
    "q_frame_diff"          -> qFrameDiff _,
    "q_resize"              -> qResize _,
  )

  /** ASCII-ONLY ORACLE CONTRACT: the Spark side of this module segments
    * UTF-8 BYTES (`encode(text,'UTF-8')` + binary `substring`), while the
    * DuckDB oracle segments CHARACTERS (`substr`) with byte-count bounds
    * (`strlen`). The two agree iff bytes == characters, i.e. the text is
    * pure ASCII — which the driver fixture guarantees (and
    * `MultimodalSpec` asserts). Any multibyte character would silently
    * diverge the engines; DuckDB (as pinned here) cannot slice BLOBs, so
    * the byte-based oracle that would make this unconditional is not
    * expressible — the contract is documented instead. The same
    * single-byte assumption underlies the `ascii`-code checksums below.
    */
  val oracle: Map[String, String] = Map(
    "q_media_dedup" ->
      s"""WITH segs AS (
         |  SELECT doc_id,
         |         sha256(substr(text, CAST(f AS INT) * $FrameBytes + 1,
         |                       $FrameBytes)) AS h
         |  FROM (SELECT doc_id, text,
         |               unnest(generate_series(0,
         |                 strlen(text) // $FrameBytes - 1)) AS f
         |        FROM documents WHERE strlen(text) >= $FrameBytes)
         |), g AS (
         |  SELECT h, CAST(COUNT(*) AS BIGINT) AS n_copies,
         |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |         MIN(doc_id) AS canonical
         |  FROM segs GROUP BY h
         |)
         |SELECT h, n_copies, n_docs, canonical,
         |       (n_copies - 1) * CAST($FrameBytes AS BIGINT)
         |         AS reclaimed_bytes
         |FROM g WHERE n_copies >= 2
         |ORDER BY n_copies DESC, h LIMIT 20""".stripMargin,
    "q_multimodal_features" ->
      """SELECT doc_id,
        |       CAST(len(text) AS INTEGER) AS n_bytes,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(substr(text, 1, 16), ''),
        |                        c -> CAST(ascii(c) AS BIGINT))),
        |         (acc, c) -> acc + c) AS head_sum,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |         (acc, c) -> (acc * 31 + c) % 1000000007) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_phash" ->
      s"""WITH ss AS (
         |  SELECT doc_id,
         |         list_transform(range(0, ${PhashBits + 1}), k ->
         |           list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             list_transform(
         |               string_split(substr(text, k * $PhashWindow + 1,
         |                                   $PhashWindow), ''),
         |               c -> CAST(ascii(c) AS BIGINT))),
         |             (acc, c) -> acc + c)) AS s
         |  FROM documents
         |), ph AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(0, $PhashBits), j ->
         |             CASE WHEN s[j + 2] > s[j + 1]
         |                  THEN (1::BIGINT << j) ELSE 0::BIGINT END)),
         |           (acc, b) -> acc + b) AS phash
         |  FROM ss
         |)
         |SELECT doc_id, phash,
         |       ${(0 until PhashBits / PhashBlockBits).map { b =>
                   s"(phash // ${1L << (PhashBlockBits * b)}) % " +
                   s"${1L << PhashBlockBits} AS bkey$b"
                 }.mkString(",\n       ")}
         |FROM ph ORDER BY doc_id""".stripMargin,
    "q_frame_diff" ->
      s"""WITH fr AS (
         |  SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(
         |             string_split(substr(text, f * $FrameBytes + 1, $FrameBytes), ''),
         |             c -> CAST(ascii(c) AS BIGINT))),
         |           (acc, c) -> acc + c) AS frame_sum
         |  FROM (
         |    SELECT doc_id, text,
         |           unnest(generate_series(0, len(text) // $FrameBytes - 1)) AS f
         |    FROM documents)
         |), dd AS (
         |  SELECT doc_id, frame_idx, frame_sum,
         |         abs(frame_sum - lag(frame_sum) OVER
         |           (PARTITION BY doc_id ORDER BY frame_idx)) AS delta
         |  FROM fr
         |)
         |SELECT doc_id, frame_idx, frame_sum, CAST(delta AS BIGINT) AS delta,
         |       delta > $CutThreshold AS is_cut
         |FROM dd WHERE delta IS NOT NULL
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_frame_sample" ->
      s"""SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(
         |           string_split(substr(text, f * $FrameBytes + 1, $FrameBytes), ''),
         |           c -> CAST(ascii(c) AS BIGINT))),
         |         (acc, c) -> acc + c) AS frame_sum
         |FROM (
         |  SELECT doc_id, text,
         |         unnest(generate_series(0, len(text) // $FrameBytes - 1)) AS f
         |  FROM documents)
         |WHERE f % $FrameStride = 0
         |ORDER BY doc_id, frame_idx""".stripMargin,
    // DuckDB list lambdas expose a 1-BASED index i; Spark keeps 0-based
    // positions 0, 2, 4… which are i = 1, 3, 5… here.
    "q_resize" ->
      s"""SELECT doc_id,
         |       CAST(len(kept) AS INTEGER) AS n_bytes_out,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(kept, c -> CAST(ascii(c) AS BIGINT))),
         |         (acc, c) -> (acc * 31 + c) % 1000000007) AS checksum_out
         |FROM (
         |  SELECT doc_id,
         |         list_filter(string_split(text, ''),
         |                     (c, i) -> (i - 1) % $ResizeFactor = 0) AS kept
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
  )
}
