package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (SURVEY.md §2e E8) — the
  * vector-space generalization of the reference's "top-1 insight" pattern
  * (/root/reference/app.py:211,217): instead of argmax over one numeric
  * column, argmax over cosine similarity to a query vector.
  *
  * Numerical contract: cosine is computed entirely in IEEE double with
  * strict left-to-right accumulation (`aggregate` over `zip_with` products).
  * The DuckDB oracle mirrors the exact same operation order
  * (`list_reduce` over `list_transform(list_zip(...))`), so scores are
  * BIT-IDENTICAL across engines and the top-k selection + order is fully
  * deterministic — no epsilon, no rounding.
  *
  * Scale design (100 TB):
  *  - the query vector is a 1-row broadcast — every executor scores its own
  *    partitions, no shuffle of the embedding table at all;
  *  - top-k plans as TakeOrderedAndProject: an O(k) heap per partition and
  *    O(k·partitions) on the driver, never a global sort;
  *  - all-pairs scoring is avoided by sign-bit LSH bucketing
  *    ([[qCosineTopkLsh]], [[qCosineNeardup]]): candidates come from a
  *    bucket equi-join (shuffle on bucket id), so work is Σ bucket² instead
  *    of n². More planes → smaller buckets; skewed buckets are AQE's
  *    skew-join case. This is the standard random-hyperplane LSH family
  *    with axis-aligned planes, chosen because both engines can compute the
  *    bucket exactly (sign of a stored coordinate) — a production deployment
  *    would draw seeded Gaussian planes the same way [[TextOps]] draws
  *    seeded MinHash permutations.
  *  - everything is built-in codegen'd expressions — no UDFs anywhere, so
  *    the scoring stays inside whole-stage codegen.
  */
object Similarity {

  /** Dot product of two float-vector columns in double, left-to-right —
    * the codegen'd [[graft.functions.VecDot]] expression. Semantically
    * identical to `aggregate(zip_with(..), 0.0, +)` (same bits), but stays
    * inside whole-stage codegen instead of the interpreted higher-order
    * evaluator, and never materializes the products array.
    */
  private def dotLtr(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.VecDot(
        org.apache.spark.sql.GraftSqlBridge.expression(x),
        org.apache.spark.sql.GraftSqlBridge.expression(y)))

  /** Euclidean norm of a float-vector column, in double. Hoisted out of the
    * pair-scoring expression so joins compute one dot product per pair, not
    * three — same bits, 3× less work.
    */
  def norm(v: Column): Column = sqrt(dotLtr(v, v))

  /** Exact cosine similarity between two `ArrayType(FloatType)` columns. */
  def cosine(a: Column, b: Column): Column =
    dotLtr(a, b) / (norm(a) * norm(b))

  /** Cosine from a fresh dot product and precomputed norms. */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dotLtr(a, b) / (na * nb)

  /** 16-way sign-bit LSH bucket: the sign of 4 fixed coordinates
    * (1-based dims 1, 9, 17, 25). Vectors with high cosine agree on most
    * signs, so near-duplicates land in the same bucket w.h.p.
    */
  private def bucket(v: Column): Column =
    (element_at(v, 1) >= 0).cast("int") * 8 +
    (element_at(v, 9) >= 0).cast("int") * 4 +
    (element_at(v, 17) >= 0).cast("int") * 2 +
    (element_at(v, 25) >= 0).cast("int")

  private def queryVec(spark: SparkSession, d: String): DataFrame =
    embeddings(spark, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), norm(col("embedding")).as("qn"))

  /** q_cosine_topk — brute-force cosine top-20 against the query vector
    * (vec_id 0). The baseline every ANN variant is checked against.
    */
  def qCosineTopk(spark: SparkSession, d: String): DataFrame =
    embeddings(spark, d)
      .crossJoin(broadcast(queryVec(spark, d)))
      .select(col("vec_id"), col("label"),
              cosinePre(col("embedding"), col("qe"),
                        norm(col("embedding")), col("qn")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)

  /** q_cosine_topk_lsh — the scale path: score only the query's LSH bucket
    * (~1/16 of the table here; 1/2^planes in general), then top-10 within
    * it. Recall vs. [[qCosineTopk]] is property-tested in SimilaritySpec.
    */
  def qCosineTopkLsh(spark: SparkSession, d: String): DataFrame = {
    val q = embeddings(spark, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), norm(col("embedding")).as("qn"),
              bucket(col("embedding")).as("qb"))
    embeddings(spark, d)
      .withColumn("bkt", bucket(col("embedding")))
      .join(broadcast(q), col("bkt") === col("qb"))
      .select(col("vec_id"), col("label"),
              cosinePre(col("embedding"), col("qe"),
                        norm(col("embedding")), col("qn")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** q_cosine_neardup — embedding-space near-duplicate pairs: bucket-join
    * (never all-pairs) then exact cosine ≥ 0.3. The shape of
    * embedding-based dedup in an LLM data pipeline: candidates from LSH,
    * exact verification on candidates only. Norms are computed once per
    * vector BEFORE the join (n rows), not per candidate pair (n·bucket
    * rows) — at 100 TB that's the difference between reading each vector
    * once and re-normalizing it once per candidate.
    */
  def qCosineNeardup(spark: SparkSession, d: String): DataFrame = {
    def side(p: String) = embeddings(spark, d).select(
      col("vec_id").as(s"${p}_id"),
      col("embedding").as(s"${p}_e"),
      norm(col("embedding")).as(s"${p}_n"),
      bucket(col("embedding")).as(s"${p}_b"))
    side("a").join(side("b"),
        col("a_b") === col("b_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
              cosinePre(col("a_e"), col("b_e"), col("a_n"), col("b_n")).as("cos"))
      .filter(col("cos") >= 0.3)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q_ann_ivf — IVF-style ANN, the other standard scale path besides LSH:
    * vectors are assigned to their nearest of 8 centroids (an inverted
    * file), and the query searches only its own cell (nprobe=1). Centroids
    * here are "training-free" (the first 8 stored vectors) so the index is
    * fully deterministic and oracle-checkable; a production deployment
    * would plug in offline-trained k-means centroids — the plan shape
    * (broadcast centroids → per-row argmax assignment → cell equi-join →
    * top-k) is identical. Cell assignment is a per-key row_number over 8
    * candidate rows — bounded work per vector, no global state.
    */
  def qAnnIvf(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(spark, d)
    val cents = e.filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val byCos = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("embedding"), col("cid"),
              cosine(col("embedding"), col("ce")).as("ccos"))
      .withColumn("rn", row_number().over(byCos))
      .filter(col("rn") === 1)
    val q = assigned.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), norm(col("embedding")).as("qn"),
              col("cid").as("qcid"))
    assigned.join(broadcast(q), col("cid") === col("qcid"))
      .select(col("vec_id"), col("label"), col("cid"),
              cosinePre(col("embedding"), col("qe"),
                        norm(col("embedding")), col("qn")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk"     -> qCosineTopk _,
    "q_cosine_topk_lsh" -> qCosineTopkLsh _,
    "q_cosine_neardup"  -> qCosineNeardup _,
    "q_ann_ivf"         -> qAnnIvf _,
  )

  // ---- DuckDB oracle: the same left-to-right double arithmetic ----------

  /** `list_reduce` starting from an explicit 0.0 accumulator replicates
    * Spark's `aggregate(zero=0.0)` fold order exactly.
    */
  private def dotSql(x: String, y: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    s"list_transform(list_zip($x, $y), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), " +
    s"(acc, v) -> acc + v)"

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  private def bucketSql(v: String): String =
    s"CAST($v[1] >= 0 AS INT) * 8 + CAST($v[9] >= 0 AS INT) * 4 + " +
    s"CAST($v[17] >= 0 AS INT) * 2 + CAST($v[25] >= 0 AS INT)"

  val oracle: Map[String, String] = Map(
    "q_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, ${cosSql("embedding", "qe")} AS cos
         |FROM embeddings, q
         |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,
    "q_cosine_topk_lsh" ->
      s"""WITH q AS (SELECT embedding AS qe, ${bucketSql("embedding")} AS qb
         |           FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, ${cosSql("embedding", "qe")} AS cos
         |FROM embeddings, q
         |WHERE ${bucketSql("embedding")} = qb
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "q_cosine_neardup" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bkt
         |           FROM embeddings)
         |SELECT a.vec_id AS a_id, bb.vec_id AS b_id,
         |       ${cosSql("a.embedding", "bb.embedding")} AS cos
         |FROM b a JOIN b bb ON a.bkt = bb.bkt AND a.vec_id < bb.vec_id
         |WHERE ${cosSql("a.embedding", "bb.embedding")} >= 0.3
         |ORDER BY a_id, b_id""".stripMargin,
    "q_ann_ivf" ->
      s"""WITH centroids AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND 8
         |), assigned AS (
         |  SELECT e.vec_id, e.label, e.embedding, c.cid,
         |         ${cosSql("e.embedding", "c.ce")} AS ccos
         |  FROM embeddings e, centroids c
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                             ORDER BY ccos DESC, c.cid) = 1
         |), q AS (
         |  SELECT embedding AS qe, cid AS qcid FROM assigned WHERE vec_id = 0
         |)
         |SELECT a.vec_id, a.label, a.cid, ${cosSql("a.embedding", "qe")} AS cos
         |FROM assigned a, q
         |WHERE a.cid = qcid
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
  )
}
