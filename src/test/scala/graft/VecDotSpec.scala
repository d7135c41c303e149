package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The codegen'd VecDot expression must be bit-identical to the interpreted
  * higher-order form it replaces, and reachable from SQL once registered.
  */
class VecDotSpec extends SparkSpec {

  test("VecDot equals aggregate(zip_with(...)) bitwise on fixture vectors") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
      .select(col("vec_id"), col("embedding").as("a"),
              reverse(col("embedding")).as("b"))
    val hof = aggregate(
      zip_with(col("a"), col("b"), (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    import org.apache.spark.sql.GraftSqlBridge
    val rows = e.select(
        Similarity.cosine(col("a"), col("b")).as("via_vecdot_cos"),
        GraftSqlBridge.column(graft.functions.VecDot(
          GraftSqlBridge.expression(col("a")),
          GraftSqlBridge.expression(col("b")))).as("fast"),
        hof.as("slow"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        "codegen dot product must match the interpreted fold bit-for-bit")
    }
  }

  test("vec_dot is callable from SQL after GraftExtensions.register") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(got == 11.0)
  }

  test("VecDot is NULL on a NULL array but raises on malformed vectors") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS n")
      .collect().head
    assert(r.isNullAt(0))
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val mismatch = intercept[Throwable] {
      spark.sql(
        "SELECT vec_dot(array(CAST(2.0 AS FLOAT), CAST(9.0 AS FLOAT)), " +
        "               array(CAST(3.0 AS FLOAT))) AS p").collect()
    }
    assert(messages(mismatch).exists(_.contains("different lengths")))
    val nullElem = intercept[Throwable] {
      spark.sql(
        "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS p").collect()
    }
    assert(messages(nullElem).exists(_.contains("null element")))
  }
}
