package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** ScalaCheck properties (SURVEY.md §5.3) over small generated frames:
  * structural laws the oracle compare can't express — explode preserves
  * total size, dedup is idempotent, top-k is a sort prefix, and the
  * window/aggregate results are invariant under repartitioning.
  *
  * Case count is kept small: each case builds a Spark job; the properties
  * target laws, not volume.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val nested: Gen[List[List[Int]]] =
    Gen.listOfN(12, Gen.listOfN(5, Gen.choose(-100, 100)).flatMap(l =>
      Gen.choose(0, 5).map(l.take)))

  property("explode preserves the sum of inner sizes") =
    forAllNoShrink(nested) { lists =>
      import spark.implicits._
      val df = lists.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "xs")
      val exploded = df.select(col("id"), explode(col("xs"))).count()
      exploded == lists.map(_.size.toLong).sum
    }

  private val kvRows: Gen[List[(Int, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 1000)))

  // Event times spread over ~3 h so random inputs produce a mix of merges,
  // bridges, and separate sessions against the 30-min gap.
  private val sessEvents: Gen[List[(Long, Double)]] =
    Gen.listOfN(14, Gen.zip(
      Gen.choose(0L, 3L * 3600 * 1000000),
      Gen.choose(0, 100000).map(_ / 1000.0)))

  property("sessionizer mergeRow fixpoint is arrival-order invariant") =
    forAllNoShrink(sessEvents, Gen.long) { (evs, seed) =>
      // The invariant every custom-sessionizer claim rests on: folding
      // events in ANY arrival order yields the SAME open-session set —
      // intervals because components of the gap-proximity relation don't
      // depend on insertion order, aggregates because counts/min/max and
      // the exact-decimal sums are associative+commutative. This is a pure
      // in-memory law (no Spark job), so it gets full ScalaCheck breadth.
      def fold(es: List[(Long, Double)]) =
        es.foldLeft(List.empty[graft.streaming.OpenSession]) { (s, e) =>
          graft.streaming.StreamOps.mergeRow(s, e._1, e._2)
        }
      // Pure law → cheap cases: 50 permutations per generated list (the
      // suite-wide case count is sized for Spark-job properties).
      val base = fold(evs)
      val rnd = new scala.util.Random(seed)
      (0 until 50).forall(_ => fold(rnd.shuffle(evs)) == base)
    }

  property("dedup (keep-min) is idempotent") =
    forAllNoShrink(kvRows) { rows =>
      import spark.implicits._
      val df = rows.toDF("k", "v")
      val once = df.groupBy(col("k")).agg(min(col("v")).as("v"))
      val twice = once.groupBy(col("k")).agg(min(col("v")).as("v"))
      once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq
    }

  property("topk(k) is exactly the k-prefix of the full sort") =
    forAllNoShrink(kvRows, Gen.choose(1, 10)) { (rows, k) =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((_, v), i) => (i, v) }.toDF("id", "v")
      val topk = df.orderBy(col("v").desc, col("id")).limit(k)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      val full = df.orderBy(col("v").desc, col("id"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      topk == full.take(k)
    }

  property("TopKPerGroup equals the window form on random frames, any partitioning") =
    forAllNoShrink(kvRows, Gen.choose(1, 5), Gen.oneOf(1, 3, 7)) { (rows, k, parts) =>
      import spark.implicits._
      GraftExtensions.register(spark)
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
        .toDF("g", "id", "v").repartition(parts)
      val custom = graft.plans.TopKPerGroup(df, Seq(df("g")),
          Seq((df("v"), true), (df("id"), false)), k)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
      // rn kept in the projection so RowNumberTopKRewrite does NOT fire —
      // this baseline must stay a genuine WindowExec plan.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
      custom == windowed
    }

  property("groupBy aggregation is invariant under repartitioning") =
    forAllNoShrink(kvRows, Gen.oneOf(1, 3, 7)) { (rows, parts) =>
      import spark.implicits._
      val df = rows.toDF("k", "v")
      def agg(d: org.apache.spark.sql.DataFrame) =
        d.groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"), max(col("v")).as("m"))
          .orderBy("k").collect().toSeq
      agg(df) == agg(df.repartition(parts))
    }
}
