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

  // Random keyed-churn scripts over an equality-delete table: each step
  // is an upsert batch, a keyed DELETE, an optimize+vacuum, or an
  // evict+recover. After EVERY script the table must equal the trivial
  // Map fold of the same steps — the law the parquet delete-file
  // representation (entries, key ranges, pruning, retirement,
  // retention, recovery) must preserve under any interleaving. Key
  // domain deliberately small (0..15) so upserts re-hit live keys and
  // deletes race entries across epochs.
  private val churnOps: Gen[List[(Int, List[Long])]] =
    Gen.listOfN(6, Gen.zip(Gen.choose(0, 4),
      Gen.listOfN(5, Gen.choose(0L, 15L))))

  property("equality-delete lifecycle matches the map model under random churn") =
    forAllNoShrink(churnOps) { ops =>
      graft.operators.RowLevelOps.ensureCatalog(spark)
      val name = s"props_eq_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val tbl = s"graft_cow.spec.$name"
      spark.sql(s"CREATE TABLE $tbl (id BIGINT NOT NULL, v BIGINT) " +
        "TBLPROPERTIES ('graft.mode'='mor', 'graft.delete-key'='id')")
      val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("spec"), name)
      var model = Map.empty[Long, Long]
      var step = 0
      ops.foreach { case (op, rawKeys) =>
        step += 1
        val keys = rawKeys.distinct
        op match {
          case 0 | 1 => // keyed upsert batch (unique keys per batch)
            val rows = keys.map(k => s"($k, ${k * 100 + step})").mkString(",")
            spark.sql(
              s"""MERGE INTO $tbl t
                 |USING (SELECT CAST(col1 AS BIGINT) AS id,
                 |              CAST(col2 AS BIGINT) AS v
                 |       FROM VALUES $rows) s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
                 |""".stripMargin)
            model ++= keys.map(k => k -> (k * 100 + step))
          case 2 => // keyed delete
            spark.sql(s"DELETE FROM $tbl WHERE id IN (${keys.mkString(",")})")
            model --= keys
          case 3 => // fold entries + reclaim retired delete files
            spark.sql(s"CALL graft_cow.optimize('spec.$name', ${64L * 1024 * 1024}L)")
            spark.sql(s"CALL graft_cow.vacuum('spec.$name', 2)")
          case 4 => // durability: the log alone carries the state
            val dir = graft.sources.CowStore.get("graft_cow", ident).get.dir
            graft.sources.CowStore.evict("graft_cow", ident)
            graft.sources.CowStore.recover("graft_cow", ident, dir): Unit
        }
      }
      val got = spark.table(tbl).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      spark.sql(s"DROP TABLE $tbl")
      got == model
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
