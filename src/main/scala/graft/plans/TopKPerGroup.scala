package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import scala.collection.mutable

/** Per-group top-k as a whole custom operator — the (c)-tier extension
  * point from SURVEY.md §4: a logical plan node ([[TopKPerGroupPlan]]), a
  * planner strategy ([[TopKStrategy]]), and a physical operator
  * ([[TopKPerGroupExec]]), surfaced through the public Dataset API by
  * [[TopKPerGroup.apply]].
  *
  * Why a custom operator instead of the `row_number() <= k` window form:
  * the window plan must SORT every partition on (group, order) —
  * O(n log n) over all rows, spilling at scale. Spark 3.5+'s
  * InferWindowGroupLimit improves it (WindowGroupLimit prunes beyond-rank
  * rows before and after the shuffle) but still sorts each partition to
  * find the rank boundary; top-k only needs a bounded k-element heap per
  * group: O(n log k) time, O(groups · k) memory, no sort, no spill. Same
  * reason global top-k plans as TakeOrderedAndProject instead of
  * Sort+Limit; Spark has no per-group form of it — this is it (and
  * [[RowNumberTopKRewrite]] routes the window idiom here automatically).
  *
  * Scale: the exec declares `ClusteredDistribution(groupExprs)`, so
  * EnsureRequirements inserts exactly one hash shuffle on the group key
  * (or none if the child is already co-partitioned — e.g. bucketed input),
  * and each task heaps its partition's groups independently. Determinism:
  * callers must make `order` a TOTAL order (tie-break column) — same
  * contract as every oracle-checked query here.
  */
case class TopKPerGroupPlan(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupPlan]] as [[TopKPerGroupExec]]. Injected via
  * `GraftExtensions` (spark.sql.extensions) or
  * `spark.experimental.extraStrategies`.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateOrdering.generate(sortOrder, childOutput)
      // Max-heap under `ord`: head = the WORST retained row; a new row
      // displaces it when it sorts strictly earlier. O(log k) per row,
      // O(groups · k) state — never a partition-wide sort.
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // Probe with the projection's REUSED buffer; copy the key only on
        // first insertion — one allocation per group, not per row.
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, {
          val h = mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), h)
          h
        })
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (limit > 0 && ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.toArray.sorted(ord).iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {
  /** The first k rows of each group under `order` — Dataset-API surface
    * for the custom operator. `order` entries are (column, descending?);
    * include a tie-break column for a total order.
    */
  def apply(df: DataFrame, groupCols: Seq[Column],
            order: Seq[(Column, Boolean)], k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    val g = groupCols.map(GraftSqlBridge.expression)
    val o = order.map { case (c, desc) =>
      SortOrder(GraftSqlBridge.expression(c), if (desc) Descending else Ascending)
    }
    GraftSqlBridge.dataFrame(df.sparkSession, TopKPerGroupPlan(g, o, k, child))
  }
}
