package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule — the §4 `Rule[LogicalPlan]` tier: rewrites the
  * ubiquitous per-group top-k idiom
  *
  * {{{
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o)))
  *     .filter($"rn" <= k).drop("rn")
  * }}}
  *
  * into [[TopKPerGroupPlan]], so users who write the window form get the
  * O(k)-heap physical operator instead of WindowExec's full partition
  * sort — the optimization is a plan REWRITE, exactly what Catalyst's
  * rule tier is for.
  *
  * The match is deliberately narrow (all conditions required):
  *  - a Project over a Filter over a Window (the collapsed shape after
  *    the main optimizer batches);
  *  - the Window computes EXACTLY ONE expression: `row_number()` with
  *    the default (UnboundedPreceding, CurrentRow) row frame;
  *  - the filter is `rn <= k` or `rn < k` on that row_number, with a
  *    literal k;
  *  - the projection only passes through child attributes and does NOT
  *    reference rn (a kept rank column changes the result shape — e.g.
  *    q_window_rank — and must not be rewritten).
  * Attribute ids are preserved: the custom node's output IS the window
  * child's output, of which the projection selects a subset.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  private def isDefaultRowNumberFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // partitionSpec must be NON-EMPTY: a global top-k (no partitionBy)
    // would build ClusteredDistribution(Nil), which Spark rejects at
    // planning — and it is better served by TakeOrderedAndProject anyway.
    case p @ Project(projList, Filter(cond, w: Window))
        if w.windowExpressions.length == 1 && w.partitionSpec.nonEmpty =>
      (w.windowExpressions.head, cond) match {
        case (alias @ Alias(WindowExpression(_: RowNumber, spec: WindowSpecDefinition), _),
              cmp @ (_: LessThanOrEqual | _: LessThan))
            if isDefaultRowNumberFrame(spec) =>
          val rn = alias.toAttribute
          val kOpt = cmp match {
            case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
                if a.semanticEquals(rn) => Some(k)
            case LessThan(a: Attribute, IntegerLiteral(k))
                if a.semanticEquals(rn) => Some(k - 1)
            case _ => None
          }
          val passThrough = projList.forall {
            case a: Attribute => !a.semanticEquals(rn)
            case _ => false
          }
          // Spark's own InferWindowGroupLimit has usually already inserted
          // a WindowGroupLimit (rank-limit pushdown) below the Window by
          // the time user rules run. It would be correct but redundant
          // under the heap operator — and it drags two partition-wide
          // Sorts into the physical plan (WindowGroupLimitExec needs
          // sorted input; the heap does not) — so unwrap it. Only a WGL
          // that provably corresponds to THIS row_number filter may be
          // stripped: same partition/order specs, RowNumber rank function,
          // and a limit that keeps at least the k rows we need. Anything
          // else (a stricter limit or different ordering from a future
          // Spark version or another rule) stays as the child — dropping
          // it would change results.
          def matchesWindow(wgl: WindowGroupLimit, k: Int): Boolean =
            wgl.rankLikeFunction.isInstanceOf[RowNumber] &&
              wgl.partitionSpec.length == w.partitionSpec.length &&
              wgl.partitionSpec.zip(w.partitionSpec)
                .forall { case (a, b) => a.semanticEquals(b) } &&
              wgl.orderSpec.length == w.orderSpec.length &&
              wgl.orderSpec.zip(w.orderSpec)
                .forall { case (a, b) => a.semanticEquals(b) } &&
              wgl.limit >= k
          def source(k: Int): LogicalPlan = w.child match {
            case wgl: WindowGroupLimit if matchesWindow(wgl, k) => wgl.child
            case other => other
          }
          kOpt match {
            case Some(k) if passThrough && k >= 0 =>
              Project(projList,
                TopKPerGroupPlan(w.partitionSpec, w.orderSpec, k, source(k)))
            case _ => p
          }
        case _ => p
      }
  }
}
