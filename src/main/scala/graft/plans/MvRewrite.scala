package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, TableCatalog}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Registry of MAINTAINED MATERIALIZED AGGREGATES (the round-17 verdict
  * brief's #4): each entry declares that MV table `mv*` holds the gold
  * aggregate `SELECT <groupCol>, count(*), sum(<sumSrcCol>) FROM <src>
  * GROUP BY <groupCol>`, kept current by the change-feed maintenance
  * loop ([[graft.streaming.StreamOps.applyMvBatch]]) up to source
  * commit `appliedVersion`. [[MvRewrite]] consults this to substitute
  * the O(groups) gold scan for the O(table) aggregate — and the
  * freshness gate is exact, not advisory: the source's CURRENT commit
  * version (the store already tracks it) must be ≤ appliedVersion, so
  * a stale MV can never serve wrong numbers; it just falls back to the
  * direct aggregate. The maintenance loop advances `appliedVersion` as
  * it applies batches (max `_commit_version` per batch — AvailableNow
  * drains leave it at the source's head). SESSION-SCOPED by design (the
  * temp-view model): registrations die with the JVM and are re-declared
  * — and re-VERIFIED by `CALL register_mv` — per session; entries are
  * additionally pinned to table INSTANCES (storage dirs), so a dropped
  * and re-created table can never be served from the old gold data.
  */
object MvRegistry {
  final case class Entry(srcCat: String, srcIdent: Identifier,
                         mvCat: String, mvIdent: Identifier,
                         groupCol: String, mvGroupCol: String,
                         countCol: String,
                         sumSrcCol: String, sumMvCol: String,
                         appliedVersion: Long,
                         // TABLE-INSTANCE identity (the storage dirs):
                         // a DROP + re-CREATE under the same name starts
                         // a fresh version history whose low versions
                         // would otherwise satisfy the stale check
                         // against the OLD entry — the rewrite must
                         // never serve the old MV for a new table.
                         srcDir: String = "", mvDir: String = "")

  private def srcKey(cat: String, ident: Identifier): String =
    (cat +: ident.namespace().toSeq :+ ident.name()).mkString(".")
  private def mvKey(e: Entry): String = srcKey(e.mvCat, e.mvIdent)

  private val bySrc = new ConcurrentHashMap[String, Entry]()

  def register(e: Entry): Unit = bySrc.put(srcKey(e.srcCat, e.srcIdent), e): Unit

  def deregister(srcCat: String, srcIdent: Identifier): Unit =
    bySrc.remove(srcKey(srcCat, srcIdent)): Unit

  def lookup(srcCat: String, srcIdent: Identifier): Option[Entry] =
    Option(bySrc.get(srcKey(srcCat, srcIdent)))

  /** Maintenance applied source commits up to `version` into the MV
    * named by `mvTable` (dot-joined) — advance its freshness watermark.
    */
  def advance(mvTable: String, version: Long): Unit =
    bySrc.replaceAll { (_, e) =>
      if (mvKey(e) == mvTable && version > e.appliedVersion)
        e.copy(appliedVersion = version)
      else e
    }

  /** Whether any entry names `mvTable` (dot-joined) as its MV — the
    * maintenance loop's cheap gate before it spends a per-batch job
    * computing the watermark to advance.
    */
  def isRegisteredMv(mvTable: String): Boolean = {
    val it = bySrc.values.iterator
    while (it.hasNext) if (mvKey(it.next()) == mvTable) return true
    false
  }
}

/** Optimizer rule — MATERIALIZED-VIEW REWRITE (the round-17 verdict
  * brief's #4, the second `Rule[LogicalPlan]` tier after
  * [[RowNumberTopKRewrite]]): an aggregate that matches a registered,
  * FRESH maintained MV is answered from the gold table instead of
  * re-aggregating the source — `Aggregate(g, [g, count(*), sum(x)],
  * scan src)` becomes `Project(scan mv)` with the original output
  * attribute ids, so parents are untouched. At 100 TB this converts the
  * dashboard's O(table) scan+shuffle into an O(groups) metadata-sized
  * read — the entire point of maintaining the MV.
  *
  * The match is deliberately narrow (all required):
  *  - a single-column GROUP BY on the registered group column, directly
  *    over the registered source table's scan (post column-pruning
  *    shape: `Aggregate` over `DataSourceV2ScanRelation`);
  *  - aggregate expressions drawn ONLY from: the group column itself,
  *    `count(*)` / `count(1)` (plain, no DISTINCT/FILTER), and
  *    `sum(<registered column>)` (plain) — anything else falls through;
  *  - the MV is FRESH: source's current commit version ≤ the registry's
  *    appliedVersion. A stale MV falls through to the direct aggregate
  *    (spec-pinned), so the rewrite can never serve stale numbers.
  * Substituted `count(*)` wraps in `coalesce(n, 0)` to keep the
  * non-nullable type contract of count.
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
      sourceRelation(child)
        .flatMap(rel => rewrite(agg, g, aggExprs, rel)).getOrElse(agg)
  }

  /** The source table's relation under the aggregate — PRE- or POST-
    * V2 scan planning (this rule may run from the extension's pre-CBO
    * slot, which precedes scan planning, or from the experimental user
    * batch, which follows it), optionally under the pure column-pruning
    * Project the analyzer leaves on v2 relations.
    */
  private def sourceRelation(p: LogicalPlan): Option[DataSourceV2Relation] =
    p match {
      case r: DataSourceV2Relation => Some(r)
      case s: DataSourceV2ScanRelation => Some(s.relation)
      case Project(projs, child)
          if projs.forall(_.isInstanceOf[AttributeReference]) =>
        sourceRelation(child)
      case _ => None
    }

  private def rewrite(agg: Aggregate, g: AttributeReference,
                      aggExprs: Seq[NamedExpression],
                      relation: DataSourceV2Relation): Option[LogicalPlan] = {
    // Only MAIN's CURRENT snapshot may be answered from the gold table:
    // a VERSION/TIMESTAMP AS OF or branch scan keeps the same
    // catalog/identifier, and serving it current numbers would be
    // silently wrong history (review finding, round 18).
    relation.table match {
      case t: graft.sources.CowTable if t.isCurrentMain => ()
      case _ => return None
    }
    val srcIdent = relation.identifier.getOrElse(return None)
    val srcCat = relation.catalog.map(_.name).getOrElse(return None)
    val entry = MvRegistry.lookup(srcCat, srcIdent)
      .filter(_.groupCol == g.name).getOrElse(return None)
    // FRESHNESS: the source's head must already be folded into the MV —
    // and the entry must name the SAME TABLE INSTANCES it was verified
    // against (a drop + re-create under the same name restarts the
    // version clock; its low versions must never read as fresh).
    val fresh = graft.sources.CowStore.get(entry.srcCat, entry.srcIdent)
      .exists(st => st.version <= entry.appliedVersion &&
        (entry.srcDir.isEmpty || st.dir == entry.srcDir))
    val mvSame = graft.sources.CowStore.get(entry.mvCat, entry.mvIdent)
      .exists(st => entry.mvDir.isEmpty || st.dir == entry.mvDir)
    if (!fresh || !mvSame) return None
    val mvScan = loadMvScan(entry).getOrElse(return None)
    val byName = mvScan.output.map(a => a.name -> a).toMap
    val (mvG, mvN, mvS) = (byName.get(entry.mvGroupCol),
      byName.get(entry.countCol), byName.get(entry.sumMvCol)) match {
      case (Some(a), Some(b), Some(c)) => (a, b, c)
      case _ => return None
    }
    val projections = aggExprs.map {
      case a: AttributeReference if a.semanticEquals(g) =>
        Alias(mvG, a.name)(exprId = a.exprId)
      case al @ Alias(AggregateExpression(
          Count(Seq(Literal(1, _))), _, false, None, _), name) =>
        Alias(Coalesce(Seq(mvN, Literal(0L, LongType))), name)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(
          Sum(e: AttributeReference, _), _, false, None, _), name)
          if e.name == entry.sumSrcCol =>
        Alias(mvS, name)(exprId = al.exprId)
      case _ => return None
    }
    Some(Project(projections, mvScan))
  }

  /** A fully-formed scan of the MV table (the user-rule batch runs
    * AFTER V2 scan planning, so a raw relation would never be planned —
    * build the `DataSourceV2ScanRelation` the pushdown rule would have).
    */
  private def loadMvScan(e: MvRegistry.Entry): Option[DataSourceV2ScanRelation] =
    try {
      val session = org.apache.spark.sql.SparkSession.active
        .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      session.sessionState.catalogManager.catalog(e.mvCat) match {
        case tc: TableCatalog =>
          val table = tc.loadTable(e.mvIdent)
          val relation = DataSourceV2Relation.create(table, Some(tc),
            Some(e.mvIdent))
          val scan = table.asInstanceOf[SupportsRead]
            .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
          val byName = relation.output.map(a => a.name -> a).toMap
          Some(DataSourceV2ScanRelation(relation, scan,
            scan.readSchema().fieldNames.toSeq.flatMap(byName.get)))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
