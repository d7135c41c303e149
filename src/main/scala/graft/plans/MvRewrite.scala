package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, Coalesce, Divide, EvalMode, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, TableCatalog}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Registry of MAINTAINED MATERIALIZED AGGREGATES (the round-17 verdict
  * brief's #4): each entry declares that MV table `mv*` holds the gold
  * aggregate `SELECT <groupCols…>, count(*), sum(<sumSrcCol>) FROM
  * <src> GROUP BY <groupCols…>`, kept current by the change-feed
  * maintenance loop ([[graft.streaming.StreamOps.applyMvBatch]]) up to
  * source commit `appliedVersion`. [[MvRewrite]] consults this to
  * substitute the O(groups) gold scan for the O(table) aggregate — and
  * the freshness gate is exact, not advisory: the source's CURRENT
  * commit version (the store already tracks it) must be ≤
  * appliedVersion, so a stale MV can never serve wrong numbers; it just
  * falls back to the direct aggregate. The maintenance loop advances
  * `appliedVersion` as it applies batches (max `_commit_version` per
  * batch — AvailableNow drains leave it at the source's head).
  *
  * LIFETIME (round 19): the in-memory map is a CACHE. `CALL
  * register_mv` additionally persists the verified entry as a property
  * of the SOURCE table (`graft.mv.registration`, durable beside the
  * commit log), and the catalog re-hydrates this registry when it binds
  * the table in a fresh session/JVM — reader sessions never re-run the
  * registration (or its verification scan). Entries are additionally
  * pinned to table INSTANCES (storage dirs), so a dropped and
  * re-created table can never be served from the old gold data.
  */
object MvRegistry {
  final case class Entry(srcCat: String, srcIdent: Identifier,
                         mvCat: String, mvIdent: Identifier,
                         groupCols: Vector[String], mvGroupCols: Vector[String],
                         countCol: String,
                         sumSrcCol: String, sumMvCol: String,
                         appliedVersion: Long,
                         // TABLE-INSTANCE identity (the storage dirs):
                         // a DROP + re-CREATE under the same name starts
                         // a fresh version history whose low versions
                         // would otherwise satisfy the stale check
                         // against the OLD entry — the rewrite must
                         // never serve the old MV for a new table.
                         srcDir: String = "", mvDir: String = "") {
    require(groupCols.nonEmpty && groupCols.length == mvGroupCols.length,
      "MV registration needs 1+ group columns, source/MV lists parallel")
  }

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
    * Returns the advanced entry (for the caller to persist durably).
    */
  def advance(mvTable: String, version: Long): Option[Entry] = {
    bySrc.replaceAll { (_, e) =>
      if (mvKey(e) == mvTable && version > e.appliedVersion)
        e.copy(appliedVersion = version)
      else e
    }
    import scala.jdk.CollectionConverters._
    bySrc.values.asScala.find(e => mvKey(e) == mvTable)
  }

  /** Whether any entry names `mvTable` (dot-joined) as its MV — the
    * maintenance loop's cheap gate before it spends a per-batch job
    * computing the watermark to advance.
    */
  def isRegisteredMv(mvTable: String): Boolean = entryForMv(mvTable).isDefined

  /** The entry whose MV is `mvTable` (dot-joined), if registered. */
  def entryForMv(mvTable: String): Option[Entry] = {
    val it = bySrc.values.iterator
    while (it.hasNext) {
      val e = it.next()
      if (mvKey(e) == mvTable) return Some(e)
    }
    None
  }

  /** The SOURCE-table property key the verified registration persists
    * under (round 19): the catalog re-hydrates this registry from it
    * when a fresh session/JVM binds the source table.
    */
  val PropKey: String = "graft.mv.registration"

  // '|'-separated fields, each URL-encoded; list fields ','-join their
  // URL-encoded elements. A format-version prefix keeps later shapes
  // decodable (unknown versions hydrate as absent, never wrong).
  def encode(e: Entry): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    def list(xs: Seq[String]) = xs.map(enc).mkString(",")
    Seq("v1", enc(e.mvCat),
      list(e.mvIdent.namespace().toSeq :+ e.mvIdent.name()),
      list(e.groupCols), list(e.mvGroupCols),
      enc(e.countCol), enc(e.sumSrcCol), enc(e.sumMvCol),
      e.appliedVersion.toString, enc(e.srcDir), enc(e.mvDir))
      .mkString("|")
  }

  def decode(srcCat: String, srcIdent: Identifier,
             s: String): Option[Entry] = {
    def dec(x: String) = java.net.URLDecoder.decode(x, "UTF-8")
    def unlist(x: String) = x.split(",", -1).toVector.map(dec)
    s.split("\\|", -1).toSeq match {
      case Seq("v1", mvCat, mvParts, g, mg, n, ss, sm, ver, sd, md) =>
        val parts = unlist(mvParts)
        scala.util.Try(Entry(srcCat, srcIdent,
          dec(mvCat), Identifier.of(parts.init.toArray, parts.last),
          groupCols = unlist(g), mvGroupCols = unlist(mg),
          countCol = dec(n), sumSrcCol = dec(ss), sumMvCol = dec(sm),
          appliedVersion = ver.toLong,
          srcDir = dec(sd), mvDir = dec(md))).toOption
      case _ => None
    }
  }

  /** Re-hydrate this registry from a source table's persisted
    * registration, if any — called when the catalog binds the table in
    * a session whose registry has no entry for it (the fresh-JVM path;
    * the in-memory map is a cache of what `props.tsv` records). The
    * persisted entry was VERIFIED by `CALL register_mv` when written;
    * the dir pin must still match the live table instance (a re-created
    * table's directory differs, so a stale property hydrates nothing),
    * and the usual freshness gate governs every rewrite after.
    */
  def hydrate(srcCat: String, srcIdent: Identifier, srcDir: String,
              prop: Option[String]): Unit =
    if (lookup(srcCat, srcIdent).isEmpty) prop.foreach { s =>
      decode(srcCat, srcIdent, s)
        .filter(e => e.srcDir.nonEmpty && e.srcDir == srcDir)
        .foreach(register)
    }
}

/** Optimizer rule — MATERIALIZED-VIEW REWRITE (the round-17 verdict
  * brief's #4, the second `Rule[LogicalPlan]` tier after
  * [[RowNumberTopKRewrite]]): an aggregate that a registered, FRESH
  * maintained MV can answer is served from the gold table instead of
  * re-aggregating the source, keeping the original output attribute
  * ids so parents are untouched. At 100 TB this converts the
  * dashboard's O(table) scan+shuffle into an O(groups) metadata-sized
  * read — the entire point of maintaining the MV.
  *
  * MATCHED SHAPES (round-19 generalization of the single-shape round-18
  * rule; all grain/column matching uses the session's resolver, so
  * case-insensitive resolution behaves like the rest of Spark):
  *  - GROUP BY on ANY non-empty subset of the registered group columns,
  *    directly over the registered source table's scan (through pure
  *    column-pruning Projects and residual Filters — see below).
  *    The EXACT grain projects the gold rows; a COARSER grain (the
  *    classic rollup rewrite: `GROUP BY region` answered from a
  *    `GROUP BY region, day` MV) RE-AGGREGATES the gold scan —
  *    `count(*) → sum(n)`, `sum(x) → sum(sum_x)` — still O(MV groups),
  *    never O(table).
  *  - Aggregates drawn from: the group columns themselves, `count(*)` /
  *    `count(1)` (plain, no DISTINCT/FILTER), `sum(<registered col>)`
  *    (plain), and `avg(<registered col>)` — decomposed as
  *    `sum / count` from the two columns the gold table already holds
  *    (exact whenever the sum is exact, e.g. integer domains within
  *    2^53 — the maintained-MV contract). Anything else falls through.
  *  - A `WHERE` whose predicate references ONLY registered group
  *    columns (and is deterministic) — group-column predicates select
  *    whole groups, so the filter commutes with the aggregation and is
  *    re-applied ON THE GOLD SCAN (O(groups) rows filtered instead of
  *    O(table)). Predicates touching any non-group column fall through.
  *  - The MV is FRESH: source's current commit version ≤ the registry's
  *    appliedVersion. A stale MV falls through to the direct aggregate
  *    (spec-pinned), so the rewrite can never serve stale numbers.
  *
  * TYPE SAFETY (round-18 ADVICE): `CALL register_mv` refuses an MV
  * whose count/sum/group column types differ from the aggregate's
  * output types (set-op comparison would widen silently), and the
  * rewrite re-checks attribute dataTypes before substituting — the
  * optimizer's output is never re-analyzed, so an ill-typed graft would
  * otherwise surface as runtime failures under the original exprIds.
  * Substituted `count(*)` wraps in `coalesce(n, 0)` to keep the
  * non-nullable type contract of count.
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupExprs, aggExprs, child, _)
        if groupExprs.nonEmpty &&
          groupExprs.forall(_.isInstanceOf[AttributeReference]) =>
      val groups = groupExprs.map(_.asInstanceOf[AttributeReference])
      sourceRelation(child) match {
        case Some((rel, cond)) =>
          rewrite(agg, groups, aggExprs, rel, cond).getOrElse(agg)
        case None => agg
      }
  }

  /** The source table's relation under the aggregate — PRE- or POST-
    * V2 scan planning (this rule may run from the extension's pre-CBO
    * slot, which follows scan planning, or from the experimental user
    * batch), under any mix of pure column-pruning Projects and Filter
    * nodes. Filters are collected (conjoined) and re-checked by the
    * caller; this source keeps EVERY pushed filter as a residual
    * Filter node (`CowScanBuilder.pushFilters` returns all filters),
    * so a predicate can never vanish into the scan and escape the
    * group-column check.
    */
  private def sourceRelation(p: LogicalPlan)
      : Option[(DataSourceV2Relation, Option[Expression])] =
    p match {
      case r: DataSourceV2Relation => Some((r, None))
      case s: DataSourceV2ScanRelation => Some((s.relation, None))
      case Filter(cond, child) =>
        sourceRelation(child).map { case (r, c) =>
          (r, Some(c.map(And(cond, _)).getOrElse(cond)))
        }
      case Project(projs, child)
          if projs.forall(_.isInstanceOf[AttributeReference]) =>
        sourceRelation(child)
      case _ => None
    }

  private def rewrite(agg: Aggregate, groups: Seq[AttributeReference],
                      aggExprs: Seq[NamedExpression],
                      relation: DataSourceV2Relation,
                      cond: Option[Expression]): Option[LogicalPlan] = {
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
    val resolver = conf.resolver
    val entry = MvRegistry.lookup(srcCat, srcIdent).getOrElse(return None)
    // Every query group column must be a registered group column
    // (SUBSET: the exact grain projects, a strict subset re-aggregates).
    val groupIdx = groups.map { g =>
      val i = entry.groupCols.indexWhere(resolver(_, g.name))
      if (i < 0) return None
      i
    }
    if (groupIdx.distinct.length != groupIdx.length) return None
    val exactGrain = groupIdx.length == entry.groupCols.length
    // A residual WHERE may only select whole groups: every referenced
    // attribute must be a registered group column, and the predicate
    // must be deterministic (it will be re-evaluated over gold rows).
    cond.foreach { c =>
      if (!c.deterministic) return None
      if (!c.references.forall {
        case a: AttributeReference =>
          entry.groupCols.exists(resolver(_, a.name))
        case _ => false
      }) return None
    }
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
    def mvAttr(name: String): Option[AttributeReference] =
      mvScan.output.find(a => resolver(a.name, name))
    val mvN = mvAttr(entry.countCol).getOrElse(return None)
    val mvS = mvAttr(entry.sumMvCol).getOrElse(return None)
    // srcGroupCol index -> MV attribute (parallel lists in the entry).
    val mvGroupAt: Int => Option[AttributeReference] =
      i => entry.mvGroupCols.lift(i).flatMap(mvAttr)
    val mvGroupFor: AttributeReference => Option[AttributeReference] =
      a => {
        val i = entry.groupCols.indexWhere(resolver(_, a.name))
        if (i < 0) None else mvGroupAt(i)
      }
    // TYPE GATE (round-18 ADVICE): the grafted attributes' types must
    // equal what the aggregate's parents expect under the original
    // exprIds — the optimizer's output is never re-analyzed.
    if (mvN.dataType != LongType) return None
    groups.foreach { g =>
      if (!mvGroupFor(g).exists(_.dataType == g.dataType)) return None
    }
    // The predicate re-expressed over gold rows: same names, same types
    // (checked above for the grouped columns; condition columns are
    // checked here as they need not appear in GROUP BY).
    val mvCond: Option[Expression] = cond.map(_.transformUp {
      case a: AttributeReference =>
        mvGroupFor(a).filter(_.dataType == a.dataType).getOrElse(return None)
    })
    val filtered: LogicalPlan =
      mvCond.map(Filter(_, mvScan)).getOrElse(mvScan)

    if (exactGrain) {
      // One gold row per group already: pure projection.
      val projections = aggExprs.map {
        case a: AttributeReference if groups.exists(_.semanticEquals(a)) =>
          Alias(mvGroupFor(a).getOrElse(return None), a.name)(exprId = a.exprId)
        case al @ Alias(AggregateExpression(
            Count(Seq(Literal(1, _))), _, false, None, _), name) =>
          Alias(Coalesce(Seq(mvN, Literal(0L, LongType))), name)(
            exprId = al.exprId)
        case al @ Alias(AggregateExpression(
            Sum(e: AttributeReference, _), _, false, None, _), name)
            if resolver(e.name, entry.sumSrcCol) &&
              mvS.dataType == al.dataType =>
          Alias(mvS, name)(exprId = al.exprId)
        case al @ Alias(AggregateExpression(
            Average(e: AttributeReference, _), _, false, None, _), name)
            if resolver(e.name, entry.sumSrcCol) &&
              al.dataType == DoubleType =>
          // avg = sum / count from the columns the gold table already
          // holds — exact whenever the sum is exact in double (integer
          // domains < 2^53): both operands are then exactly
          // representable and IEEE division is correctly rounded, the
          // same value the direct Average computes.
          Alias(Divide(Cast(mvS, DoubleType), Cast(mvN, DoubleType),
            EvalMode.LEGACY), name)(exprId = al.exprId)
        case _ => return None
      }
      Some(Project(projections, filtered))
    } else {
      // COARSER GRAIN (rollup rewrite): re-aggregate the O(groups) gold
      // scan — count(*) = sum(n), sum(x) = sum(sum_x), avg(x) =
      // sum(sum_x) / sum(n) — under the original output exprIds.
      def sumOf(a: AttributeReference): Expression =
        new Sum(a).toAggregateExpression()
      val projections = aggExprs.map {
        case a: AttributeReference if groups.exists(_.semanticEquals(a)) =>
          Alias(mvGroupFor(a).getOrElse(return None), a.name)(exprId = a.exprId)
        case al @ Alias(AggregateExpression(
            Count(Seq(Literal(1, _))), _, false, None, _), name) =>
          Alias(Coalesce(Seq(sumOf(mvN), Literal(0L, LongType))), name)(
            exprId = al.exprId)
        case al @ Alias(AggregateExpression(
            Sum(e: AttributeReference, _), _, false, None, _), name)
            if resolver(e.name, entry.sumSrcCol) &&
              mvS.dataType == al.dataType =>
          // Sum-of-sums keeps the input's Sum output type because the
          // store's sum domains are long/double, where Sum(Sum(T)) = T.
          Alias(sumOf(mvS), name)(exprId = al.exprId)
        case al @ Alias(AggregateExpression(
            Average(e: AttributeReference, _), _, false, None, _), name)
            if resolver(e.name, entry.sumSrcCol) &&
              al.dataType == DoubleType =>
          Alias(Divide(Cast(sumOf(mvS), DoubleType),
            Cast(sumOf(mvN), DoubleType), EvalMode.LEGACY), name)(
            exprId = al.exprId)
        case _ => return None
      }
      val mvGroups = groups.map(g => mvGroupFor(g).getOrElse(return None))
      Some(Aggregate(mvGroups, projections, filtered))
    }
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
