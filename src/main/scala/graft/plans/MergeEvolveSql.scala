package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** The SQL surface for MERGE WITH SCHEMA EVOLUTION on graft-cow tables
  * (the round-17 verdict brief's #3): Spark 4's grammar already parses
  * `MERGE WITH SCHEMA EVOLUTION INTO …` into a [[MergeIntoTable]] with
  * `withSchemaEvolution = true`, but its built-in resolution evolves the
  * target through a SEPARATE `alterTable` before the merge writes — two
  * commits, with a window where a reader sees the column without its
  * rows. This delegating parser keeps every other statement byte-
  * identical to Spark's and intercepts exactly that plan shape when the
  * target is a graft-cow table, routing it to
  * [[graft.sources.CowStore.mergeEvolve]]'s ONE-commit path (schema +
  * insert files + equality-delete entry, atomically — E369). Installed
  * via `spark.sql.extensions=graft.GraftExtensions`; sessions without
  * the extension keep Spark's native two-commit behavior.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  // transformUp, not a top-level match: the delegate's parameter-aware
  // entry point can hand the statement back under a wrapper node, and
  // the merge must be intercepted wherever it sits.
  private def intercept(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case m: MergeIntoTable if m.withSchemaEvolution =>
      MergeEvolveSql.rewrite(session, m).getOrElse(m)
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    intercept(delegate.parsePlan(sqlText))

  // `spark.sql` (with or without args) routes through THIS entry point;
  // the interface default would drop named parameters on the floor by
  // falling back to parsePlan, so delegate the binding and intercept
  // the bound result.
  override def parsePlanWithParameters(
      sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    intercept(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object MergeEvolveSql {
  /** The (catalog, namespace, table) of an evolving merge's target when
    * that target names a registered [[graft.sources.CowCatalog]] —
    * `None` routes the statement back to Spark's native path untouched.
    */
  private def cowTarget(session: SparkSession,
                        target: LogicalPlan): Option[(String, Identifier)] = {
    val parts = target match {
      case SubqueryAlias(_, UnresolvedRelation(p, _, _)) => p
      case UnresolvedRelation(p, _, _)                   => p
      case _                                             => return None
    }
    try {
      val cm = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.catalogManager
      // Short names resolve against the session's current catalog /
      // namespace (review finding: `USE graft_cow; MERGE ... INTO
      // ops.tbl` must take the one-commit path too, not silently fall
      // back to Spark's two-commit native resolution).
      val (catName, identParts) =
        if (parts.length >= 3) (parts.head, parts.tail)
        else if (parts.length == 2) (cm.currentCatalog.name, parts)
        else (cm.currentCatalog.name, cm.currentNamespace.toSeq ++ parts)
      if (!cm.isCatalogRegistered(catName)) return None
      cm.catalog(catName) match {
        case _: graft.sources.CowCatalog =>
          Some((catName,
            Identifier.of(identParts.init.toArray, identParts.last)))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Rewrite an evolving merge over a graft-cow target into the
    * one-commit command; non-cow targets return None (native path).
    * The cow form is the blind upsert E369 defines — any other clause
    * shape refuses loudly with the required statement.
    */
  private[plans] def rewrite(session: SparkSession,
                             m: MergeIntoTable): Option[LogicalPlan] =
    cowTarget(session, m.targetTable).map { case (cat, ident) =>
      val blind = (m.matchedActions, m.notMatchedActions,
        m.notMatchedBySourceActions) match {
        case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None)),
              Seq()) => true
        case _ => false
      }
      if (!blind) throw new UnsupportedOperationException(
        "graft-cow: MERGE WITH SCHEMA EVOLUTION is the blind keyed " +
          "upsert — exactly WHEN MATCHED THEN UPDATE SET * WHEN NOT " +
          "MATCHED THEN INSERT *, no conditions, no other clauses")
      // The ON clause travels as NAME PARTS, not as an Expression: a
      // raw unresolved expression in a command's constructor would be
      // visited by CheckAnalysis and fail resolution against the
      // command's (empty) children before run() ever saw it.
      val keyNames = m.mergeCondition match {
        case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute) =>
          Some((l.nameParts, r.nameParts))
        case _ => None
      }
      MergeEvolveCommand(cat, ident, m.sourceTable, keyNames,
        m.mergeCondition.sql)
    }
}

/** The one-commit evolving merge as a runnable command: analyzing and
  * running the (still unresolved) source ourselves, validating the ON
  * clause against the table's declared delete-key, then handing the
  * whole upsert to [[graft.sources.CowStore.mergeEvolve]] — identical
  * semantics and guards as the Scala API, now SQL-driven like every
  * other row-level verb in the engine.
  */
case class MergeEvolveCommand(catalog: String, ident: Identifier,
                              source: LogicalPlan,
                              keyCond: Option[(Seq[String], Seq[String])],
                              condSql: String)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val eqKey = graft.sources.CowStore.get(catalog, ident)
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))
      .eqKey.getOrElse(throw new UnsupportedOperationException(
        s"graft-cow: merge-with-schema-evolution rides the equality-delete " +
          s"path — declare 'graft.delete-key' on $catalog.$ident"))
    // The ON clause must be the keyed equi-join on the delete-key: the
    // blind upsert replaces rows BY KEY, so any other predicate would
    // silently change which rows die. Case-insensitive like Spark's own
    // resolution, and the two sides must be DISTINCT references (a
    // same-side `t.key = t.key` is not a target↔source join).
    keyCond match {
      case Some((l, r)) if l.last.equalsIgnoreCase(eqKey) &&
          r.last.equalsIgnoreCase(eqKey) &&
          l.map(_.toLowerCase) != r.map(_.toLowerCase) => ()
      case _ => throw new UnsupportedOperationException(
        s"graft-cow: MERGE WITH SCHEMA EVOLUTION needs ON t.$eqKey = " +
          s"s.$eqKey (the table's delete-key); got: $condSql")
    }
    val qe = cs.sessionState.executePlan(source)
    qe.assertAnalyzed()
    val src = new org.apache.spark.sql.classic.Dataset[Row](cs, qe.analyzed,
      () => org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(qe.analyzed.schema))
    graft.sources.CowStore.mergeEvolve(catalog, ident, src)
    Seq.empty
  }
}
