package org.apache.spark.sql.pipelines

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.pipelines.graph._

/** Bridge into Spark 4.1's DECLARATIVE PIPELINES runtime
  * (`spark-pipelines_2.13-4.1.2.jar` — the SDP engine donated from the
  * DLT lineage): the Scala graph API (`GraphRegistrationContext` →
  * `DataflowGraph` → `PipelineUpdateContextImpl` → `PipelineExecution`)
  * is scoped `private[pipelines]`/`private[sql]` in 4.1 (the shipped
  * user entry points are the Python CLI + spark-connect handlers), so —
  * exactly like [[org.apache.spark.sql.GraftSqlBridge]] for the Column ⇄
  * Expression seam — this one-object shim lives in the
  * `org.apache.spark.sql.pipelines` package and exposes a minimal public
  * surface: declare batch tables from SQL, run the triggered update
  * in-process, hand back the pipeline's event log.
  *
  * What the runtime does with the declaration (none of it reimplemented
  * here — the POINT is exercising the shipped engine): topologically
  * sorts flows by their table references, analyzes each flow's plan
  * against upstream PIPELINE tables, materializes every table into the
  * session catalog (`DatasetManager`), and executes flows with
  * dependency-aware scheduling + retries (`TriggeredGraphExecution`).
  */
object GraftPipelineBridge {

  /** One declared batch table: `name` materializes in `database` from
    * `sql`, which may reference other declared tables by name — those
    * references become the dataflow edges.
    */
  final case class TableSpec(name: String, sql: String)

  /** Declare and run a batch pipeline; returns the event log lines the
    * runtime emitted (flow queued/running/finished transitions), which
    * callers can assert scheduling order on. Tables materialize as
    * `spark_catalog.<database>.<name>` parquet tables readable by any
    * follow-up query.
    */
  def runBatchPipeline(spark: SparkSession, database: String,
                       tables: Seq[TableSpec], storageRoot: String): Seq[String] = {
    val ctx = new GraphRegistrationContext(
      defaultCatalog = "spark_catalog", defaultDatabase = database,
      defaultSqlConf = Map.empty)
    tables.foreach { t =>
      val ident = TableIdentifier(t.name, Some(database), Some("spark_catalog"))
      ctx.registerTable(Table(
        identifier = ident,
        specifiedSchema = None,
        partitionCols = None,
        clusterCols = None,
        normalizedPath = None,
        properties = Map.empty,
        comment = None,
        origin = QueryOrigin.empty,
        isStreamingTable = false,
        format = Some("parquet")))
      val plan = spark.sessionState.sqlParser.parsePlan(t.sql)
      ctx.registerFlow(new UnresolvedFlow(
        identifier = ident,
        destinationIdentifier = ident,
        func = FlowAnalysis.createFlowFunctionFromLogicalPlan(plan),
        queryContext = QueryContext(Some("spark_catalog"), Some(database)),
        sqlConf = Map.empty,
        once = false,
        origin = QueryOrigin.empty))
    }
    val graph = ctx.toDataflowGraph
    val events = ListBuffer.empty[String]
    val updateCtx = new PipelineUpdateContextImpl(
      unresolvedGraph = graph,
      eventCallback = e => { events.synchronized { events += e.toString }: Unit },
      refreshTables = AllTables,
      fullRefreshTables = NoTables,
      storageRoot = storageRoot)
    updateCtx.pipelineExecution.runPipeline()
    events.synchronized(events.toList)
  }
}
