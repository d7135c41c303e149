package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.{Collections => JCollections, UUID}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.schema.{MessageType, MessageTypeParser}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A minimal COPY-ON-WRITE parquet table catalog implementing the DSv2
  * row-level-operation surface (`SupportsRowLevelOperations`), which is what
  * turns the SQL write-side primitives — `MERGE INTO … WHEN MATCHED/NOT
  * MATCHED`, `UPDATE`, `DELETE` — into real engine capabilities instead of
  * the hand-rolled DataFrame folds `q_scd2_apply`/`q_stream_cdc_apply`
  * emulate them with. The reference's pipeline is read-only (app.py never
  * mutates its fetched frames); this is the write-side capability a user
  * of the ENGINE reaches for next, built on the public connector API the
  * way Iceberg/Delta build theirs.
  *
  * Shape of the implementation (all public DSv2, no Catalyst internals):
  *
  *  - [[CowCatalog]]: a `TableCatalog` whose state lives in the JVM-global
  *    [[CowStore]] (catalog instances are constructed per session; the
  *    store is the "metastore"). Tables are directories of immutable
  *    parquet files + a versioned file-list pointer.
  *  - [[CowTable]]: `SupportsRead` (one `InputPartition` per file, column
  *    pruning pushed to the parquet reader's projection) + `SupportsWrite`
  *    (append, and truncate-overwrite for `INSERT OVERWRITE`) +
  *    `SupportsRowLevelOperations`.
  *  - [[CowRowLevelOperation]]: GROUP-BASED (no `SupportsDelta`), so
  *    Catalyst's `RewriteMergeIntoTable`/`RewriteUpdateTable`/
  *    `RewriteDeleteFromTable` plan a `ReplaceData` over the op's own scan
  *    and the commit atomically swaps the affected groups for the
  *    rewritten rows. Groups are FILES: the operation requires the
  *    [[CowFileColumn]] `_file` metadata column, the scan serves it and
  *    accepts Catalyst's runtime group filter
  *    (`RowLevelOperationRuntimeGroupFiltering` injects
  *    `_file IN (matching groups)` via `SupportsRuntimeV2Filtering`), and
  *    the commit replaces exactly the files the filtered scan read —
  *    I/O is O(affected groups), not O(table), which is what makes
  *    copy-on-write usable at 100 TB. A command whose matches touch
  *    every file degrades gracefully to the full rewrite.
  *  - Commits REPLACE the pointer, never delete superseded files: an
  *    in-flight scan planned against version N keeps reading N's files
  *    after a concurrent commit of N+1 (reader snapshot isolation, the
  *    lakehouse contract). Vacuuming old versions is out of scope.
  *
  * Write distribution: each task writes its own parquet file
  * executor-side (`data-<uuid>.parquet` — no driver data movement, no
  * write coordination beyond the commit-message file list); empty
  * partitions produce no file. Commit is a single pointer swap in the
  * store — the miniature of a metastore/Iceberg snapshot commit.
  *
  * Column types are the fixture triple (long, double, string) — enough
  * for every row-level scenario in the suite; anything else fails loudly
  * at CREATE.
  */
object CowStore {
  /** One table version: the current schema and the immutable file list,
    * plus the full version → file-list history (commits never delete
    * superseded files, so every retained version stays READABLE — the
    * snapshot/time-travel contract; vacuuming is out of scope).
    */
  /** Per-file statistics collected AT WRITE TIME by the task that wrote
    * the file (the manifest-entry miniature): row/byte counts feed the
    * planner ([[CowScan]] reports them via `SupportsReportStatistics`, so
    * a small COW table broadcasts like any sized relation), and the
    * per-long-column value ranges feed PLAN-TIME FILE SKIPPING (a
    * predicate outside a file's [min, max] prunes the file before any
    * I/O — Iceberg manifests / parquet row-group stats, one level up).
    * Ranges cover non-null values only; a file with no range entry for a
    * column is conservatively kept.
    */
  final case class ColRange(min: Long, max: Long)
  final case class FileStats(rows: Long, bytes: Long,
                             longRanges: Map[String, ColRange])

  final case class State(schema: StructType, version: Long,
                         files: Vector[String], dir: String,
                         history: Map[Long, Vector[String]] = Map(0L -> Vector.empty),
                         stats: Map[String, FileStats] = Map.empty) {
    def filesAt(v: Long): Vector[String] =
      history.getOrElse(v,
        throw new IllegalArgumentException(
          s"graft-cow: no such version $v (have ${history.keys.toSeq.sorted})"))
  }

  private val tables = new ConcurrentHashMap[String, State]()

  private def key(catalog: String, ident: Identifier): String =
    (catalog +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  def get(catalog: String, ident: Identifier): Option[State] =
    Option(tables.get(key(catalog, ident)))

  def create(catalog: String, ident: Identifier, schema: StructType): State = {
    schema.fields.foreach { f =>
      require(Seq(LongType, DoubleType, StringType).contains(f.dataType),
        s"graft-cow supports long/double/string columns; got " +
          s"${f.name}: ${f.dataType.simpleString}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cow_").toString
    val st = State(schema, 0L, Vector.empty, dir)
    if (tables.putIfAbsent(key(catalog, ident), st) != null)
      throw new TableAlreadyExistsException(ident.toString)
    st
  }

  def drop(catalog: String, ident: Identifier): Boolean =
    tables.remove(key(catalog, ident)) != null

  def list(catalog: String, namespace: Array[String]): Array[Identifier] = {
    import scala.jdk.CollectionConverters._
    val prefix = (catalog +: namespace.toSeq).mkString("/") + "/"
    tables.keySet().asScala.toArray.sorted.collect {
      case k if k.startsWith(prefix) && !k.stripPrefix(prefix).contains("/") =>
        Identifier.of(namespace, k.stripPrefix(prefix))
    }
  }

  /** Publish a write: `remove = None` appends; `remove = Some(gone)`
    * replaces exactly those files with the new ones — the GROUP-LEVEL
    * copy-on-write commit (whole-table replace = `gone` being every
    * current file; INSERT OVERWRITE passes exactly that). Synchronized
    * pointer swap = the atomic commit; superseded files stay on disk for
    * in-flight readers of older versions.
    */
  def commit(catalog: String, ident: Identifier, newFiles: Seq[String],
             remove: Option[Set[String]],
             newStats: Map[String, FileStats] = Map.empty): Unit = synchronized {
    val k = key(catalog, ident)
    val st = Option(tables.get(k)).getOrElse(
      throw new IllegalStateException(s"graft-cow: commit to dropped table $k"))
    val files = remove match {
      case None       => st.files ++ newFiles
      case Some(gone) => st.files.filterNot(gone) ++ newFiles
    }
    // Superseded files keep their stats: old versions stay readable and
    // their time-travel scans skip/size with the same fidelity.
    tables.put(k, st.copy(version = st.version + 1, files = files,
      history = st.history + ((st.version + 1) -> files),
      stats = st.stats ++ newStats))
  }
}

class CowCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    CowStore.list(catalogName, namespace)

  override def loadTable(ident: Identifier): Table =
    CowStore.get(catalogName, ident)
      .map(_ => new CowTable(catalogName, ident))
      .getOrElse(throw new NoSuchTableException(ident))

  /** `VERSION AS OF v` time travel: superseded files are never deleted
    * and every commit records its file list, so any retained version is
    * an ordinary (read-only) scan of its pinned file set.
    */
  override def loadTable(ident: Identifier, version: String): Table =
    CowStore.get(catalogName, ident)
      .map { st =>
        val v = scala.util.Try(version.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"graft-cow: version must be a commit number, got '$version'"))
        st.filesAt(v): Unit // fail loudly at resolution, not first scan
        new CowTable(catalogName, ident, pinnedVersion = Some(v))
      }
      .getOrElse(throw new NoSuchTableException(ident))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-cow: partition transforms are not supported (single-group COW)")
    CowStore.create(catalogName, ident, schema)
    new CowTable(catalogName, ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft-cow: ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean =
    CowStore.drop(catalogName, ident)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft-cow: RENAME not supported")
}

/** The `_file` metadata column — the GROUP identity of the copy-on-write
  * scheme (Iceberg's `_file` in miniature): the row-level operation
  * requires it, the scan serves it, and the runtime group filter prunes
  * on it so a MERGE/UPDATE/DELETE rewrites only the files that contain
  * matches.
  */
object CowFileColumn extends MetadataColumn {
  val Name = "_file"
  override def name(): String = Name
  override def dataType(): org.apache.spark.sql.types.DataType = StringType
  override def isNullable: Boolean = false
  override def comment(): String = "graft-cow source file (COW group id)"
}

class CowTable(catalog: String, ident: Identifier,
               pinnedVersion: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  private def state: CowStore.State = {
    val st = CowStore.get(catalog, ident).getOrElse(
      throw new NoSuchTableException(ident))
    // A version-pinned load scans that commit's file list; the table is
    // read-only (writes go through the CURRENT version only).
    pinnedVersion.fold(st)(v => st.copy(version = v, files = st.filesAt(v)))
  }

  private def requireWritable(): Unit =
    require(pinnedVersion.isEmpty,
      s"graft-cow: VERSION AS OF ${pinnedVersion.get} relations are read-only")

  override def name(): String =
    (catalog +: ident.namespace().toSeq :+ ident.name()).mkString(".") +
      pinnedVersion.fold("")(v => s"@v$v")
  override def schema(): StructType = state.schema
  override def metadataColumns(): Array[MetadataColumn] = Array(CowFileColumn)
  override def capabilities(): java.util.Set[TableCapability] = {
    val s = new java.util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.BATCH_WRITE)
    s.add(TableCapability.TRUNCATE)
    JCollections.unmodifiableSet(s)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CowScanBuilder(name(), state, op = None)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireWritable()
    new CowWriteBuilder(catalog, ident, state, op = None, info.schema())
  }

  /** Group-based row-level operation with FILE-LEVEL groups:
    * MERGE/UPDATE/DELETE read through the op's scan (which serves the
    * `_file` metadata column and accepts the runtime group filter), and
    * the commit replaces exactly the files the filtered scan read. No
    * `SupportsDelta` ⇒ Catalyst plans `ReplaceData`; with
    * `requiredMetadataAttributes = [_file]`,
    * `RowLevelOperationRuntimeGroupFiltering` injects the dynamic
    * IN-subquery that narrows the rewrite to matching groups.
    */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    requireWritable()
    () => new CowRowLevelOperation(catalog, ident, name(), state, info)
  }
}

/** One row-level command's shared context: the SAME operation instance
  * backs the target scan and the replacing write (that is
  * `RowLevelOperationTable`'s contract), so the scan records here which
  * files the (possibly runtime-group-filtered) read actually served and
  * the write's commit removes exactly those.
  */
class CowRowLevelOperation(catalog: String, ident: Identifier,
                           tableName: String, state: CowStore.State,
                           info: RowLevelOperationInfo)
    extends RowLevelOperation {
  /** Files the op's scan will read — the groups being rewritten. Set at
    * scan-snapshot time (all current files), narrowed by the runtime
    * group filter when it fires.
    */
  val scannedFiles = new java.util.concurrent.atomic.AtomicReference[Set[String]](
    state.files.toSet)

  override def command(): RowLevelOperation.Command = info.command()

  override def requiredMetadataAttributes(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(CowFileColumn.Name))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CowScanBuilder(tableName, state, op = Some(this))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CowWriteBuilder(catalog, ident, state, op = Some(this), info.schema())

  override def description(): String =
    s"graft-cow ${info.command()} on $tableName (groups = files)"
}

/** Column pruning pushed down to the parquet reader's projection — same
  * I/O-layer contract as [[ReplayReaderFactory]]. The required schema may
  * include the [[CowFileColumn]] metadata column (row-level op scans ask
  * for it); it is synthesized per partition, never read from parquet.
  */
class CowScanBuilder(tableName: String, state: CowStore.State,
                     op: Option[CowRowLevelOperation])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = state.schema
  private var skippable: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(
      state.schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)) ++
        requiredSchema.fields.filter(_.name == CowFileColumn.Name))

  /** File-skipping pushdown: comparisons on long columns are retained
    * for [[CowScan]]'s min/max pruning, but EVERY filter is also returned
    * as residual — skipping prunes whole files, Spark still evaluates the
    * predicate on surviving rows, so a stats bug can only cost I/O
    * sav­ings, never correctness.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def longCol(c: String): Boolean =
      state.schema.fields.exists(f => f.name == c && f.dataType == LongType)
    def longVal(v: Any): Boolean = v.isInstanceOf[java.lang.Number]
    skippable = filters.filter {
      case EqualTo(c, v)            => longCol(c) && longVal(v)
      case GreaterThan(c, v)        => longCol(c) && longVal(v)
      case GreaterThanOrEqual(c, v) => longCol(c) && longVal(v)
      case LessThan(c, v)           => longCol(c) && longVal(v)
      case LessThanOrEqual(c, v)    => longCol(c) && longVal(v)
      case _ => false
    }
    filters // all residual by design
  }

  override def pushedFilters(): Array[Filter] = skippable

  override def build(): Scan =
    new CowScan(tableName, state, required, op, skippable)
}

/** Snapshot at plan time: the file list this scan will read is pinned at
  * construction, so a later commit (including the row-level op this scan
  * may be feeding) never changes what an already-planned query reads.
  * For row-level op scans, [[SupportsRuntimeV2Filtering]] accepts the
  * group filter Catalyst injects (`_file IN (matching groups)`): the file
  * list narrows to the matching groups, and the shared
  * [[CowRowLevelOperation]] records them so the commit replaces exactly
  * what was read.
  */
class CowScan(tableName: String, state: CowStore.State,
              required: StructType, op: Option[CowRowLevelOperation],
              skipFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  /** STATIC file skipping from write-time stats: drop files whose
    * per-column [min, max] cannot satisfy the pushed conjunction. A file
    * without stats (or without a range for the column) is kept.
    */
  private def surviveSkipping(f: String): Boolean =
    state.stats.get(f).forall { fs =>
      import org.apache.spark.sql.sources._
      def rng(c: String) = fs.longRanges.get(c)
      skipFilters.forall {
        case EqualTo(c, v: java.lang.Number) =>
          rng(c).forall(r => r.min <= v.longValue() && v.longValue() <= r.max)
        case GreaterThan(c, v: java.lang.Number) =>
          rng(c).forall(_.max > v.longValue())
        case GreaterThanOrEqual(c, v: java.lang.Number) =>
          rng(c).forall(_.max >= v.longValue())
        case LessThan(c, v: java.lang.Number) =>
          rng(c).forall(_.min < v.longValue())
        case LessThanOrEqual(c, v: java.lang.Number) =>
          rng(c).forall(_.min <= v.longValue())
        case _ => true
      }
    }

  @volatile private var files: Vector[String] =
    state.files.filter(surviveSkipping)
  // A row-level op's commit replaces exactly what its scan READ: the
  // static skip above already narrowed the read set, so record it — a
  // skipped file's rows must never be dropped by the rewrite.
  op.foreach(_.scannedFiles.set(files.toSet))

  /** Write-time stats make the COW table a SIZED relation: the planner
    * sees Σ bytes / Σ rows of the (skip-pruned) file set instead of the
    * unknown-size default, so a small table broadcasts and join sides
    * order correctly. Files without stats contribute unknown → report
    * only when every surviving file is covered.
    */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val covered = files.forall(state.stats.contains)
      override def sizeInBytes(): java.util.OptionalLong =
        if (covered)
          java.util.OptionalLong.of(files.map(state.stats(_).bytes).sum)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        if (covered)
          java.util.OptionalLong.of(files.map(state.stats(_).rows).sum)
        else java.util.OptionalLong.empty()
    }

  override def filterAttributes(): Array[NamedReference] =
    if (op.isDefined) Array(Expressions.column(CowFileColumn.Name)) else Array.empty

  override def filter(predicates: Array[Predicate]): Unit = {
    // Collect the IN/= sets on _file; unparseable predicates are ignored
    // (pruning is optional — correctness never depends on it).
    val keeps = predicates.flatMap(inFileSet)
    if (keeps.nonEmpty) {
      val keep = keeps.reduce(_ intersect _)
      files = files.filter(keep)
      op.foreach(_.scannedFiles.set(files.toSet))
    }
  }

  private def inFileSet(p: Predicate): Option[Set[String]] = {
    import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Lit}
    def refIsFile(e: V2Expr) = e match {
      case r: NamedReference => r.fieldNames().sameElements(Array(CowFileColumn.Name))
      case _ => false
    }
    // Match the public Literal interface (LiteralValue is private[sql]).
    def strLit(e: V2Expr): Option[String] = e match {
      case l: V2Lit[_] if l.dataType() == StringType =>
        Option(l.value()).map(_.toString)
      case _ => None
    }
    val kids = p.children()
    p.name() match {
      case "IN" if kids.nonEmpty && refIsFile(kids.head) =>
        val vals = kids.tail.flatMap(strLit)
        if (vals.length == kids.length - 1) Some(vals.toSet) else None
      case "=" if kids.length == 2 && refIsFile(kids.head) =>
        strLit(kids(1)).map(Set(_))
      case _ => None
    }
  }

  override def readSchema(): StructType = required
  override def description(): String = {
    val skipped = state.files.size - files.size
    val pushed =
      if (skipFilters.isEmpty) ""
      else s" skipBy[${skipFilters.mkString(",")}]"
    s"graft-cow scan of $tableName v${state.version} " +
      s"[${required.fieldNames.mkString(",")}] " +
      s"(${files.size} of ${state.files.size} files, $skipped skipped)$pushed"
  }
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(CowFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    CowReaderFactory(required, state.schema)
}

case class CowFilePartition(file: String) extends InputPartition

/** Executor-side parquet Group reader over one immutable file, projection
  * pushed to parquet-mr (`parquet.read.schema`) so unrequested columns'
  * pages are never decoded. Generalizes [[ReplayReaderFactory]]'s pattern
  * to an arbitrary long/double/string schema.
  */
case class CowReaderFactory(schema: StructType, tableSchema: StructType)
    extends PartitionReaderFactory {

  // The _file metadata column is synthesized per partition, never decoded
  // from parquet. A physically column-less projection (count(*) scans, or
  // _file-only reads) still needs one parquet column to drive row
  // iteration; fall back to the narrowest table column.
  private def physicalFields = {
    val data = schema.fields.filter(_.name != CowFileColumn.Name)
    if (data.isEmpty) tableSchema.fields.take(1) else data
  }

  private def parquetProjection: String =
    physicalFields.map { f =>
      val t = f.dataType match {
        case LongType   => "int64"
        case DoubleType => "double"
        case StringType => "binary"
        case other => throw new IllegalArgumentException(
          s"graft-cow: unsupported column type ${other.simpleString} for ${f.name}")
      }
      s"  optional $t ${f.name};"
    }.mkString("message graft_cow_projection {\n", "\n", "\n}")

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[CowFilePartition].file
    new PartitionReader[InternalRow] {
      private val reader: ParquetReader[Group] = {
        val conf = new Configuration()
        conf.set(ReadSupport.PARQUET_READ_SCHEMA, parquetProjection)
        ParquetReader.builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(file)).withConf(conf).build()
      }
      private var current: Group = _

      override def next(): Boolean = {
        current = reader.read()
        current != null
      }

      private val filePath = UTF8String.fromString(file)

      override def get(): InternalRow = {
        val g = current
        def has(name: String): Boolean = {
          val i = g.getType.getFieldIndex(name)
          g.getFieldRepetitionCount(i) > 0
        }
        new GenericInternalRow(schema.fields.map[Any] { f =>
          if (f.name == CowFileColumn.Name) filePath
          else if (!has(f.name)) null
          else f.dataType match {
            case LongType   => g.getLong(g.getType.getFieldIndex(f.name), 0)
            case DoubleType => g.getDouble(g.getType.getFieldIndex(f.name), 0)
            case StringType =>
              UTF8String.fromString(g.getString(g.getType.getFieldIndex(f.name), 0))
          }
        })
      }

      override def close(): Unit = reader.close()
    }
  }
}

/** Append by default; `truncate()` (INSERT OVERWRITE) replaces every
  * current file; a row-level write (`op` present) replaces exactly the
  * files the op's (runtime-group-filtered) scan served.
  */
class CowWriteBuilder(catalog: String, ident: Identifier,
                      state: CowStore.State, op: Option[CowRowLevelOperation],
                      writeSchema: StructType, truncateAll: Boolean = false)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new CowWriteBuilder(catalog, ident, state, op, writeSchema,
      truncateAll = true)

  override def build(): Write = new Write {
    override def description(): String = {
      val mode =
        if (op.isDefined) "replace-groups"
        else if (truncateAll) "truncate" else "append"
      s"graft-cow $mode to " +
        (catalog +: ident.namespace().toSeq :+ ident.name()).mkString(".")
    }
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        CowWriterFactory(state.dir, writeSchema, state.schema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        // Row-level ops remove the scanned (= rewritten) groups; truncate
        // removes everything current; append removes nothing. Reading the
        // op's record HERE — after the rewrite query ran — picks up the
        // runtime group filter's narrowing.
        val remove =
          op.map(_.scannedFiles.get())
            .orElse(if (truncateAll) Some(state.files.toSet) else None)
        val msgs = messages.map(_.asInstanceOf[CowCommitMessage])
        CowStore.commit(catalog, ident,
          msgs.flatMap(_.files.map(_._1)).toSeq, remove,
          msgs.flatMap(_.files).toMap)
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        messages.foreach {
          case CowCommitMessage(files) => files.foreach { case (f, _) =>
            new java.io.File(f).delete(): Unit
          }
          case _ => ()
        }
    }
  }
}

case class CowCommitMessage(files: Seq[(String, CowStore.FileStats)])
    extends WriterCommitMessage

/** Executor-side writer: one parquet file per non-empty task, written with
  * parquet-hadoop's Group API; a zero-row task deletes its just-opened
  * file and contributes nothing (no empty-file litter at 32 partitions ×
  * small results). Only files named in COMMITTED messages enter the table
  * state — files from aborted/speculative attempts are never visible.
  *
  * Incoming rows are laid out in `writeSchema` order (the
  * `LogicalWriteInfo` schema — for a row-level ReplaceData that's the
  * rewrite query's output, NOT necessarily table order), so extraction
  * indexes/types come from `writeSchema` and each table column is located
  * BY NAME; the parquet file itself is always written in table-schema
  * shape. A table column missing from the write schema fails loudly.
  */
case class CowWriterFactory(dir: String, writeSchema: StructType,
                            tableSchema: StructType)
    extends DataWriterFactory {

  private def messageType: String =
    tableSchema.fields.map { f =>
      val t = f.dataType match {
        case LongType   => "int64"
        case DoubleType => "double"
        case StringType => "binary"
        case other => throw new IllegalArgumentException(
          s"graft-cow: unsupported column type ${other.simpleString} for ${f.name}")
      }
      s"  optional $t ${f.name};"
    }.mkString("message graft_cow_write {\n", "\n", "\n}")

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val file = s"$dir/data-${UUID.randomUUID().toString}.parquet"
      private val parsed: MessageType = MessageTypeParser.parseMessageType(messageType)
      private val factory = new SimpleGroupFactory(parsed)
      private val writer: ParquetWriter[Group] =
        ExampleParquetWriter.builder(new org.apache.hadoop.fs.Path(file))
          .withType(parsed).withConf(new Configuration()).build()
      // table column -> position in the DECLARED write schema, resolved once.
      private val srcIdx: Array[Int] = tableSchema.fields.map { f =>
        val i = writeSchema.fieldIndex(f.name)
        require(writeSchema.fields(i).dataType == f.dataType,
          s"graft-cow: write schema types ${writeSchema.fields(i).dataType} " +
            s"!= table ${f.dataType} for column ${f.name}")
        i
      }
      // Spark 4.1 plan-shape quirk, measured against the shipped bytecode:
      // a group-based ReplaceData whose operation requests NO metadata
      // attributes takes the plain DataWritingSparkTask path, which does
      // NOT apply ReplaceDataProjections.rowProjection — the writer sees
      // the rewrite query's raw output, `__row_operation` int PREPENDED to
      // the declared write columns (ReplaceDataExec.writingTask only pairs
      // the projections when a metadata projection exists; connectors that
      // request `_file` etc. get the projected two-arg write path). The
      // shift is observable per row as numFields − |writeSchema| and is 0
      // on the plain append path, so compute it defensively: a future
      // Spark that applies the projection makes this a no-op.
      private def leadOffset(row: InternalRow): Int = {
        val off = row.numFields - writeSchema.fields.length
        require(off == 0 || off == 1,
          s"graft-cow: row has ${row.numFields} fields for declared write " +
            s"schema ${writeSchema.simpleString} — unexpected layout")
        off
      }
      private var rows = 0L
      // Write-time per-long-column ranges: the file's manifest stats,
      // collected as rows stream through — zero extra passes.
      private val longIdx: Array[Int] =
        tableSchema.fields.indices.filter(
          i => tableSchema.fields(i).dataType == LongType).toArray
      private val statsSlot: Array[Int] =
        tableSchema.fields.indices.map(longIdx.indexOf(_)).toArray
      private val mins = Array.fill(longIdx.length)(Long.MaxValue)
      private val maxs = Array.fill(longIdx.length)(Long.MinValue)

      // The metadata-paired write path (DataAndMetadataWritingSparkTask —
      // taken whenever the row-level operation requests metadata
      // attributes, as this one does for `_file`): the data row arrives
      // ALREADY projected to the declared write schema, the metadata row
      // (the source `_file`) is not persisted — group membership of the
      // OUTPUT files is the commit's concern, not the row's.
      override def write(meta: InternalRow, row: InternalRow): Unit =
        write(row)

      override def write(row: InternalRow): Unit = {
        val off = leadOffset(row)
        val g = factory.newGroup()
        var t = 0
        while (t < tableSchema.fields.length) {
          val i = off + srcIdx(t)
          if (!row.isNullAt(i)) {
            val f = tableSchema.fields(t)
            f.dataType match {
              case LongType =>
                val v = row.getLong(i)
                val s = statsSlot(t)
                if (v < mins(s)) mins(s) = v
                if (v > maxs(s)) maxs(s) = v
                g.append(f.name, v)
              case DoubleType => g.append(f.name, row.getDouble(i))
              case StringType => g.append(f.name, row.getUTF8String(i).toString)
              case other => throw new IllegalArgumentException(
                s"graft-cow: unsupported column type ${other.simpleString}")
            }
          }
          t += 1
        }
        writer.write(g)
        rows += 1
      }

      override def commit(): WriterCommitMessage = {
        writer.close()
        if (rows == 0L) {
          new java.io.File(file).delete()
          CowCommitMessage(Seq.empty)
        } else {
          val ranges = longIdx.indices.collect {
            case s if mins(s) <= maxs(s) =>
              tableSchema.fields(longIdx(s)).name ->
                CowStore.ColRange(mins(s), maxs(s))
          }.toMap
          CowCommitMessage(Seq(file -> CowStore.FileStats(
            rows, new java.io.File(file).length(), ranges)))
        }
      }

      override def abort(): Unit = {
        writer.close()
        new java.io.File(file).delete(): Unit
      }

      override def close(): Unit = ()
    }
}
