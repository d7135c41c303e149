package graft.sources

import graft.streaming.StreamOps
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Collections => JCollections}
import scala.jdk.CollectionConverters._

/** DataSource V2 micro-batch source over a staged replay directory
  * (`graft-replay`) — the engine-native form of the reference's polling
  * Extract loop (/root/reference/app.py:40-52, `fetch()` at app.py:67-81):
  * the HTTP poll's "what arrived since the last tick" contract becomes a
  * real `MicroBatchStream` whose OFFSET is an index into the directory's
  * name-ordered parquet file list. Each tick's batch is the files in
  * `(startOffset, endOffset]`, so the interface — monotone offsets,
  * replayable ranges, commit-and-advance — is exactly what a production
  * deployment would implement against the live feed, proven here without
  * egress.
  *
  * Contract with [[StreamOps.stageReplayDir]]: files are immutable once
  * staged and their NAME order is the replay order (tick1-*, tick2-*).
  * New files may only be appended (later names); offsets index that
  * sorted list, so a committed range never changes meaning — the same
  * guarantee FileStreamSource derives from its seen-files log, held here
  * structurally.
  *
  * Scale design: one `InputPartition` per file — each executor opens its
  * own file via the parquet-hadoop reader, nothing flows through the
  * driver (the driver only LISTS the directory). Admission control
  * (`maxFilesPerTrigger`) and `Trigger.AvailableNow` are first-class:
  * the batch size is bounded per tick, and AvailableNow drains exactly
  * the files present when the query started.
  */
class ReplaySourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StreamOps.eventsRawSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // Fixed-schema source: a user-specified schema that differs from the
    // replay contract must fail loudly (DSv2 convention), not be silently
    // replaced by eventsRawSchema.
    if (schema != null && schema != StreamOps.eventsRawSchema)
      throw new UnsupportedOperationException(
        s"graft-replay has a fixed schema ${StreamOps.eventsRawSchema.simpleString}; " +
          s"user-specified schema ${schema.simpleString} is not supported")
    new ReplayTable(properties.get("path"))
  }
}

/** The replay directory as a DSv2 table: micro-batch read capability only
  * (batch reads of the same directory go through the plain parquet
  * source).
  */
class ReplayTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-replay requires a path (the staged replay directory)")

  override def name(): String = s"graft-replay:$path"
  override def schema(): StructType = StreamOps.eventsRawSchema
  override def capabilities(): java.util.Set[TableCapability] =
    JCollections.singleton(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = StreamOps.eventsRawSchema
        override def description(): String = s"graft-replay scan of $path"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ReplayMicroBatchStream(path,
            Option(options.get("maxFilesPerTrigger")).map(_.toInt))
      }
    }
}

/** Offset = how many files of the name-sorted listing have been consumed. */
case class FileIndexOffset(idx: Int) extends Offset {
  override def json(): String = idx.toString
}

/** One staged parquet file per partition. */
case class ReplayFilePartition(file: String) extends InputPartition

class ReplayMicroBatchStream(path: String, maxFilesPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Name-sorted immutable listing — the offset space. Re-listed on each
    * call so files appended between ticks are picked up; the sort keeps
    * already-committed index ranges stable because staged names are
    * strictly increasing.
    */
  private def files(): Array[String] = {
    val listed = new java.io.File(path).listFiles()
    if (listed == null)
      throw new IllegalStateException(
        s"graft-replay: replay directory missing or unreadable: $path")
    listed.filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
  }

  /** Listing frozen by `prepareForTriggerAvailableNow`, so AvailableNow
    * drains exactly the files present at query start even if the
    * directory keeps growing.
    */
  @volatile private var frozenCount: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    frozenCount = Some(files().length)

  private def availableCount: Int =
    frozenCount.getOrElse(files().length)

  override def initialOffset(): Offset = FileIndexOffset(0)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[FileIndexOffset].idx
    val avail = availableCount
    limit match {
      case mf: ReadMaxFiles => FileIndexOffset(math.min(from + mf.maxFiles(), avail))
      case _                => FileIndexOffset(avail)
    }
  }

  override def reportLatestOffset(): Offset = FileIndexOffset(availableCount)

  override def deserializeOffset(json: String): Offset =
    FileIndexOffset(json.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[FileIndexOffset].idx,
                  end.asInstanceOf[FileIndexOffset].idx)
    files().slice(s, e).map(ReplayFilePartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ReplayReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Executor-side reader: parquet-hadoop's example Group API over the one
  * file of the partition, converted field-by-field into `InternalRow`s of
  * [[StreamOps.eventsRawSchema]] (ts stays raw int64 nanos — conversion to
  * a timestamp happens in the query plan, same as the file-source path).
  */
class ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ReplayFilePartition].file
    new PartitionReader[InternalRow] {
      private val reader: ParquetReader[Group] =
        ParquetReader.builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(file)).withConf(new Configuration()).build()
      private var current: Group = _

      override def next(): Boolean = {
        current = reader.read()
        current != null
      }

      override def get(): InternalRow = {
        val g = current
        def has(name: String): Boolean = {
          val i = g.getType.getFieldIndex(name)
          g.getFieldRepetitionCount(i) > 0
        }
        def long(name: String): Any =
          if (has(name)) g.getLong(g.getType.getFieldIndex(name), 0) else null
        def dbl(name: String): Any =
          if (has(name)) g.getDouble(g.getType.getFieldIndex(name), 0) else null
        def str(name: String): Any =
          if (has(name)) UTF8String.fromString(g.getString(g.getType.getFieldIndex(name), 0))
          else null
        new GenericInternalRow(Array[Any](
          long("event_id"), long("ts"), long("user_id"),
          str("event_type"), dbl("value"), str("props")))
      }

      override def close(): Unit = reader.close()
    }
  }
}
