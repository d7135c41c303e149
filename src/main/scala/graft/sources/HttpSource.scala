package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets
import java.util.{Collections => JCollections}

/** Loopback HTTP replay server — the zero-egress stand-in for the
  * reference's 10 public JSON endpoints (/root/reference/app.py:40-52).
  * Serves an immutable, indexed sequence of JSON tick payloads over real
  * sockets (JDK `com.sun.net.httpserver`, 127.0.0.1, ephemeral port):
  *
  *  - `GET /ticks`    → `{"n": <tick count>}` — the poll surface
  *  - `GET /tick/<i>` → tick i's payload (404 past the end)
  *
  * Test/fault knobs model the failure modes the reference's `fetch()`
  * absorbs (app.py:67-81): `requiredHeaders` (the NWS User-Agent rule,
  * app.py:71-72 — mismatch → 403), `failTicks` (server-side 5xx), and
  * `delayMs` (slow endpoint → client timeout). The server is harness
  * infrastructure — the mock EXTERNAL WORLD — not part of the engine;
  * the engine under test is [[HttpSourceProvider]].
  */
class HttpReplayServer(ticks: IndexedSeq[String],
                       requiredHeaders: Map[String, String] = Map.empty,
                       failTicks: Set[Int] = Set.empty,
                       delayMs: Long = 0L) {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  @volatile private var requests = 0

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      requests += 1
      val missing = requiredHeaders.exists { case (k, v) =>
        ex.getRequestHeaders.getFirst(k) != v
      }
      val path = ex.getRequestURI.getPath
      if (missing) respond(ex, 403, """{"error":"missing required header"}""")
      else path match {
        case "/ticks" => respond(ex, 200, s"""{"n":${ticks.length}}""")
        case t if t.startsWith("/tick/") =>
          val i = t.stripPrefix("/tick/").toInt
          if (delayMs > 0) Thread.sleep(delayMs)
          if (failTicks(i)) respond(ex, 500, """{"error":"upstream failure"}""")
          else if (i < 0 || i >= ticks.length)
            respond(ex, 404, """{"error":"no such tick"}""")
          else respond(ex, 200, ticks(i))
        case _ => respond(ex, 404, """{"error":"no such path"}""")
      }
    }
  })

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def requestCount: Int = requests
}

/** DataSource V2 micro-batch source over a polled HTTP JSON feed
  * (`graft-http`) — the engine-native form of the reference's Extract
  * tick itself (`fetch()` at /root/reference/app.py:67-81), closing the
  * last fidelity gap the replay-directory source left open: the replay
  * source proves the offset machinery over FILES; this one runs the same
  * machinery over real sockets against [[HttpReplayServer]].
  *
  * Contract (mirrors [[ReplayMicroBatchStream]], same offset algebra):
  * the feed exposes a monotone tick counter (`GET /ticks`) and immutable
  * per-tick payloads (`GET /tick/i`). The OFFSET is the number of ticks
  * consumed; each micro-batch reads ticks `[start, end)`, one
  * `InputPartition` per tick, fetched EXECUTOR-side — the driver only
  * polls the counter, so payload bytes never flow through it (the same
  * scale stance as the replay source's file partitions). A counter that
  * shrinks below a committed offset fails loudly: replayability is the
  * source's whole warrant, exactly as with deleted replay files.
  *
  * Row shape is the reference's `fetch()` pair `(payload, error)`
  * (app.py:75-81) promoted to columns: `(tick, body, error)` — a fetch
  * failure (non-2xx, timeout, refused connection) emits a row with
  * `body = NULL` and the diagnostic in `error` instead of failing the
  * stream, which is what lets a downstream dead-letter split (S2/S8,
  * [[graft.streaming.StreamOps]]' `q_deadletter` pattern) route bad
  * ticks while healthy ticks keep flowing. Retryable-by-rerun: a retried
  * task re-issues the GET (the payload is immutable, so at-least-once
  * fetch + deterministic payload = exactly-once rows).
  *
  * Per-source request options ride the [[RequestOptions]] seam (S3):
  * `req.rate-limit` bounds ticks admitted per micro-batch (min-composed
  * with `maxTicksPerTrigger`, like the replay source), `req.timeout-ms`
  * is the fetch timeout (reference default 15 s), and every OTHER
  * `req.<name>` is sent as HTTP header `<name>` on each request — the
  * User-Agent/auth-header seam, with secret-looking values redacted from
  * plan surfaces by `RequestOptions.describe`.
  */
class HttpSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    if (schema != null && schema != HttpSource.schema)
      throw new UnsupportedOperationException(
        s"graft-http has a fixed schema ${HttpSource.schema.simpleString}; " +
          s"user-specified schema ${schema.simpleString} is not supported")
    val opts = new CaseInsensitiveStringMap(properties)
    new HttpTable(properties.get("url"), RequestOptions.from(opts))
  }
}

object HttpSource {
  /** The reference's fetch() pair as columns: tick index, payload, error. */
  val schema: StructType = StructType(Seq(
    StructField("tick", LongType, nullable = false),
    StructField("body", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** One GET with headers + timeout → (body, error); never throws — the
    * reference's `fetch()` contract (app.py:67-81). Shared by the driver
    * poll and the executor readers.
    */
  def fetch(url: String, headers: Map[String, String],
            timeoutMs: Int): (String, String) =
    try {
      val conn = new URI(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val code = conn.getResponseCode
      if (code >= 200 && code < 300) {
        val body = new String(conn.getInputStream.readAllBytes(),
          StandardCharsets.UTF_8)
        (body, null)
      } else {
        Option(conn.getErrorStream).foreach(_.close())
        (null, s"HTTP $code from $url")
      }
    } catch {
      case e: Exception => (null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
}

class HttpTable(baseUrl: String, req: RequestOptions)
    extends Table with SupportsRead {
  require(baseUrl != null && baseUrl.nonEmpty,
    "graft-http requires a url option (the feed's base URL)")

  override def name(): String = s"graft-http:$baseUrl"
  override def schema(): StructType = HttpSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    JCollections.singleton(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      private val effectiveReq =
        if (req.opts.nonEmpty) req else RequestOptions.from(options)

      override def build(): Scan = new Scan {
        override def readSchema(): StructType = HttpSource.schema
        override def description(): String = {
          val reqPart =
            if (effectiveReq.opts.isEmpty) "" else s" req{${effectiveReq.describe}}"
          s"graft-http scan of $baseUrl$reqPart"
        }
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
          val perQuery = Option(options.get("maxTicksPerTrigger")).map(_.toInt)
          val limit = (perQuery.toSeq ++ effectiveReq.rateLimit.toSeq)
            .reduceOption(math.min)
          new HttpMicroBatchStream(baseUrl, limit, effectiveReq)
        }
      }
    }
}

/** One tick per partition: the executor fetches its own payload. */
case class HttpTickPartition(tick: Long) extends InputPartition

class HttpMicroBatchStream(baseUrl: String, maxTicksPerTrigger: Option[Int],
                           req: RequestOptions)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def headers: Map[String, String] =
    req.opts -- Seq("rate-limit", "timeout-ms")

  private def timeoutMs: Int =
    req.opts.get("timeout-ms").map(_.toInt).getOrElse(15000)

  /** Driver-side poll of the tick counter. A failed poll fails the
    * stream (like an unlistable replay directory): with no counter there
    * is no offset space to reason about — per-TICK fetch failures, by
    * contrast, become (body=NULL, error) rows executor-side.
    */
  private def tickCount(): Int = {
    val (body, err) = HttpSource.fetch(s"$baseUrl/ticks", headers, timeoutMs)
    if (err != null)
      throw new IllegalStateException(s"graft-http: tick poll failed: $err")
    """"n"\s*:\s*(\d+)""".r.findFirstMatchIn(body)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"graft-http: malformed tick counter response: $body"))
  }

  @volatile private var frozenCount: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    frozenCount = Some(tickCount())

  private def availableCount: Int = frozenCount.getOrElse(tickCount())

  override def initialOffset(): Offset = FileIndexOffset(0)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    maxTicksPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[FileIndexOffset].idx
    val avail = availableCount
    if (avail < from)
      throw new IllegalStateException(
        s"graft-http: committed offset $from but the feed now reports only " +
          s"$avail ticks — tick history shrank; replay feeds are immutable")
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
    (s until e).map(i => HttpTickPartition(i.toLong): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    HttpReaderFactory(baseUrl, headers, timeoutMs)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Executor-side fetch: one GET per tick partition, one output row per
  * tick — `(tick, body, error)`, never a task failure on a bad fetch.
  */
case class HttpReaderFactory(baseUrl: String, headers: Map[String, String],
                             timeoutMs: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val tick = partition.asInstanceOf[HttpTickPartition].tick
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted
      override def get(): InternalRow = {
        emitted = true
        val (body, err) = HttpSource.fetch(s"$baseUrl/tick/$tick", headers, timeoutMs)
        new GenericInternalRow(Array[Any](tick,
          if (body == null) null else UTF8String.fromString(body),
          if (err == null) null else UTF8String.fromString(err)))
      }
      override def close(): Unit = ()
    }
  }
}
