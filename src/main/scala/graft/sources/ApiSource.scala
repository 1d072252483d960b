package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.core.{FetcherSpec, HttpFetcher}
import scala.jdk.CollectionConverters._

/** DataSource V2 skeleton for the networked API sources. One Spark
  * `InputPartition` per [[FetchTask]] (per country, or per country×endpoint),
  * so fetches run concurrently on executors — the parallelism the reference
  * does serially (wb_functions.cpp:240-242 et al.).
  *
  * Error contract (parity with reference http_client.cpp:159-203): transport
  * or parse failures yield zero rows from that partition, never a query
  * failure; *argument* errors throw IllegalArgumentException at load() time
  * with the reference's message text.
  *
  * Year-range pushdown: `SupportsPushDownFilters` translates year predicates
  * into per-API URL parameters (the reference scaffolds these encoders but
  * never wires them — filter_pushdown.cpp:6-97). All filters are reported
  * back as unhandled so Spark re-applies them above the scan: pushdown is a
  * fetch-size optimization, never a semantics change.
  */

/** Inclusive year bounds extracted from pushed-down filters. */
final case class YearRange(start: Option[Int] = None, end: Option[Int] = None) {
  def isEmpty: Boolean = start.isEmpty && end.isEmpty
}

object YearRange {
  /** Collect year bounds from Catalyst filters on an INTEGER `year` column. */
  def fromFilters(filters: Array[Filter]): YearRange = {
    var r = YearRange()
    def asInt(v: Any): Option[Int] = v match {
      case i: Int => Some(i)
      case l: Long => Some(l.toInt)
      case _ => None
    }
    filters.foreach {
      case EqualTo("year", v) =>
        asInt(v).foreach(y => r = YearRange(Some(y), Some(y)))
      case GreaterThanOrEqual("year", v) => asInt(v).foreach(y => r = r.copy(start = Some(y)))
      case GreaterThan("year", v) => asInt(v).foreach(y => r = r.copy(start = Some(y + 1)))
      case LessThanOrEqual("year", v) => asInt(v).foreach(y => r = r.copy(end = Some(y)))
      case LessThan("year", v) => asInt(v).foreach(y => r = r.copy(end = Some(y - 1)))
      case _ =>
    }
    r
  }
}

/** One partition's fetch work.
  * @param urls URLs fetched in order; each decoded independently.
  * @param pagedBase if set, fetched as `pagedBase&page=N` from 1 until the
  *   decoder-reported page count (World Bank pagination protocol).
  * @param firstSuccessOnly if true, `urls` are alternatives — stop at the
  *   first fetch that succeeds (ILO's 5 key-shape retries).
  * @param meta decoder context (country code, requested field, ...). */
final case class FetchTask(
    urls: Seq[String] = Seq.empty,
    pagedBase: Option[String] = None,
    firstSuccessOnly: Boolean = false,
    meta: Map[String, String] = Map.empty) extends Serializable

/** Stateless, serializable JSON→rows decoder. Values use JVM types matching
  * the schema (String/Int/Double/Long or null). */
trait RowDecoder extends Serializable {
  def decode(body: String, task: FetchTask): Iterator[Seq[Any]]
  /** World Bank-style pagination metadata, if the protocol has it. */
  def totalPages(body: String): Option[Int] = None
}

/** Generic DSv2 table over an HTTP+JSON API.
  * @param rowsPerTask per-protocol upper bound on rows one fetch task
  *   returns, used ONLY for reported statistics (the broadcast decision).
  *   Per-country year series default to 256; full-catalog protocols must
  *   pass their honest bound — a shared constant here is exactly how an
  *   oversized build side sneaks into a BroadcastHashJoin. */
final class ApiTable(
    tableName: String,
    dataSchema: StructType,
    tasks: YearRange => Seq[FetchTask],
    decoder: RowDecoder,
    fetcherSpec: FetcherSpec,
    rowsPerTask: Long = 256L) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = dataSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ApiScanBuilder(tableName, dataSchema, tasks, decoder, fetcherSpec,
      rowsPerTask)
}

final class ApiScanBuilder(
    tableName: String,
    schema: StructType,
    tasks: YearRange => Seq[FetchTask],
    decoder: RowDecoder,
    fetcherSpec: FetcherSpec,
    rowsPerTask: Long = 256L) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns {

  private var yearRange: YearRange = YearRange()
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var required: StructType = schema

  /** Column pruning: the HTTP body is fetched whole regardless (these
    * APIs have no field selection), but the reader materializes ONLY the
    * requested fields into InternalRows — a 2-column projection over a
    * 6-column source moves 1/3 of the cells through the scan, and the
    * plan's ReadSchema tells the truth about what is read. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source field order (decoders emit in schema order)
    required = StructType(schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** LIMIT pushdown as a fetch-size optimization: each partition stops
    * fetching once it has `limit` rows — for paged protocols (World Bank)
    * later pages are never requested. Returns false (partial pushdown):
    * Spark still applies the global limit above the scan, so semantics
    * are unchanged — the same safe-double-application contract as the
    * year-range filters. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    yearRange = YearRange.fromFilters(filters)
    pushed = filters.filter {
      case EqualTo("year", _) | GreaterThan("year", _) | GreaterThanOrEqual("year", _) |
           LessThan("year", _) | LessThanOrEqual("year", _) => true
      case _ => false
    }
    // report ALL filters unhandled: the API-side encoding narrows the fetch,
    // Spark still re-applies the predicate (safe double-filtering)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch
      with SupportsReportStatistics {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"$tableName year=$yearRange limit=$limit"

    /** Size estimate so the optimizer treats API tables as what they are:
      * tiny. Without reported statistics a DSv2 relation defaults to
      * `spark.sql.defaultSizeInBytes` (effectively infinite), so joining
      * an API series against a large fact would plan a sort-merge join —
      * at 100 TB that shuffles the fact table to co-locate with a few
      * hundred rows. A bounded honest estimate (these APIs return
      * year-bounded per-country series and paged catalogs, with a
      * PER-PROTOCOL `rowsPerTask` bound set by the concrete source)
      * keeps the API side under the broadcast threshold, and a pushed
      * LIMIT tightens it further. */
    override def estimateStatistics(): Statistics = {
      val nTasks = tasks(yearRange).size.toLong max 1L
      val estRows = nTasks * limit.fold(rowsPerTask)(l =>
        math.min(l.toLong, rowsPerTask))
      val rowBytes = required.defaultSize.toLong max 1L
      new Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(estRows * rowBytes)
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.of(estRows)
      }
    }

    override def planInputPartitions(): Array[InputPartition] =
      tasks(yearRange).map(t => ApiInputPartition(t, limit): InputPartition)
        .toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new ApiReaderFactory(schema, required, decoder, fetcherSpec)
  }
}

final case class ApiInputPartition(task: FetchTask,
    limit: Option[Int] = None) extends InputPartition

final class ApiReaderFactory(
    fullSchema: StructType,
    requiredSchema: StructType,
    decoder: RowDecoder,
    fetcherSpec: FetcherSpec) extends PartitionReaderFactory {

  // decoder rows arrive in full-schema order; project to the pruned set
  private val keepIdx: Array[Int] =
    requiredSchema.fieldNames.map(fullSchema.fieldIndex)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ApiInputPartition]
    new ApiPartitionReader(p.task, decoder, fetcherSpec.build(), p.limit,
      keepIdx)
  }
}

/** Executor-side reader: fetch → decode → emit. Materializes one task's rows
  * (hundreds per partition for these APIs — the reference buffers identically
  * in GlobalTableFunctionState). */
final class ApiPartitionReader(
    task: FetchTask,
    decoder: RowDecoder,
    fetcher: HttpFetcher,
    limit: Option[Int] = None,
    keepIdx: Array[Int] = null) extends PartitionReader[InternalRow] {

  // take() is lazy over the lazily-paged iterator below, so a pushed
  // LIMIT satisfied by page 1 never issues the page-2 request
  private val rows: Iterator[Seq[Any]] =
    limit.fold(fetchAll())(fetchAll().take)
  private var current: Seq[Any] = _

  private def fetchAll(): Iterator[Seq[Any]] = {
    val direct: Iterator[Seq[Any]] =
      if (task.firstSuccessOnly) {
        task.urls.iterator
          .map(fetcher.get)
          .collectFirst { case Right(body) if body.nonEmpty => body }
          .map(b => decoder.decode(b, task))
          .getOrElse(Iterator.empty)
      } else {
        task.urls.iterator.flatMap { url =>
          fetcher.get(url) match {
            case Right(body) => decoder.decode(body, task)
            case Left(_) => Iterator.empty // graceful degradation: 0 rows
          }
        }
      }
    val paged: Iterator[Seq[Any]] = task.pagedBase match {
      case None => Iterator.empty
      case Some(base) =>
        new Iterator[Iterator[Seq[Any]]] {
          private var page = 1
          private var total = 1
          def hasNext: Boolean = page <= total
          def next(): Iterator[Seq[Any]] = {
            val url = s"$base&page=$page"
            val out = fetcher.get(url) match {
              case Right(body) =>
                decoder.totalPages(body).foreach(t => total = t)
                decoder.decode(body, task)
              case Left(_) =>
                total = 0 // stop pagination on failure
                Iterator.empty
            }
            page += 1
            out
          }
        }.flatten
    }
    direct ++ paged
  }

  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  /** Hot read path: project + convert with one pre-sized array and a
    * while loop — no per-row Seq allocation, and decoder rows are viewed
    * as IndexedSeq once so a List-shaped row doesn't pay O(width) per
    * positional lookup (quadratic in column count otherwise). */
  override def get(): InternalRow = {
    val src: IndexedSeq[Any] = current match {
      case ix: IndexedSeq[Any] => ix
      case other => other.toIndexedSeq
    }
    val n = if (keepIdx == null) src.length else keepIdx.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = (if (keepIdx == null) src(i) else src(keepIdx(i))) match {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
      i += 1
    }
    InternalRow.fromSeq(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }

  override def close(): Unit = ()
}

/** Shared option handling for the concrete providers. */
abstract class ApiSourceBase extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  def tableSchema(options: CaseInsensitiveStringMap): StructType
  def buildTasks(options: CaseInsensitiveStringMap): YearRange => Seq[FetchTask]
  def decoder: RowDecoder

  /** Per-protocol upper bound on rows one fetch task returns — feeds
    * reported statistics only (the broadcast decision). Override in
    * catalog-style sources whose single task pages through thousands of
    * rows; the 256 default fits per-country year-series protocols. */
  def rowsPerTaskHint: Long = 256L

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableSchema(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new ApiTable(shortName(), tableSchema(options), buildTasks(options),
      decoder, fetcherSpec(options), rowsPerTaskHint)
  }

  protected def fetcherSpec(options: CaseInsensitiveStringMap): FetcherSpec =
    FetcherSpec(
      mode = options.getOrDefault("fetcher.mode", "http"),
      fixtureResource = options.getOrDefault("fetcher.fixtures", ""))

  protected def countriesOf(options: CaseInsensitiveStringMap): Seq[String] =
    graft.core.Registry.parseCountries(Option(options.get("countries")))

  protected def requireOption(options: CaseInsensitiveStringMap, key: String,
      message: String): String = {
    val v = options.get(key)
    if (v == null || v.isEmpty) throw new IllegalArgumentException(message)
    v
  }
}
