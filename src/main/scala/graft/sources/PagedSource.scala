package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, EqualTo, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 re-expression of the reference's paginated REST scan
  * (SURVEY.md §2.1 S1/S2/S3/S9;
  * `/root/reference/monarch_etl/gbif_client.py:56-164`).
  *
  * The reference fetches pages sequentially on the driver (offset +=
  * page size, 0.5 s politeness sleep, stop at `endOfRecords` or a page
  * cap) and evaluates its predicates SERVER-side by passing them as
  * query params (`gbif_client.py:110-120`). This source keeps both
  * ideas but distributes them:
  *
  *  - one `InputPartition` per page → pages fetch in PARALLEL across
  *    executors (the reference's 10-page scan is 10 tasks, not a
  *    5-second driver loop);
  *  - `SupportsPushDownFilters` accepts equality/range filters on the
  *    configured pushdown columns and ships them to the page fetcher —
  *    exactly like shipping `year=&month=&day=` to the API;
  *  - `pageSize` / `maxPages` / `recordLimit` mirror
  *    `limit_per_request` / `num_pages_to_extract` /
  *    `records_limitation` (S9).
  *
  * The page fetcher is pluggable via a registry (zero-egress testbed:
  * tests register fixture-backed fetchers; a live deployment registers
  * an HTTP client with the retry policy of [[Retry]]).
  */
object PagedSource {
  /** A page fetch: (pageIndex, pushedFilters) → rows as Seq[Seq[Any]]
    * matching the schema; None = past the last page (endOfRecords).
    */
  type PageFetcher = (Int, Seq[Filter]) => Option[Seq[Seq[Any]]]

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, (StructType, PageFetcher)]()

  /** Register a named fetcher (test fixture or live client). */
  def register(name: String, schema: StructType, fetcher: PageFetcher): Unit =
    registry.put(name, (schema, fetcher))

  def lookup(name: String): (StructType, PageFetcher) = {
    val v = registry.get(name)
    require(v != null, s"no PagedSource fetcher registered under '$name'")
    v
  }
}

/** Spark finds this via `.format("graft.sources.PagedSource")` — the
  * provider class itself.
  */
class PagedSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.lookup(options.get("fetcher"))._1

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PagedTable(schema, properties.asScala.toMap)
}

final class PagedTable(schema0: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"paged(${props.getOrElse("fetcher", "?")})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(schema0, options.get("fetcher"),
      Option(options.get("maxPages")).map(_.toInt).getOrElse(10),
      Option(options.get("recordLimit")).map(_.toInt),
      Option(options.get("pushdownColumns")).map(_.split(",").toSet).getOrElse(Set.empty))
}

final class PagedScanBuilder(
    schema: StructType, fetcherName: String, maxPages: Int,
    recordLimit: Option[Int], pushdownCols: Set[String])
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  /** S3: accept filters the "API" can evaluate (single-column
    * equality/range on declared pushdown columns); everything else
    * stays in Spark.
    *
    * ALL filters (accepted ones included) are returned as post-scan
    * filters, so Spark re-evaluates them after the fetch. The pushdown
    * is purely a data-reduction hint to the fetcher — correctness never
    * depends on a fetcher honoring a pushed filter exactly (a remote
    * API that ignores a query param yields extra rows, which Spark's
    * own filter then drops, not wrong results).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo(a, _) => pushdownCols.contains(a)
      case GreaterThan(a, _) => pushdownCols.contains(a)
      case GreaterThanOrEqual(a, _) => pushdownCols.contains(a)
      case LessThan(a, _) => pushdownCols.contains(a)
      case LessThanOrEqual(a, _) => pushdownCols.contains(a)
      case _ => false
    }
    filters // Spark re-evaluates everything post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = schema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      // one partition per page: the reference's sequential offset loop
      // becomes a parallel fetch (page cap = num_pages_to_extract)
      (0 until maxPages).map(i => PagedPartition(i): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new PagedReaderFactory(schema, fetcherName, recordLimit, pushed)
  }
}

final case class PagedPartition(pageIndex: Int) extends InputPartition

final class PagedReaderFactory(
    schema: StructType, fetcherName: String,
    recordLimit: Option[Int], pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[PagedPartition].pageIndex
    new PartitionReader[InternalRow] {
      private val rows: Iterator[Seq[Any]] = {
        val (_, fetcher) = PagedSource.lookup(fetcherName)
        val fetched = Retry.withRetry(attempts = 5)(fetcher(page, pushed.toSeq))
          .getOrElse(Seq.empty)
        // S9: per-page record cap (records_limitation)
        recordLimit.map(fetched.take).getOrElse(fetched).iterator
      }
      // full external→Catalyst conversion per field type: a fetcher may
      // return Timestamp/Date/BigDecimal/Seq/... and each needs its
      // internal representation (an ad-hoc String→UTF8String-only
      // mapping builds corrupt InternalRows for every other type)
      private val toCatalyst =
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToCatalystConverter(schema)
      private var current: Seq[Any] = _
      override def next(): Boolean = { val h = rows.hasNext; if (h) current = rows.next(); h }
      override def get(): InternalRow =
        toCatalyst(org.apache.spark.sql.Row.fromSeq(current))
          .asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
  }
}

/** S2 retry policy: 5 attempts, exponential backoff 2–10 s (mirrors
  * `/root/reference/monarch_etl/retry_config.py:28-37`). Test-friendly:
  * backoff base is injectable.
  */
object Retry {
  def withRetry[T](attempts: Int = 5, baseDelayMs: Long = 2000,
      maxDelayMs: Long = 10000)(f: => T): T = {
    var lastErr: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch { case e: Throwable =>
        lastErr = e
        i += 1
        if (i < attempts)
          Thread.sleep(math.min(baseDelayMs * (1L << (i - 1)), maxDelayMs))
      }
    }
    throw lastErr
  }
}
