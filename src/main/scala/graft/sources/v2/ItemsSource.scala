package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1-S5 as a real DataSource V2 connector: the reference reads item
  * cells through a by-id GraphQL API (`get_column_value`,
  * `fixed_signature_utils.py:257-289`), batching ids in chunks of 50
  * (`Leyton_depot.py:194-199`). This connector expresses that contract
  * in Spark's native source API:
  *
  *   - `item_id`/`column_id` equality and IN filters PUSH DOWN into the
  *     "API call" (the GraphQL `ids:[...]` argument) instead of
  *     filtering after a full scan — `SupportsPushDownFilters`;
  *   - column pruning maps to the GraphQL field selection —
  *     `SupportsPushDownRequiredColumns`;
  *   - each input partition is one 50-id API page (the reference's
  *     chunk size), so page fetches parallelize across executors.
  *
  * The backing data path is config-selected per read ([[ItemsConf]]):
  * the in-JVM [[ItemsStore]] registry (default — the offline stand-in
  * and oracle-gate path, same pattern as DriveStore) or a paged HTTP
  * protocol through the [[graft.sources.UrlFetch.Transports]] seam
  * (`transport`/`base_url` options, see [[ItemsBackend]]) — partition
  * planning, pushdown and pruning are identical either way.
  *
  * Multi-executor note: [[ItemsStore]] MODELS the external system — a
  * remote service that is shared across executors BY DEFINITION. The
  * stand-in is shared only within one JVM, so exercising this
  * connector under multi-JVM executors (`local-cluster`) would test
  * the stand-in's JVM-locality, not the connector: every reader/writer
  * would talk to its executor's empty private store, where production
  * readers/writers talk to the one remote API. The connector machinery
  * itself is already cluster-shaped — partition planning and filter
  * pushdown run on the driver, each `ItemsPage`/`ItemsCellWriter` is
  * self-contained (store name + ids + filters serialize with the
  * task), commit messages flow executor→driver, and task retries are
  * safe because the write is a keyed idempotent upsert. That is why
  * correctness tests run `local[*]` (where the stand-in IS shared) and
  * nothing in the connector holds driver-side state a real cluster
  * would miss.
  */
object ItemsSource {
  val ShortName = "graft-items"
  val PageSize = 50

  val schema: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("column_id", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("created_at", LongType, nullable = false)))
}

/** In-JVM backing store, keyed by the `store` option. Cells are keyed
  * by (item_id, column_id) — the grain of the reference's
  * `change_column_value` mutation — so a write is an UPSERT and
  * re-delivery (Spark task retries, streaming redelivery) converges
  * instead of duplicating: the same idempotency contract the
  * `graft.sinks` layer uses (digest-keyed uploads, oldest-wins
  * folders), here as the connector's write semantics.
  */
object ItemsStore {
  final case class Cell(itemId: Long, columnId: String, text: String, createdAt: Long)
  private type CellMap = java.util.concurrent.ConcurrentHashMap[(Long, String), Cell]
  private val stores = new java.util.concurrent.ConcurrentHashMap[String, CellMap]()
  private def toMap(cells: Seq[Cell]): CellMap = {
    val m = new CellMap()
    cells.foreach(c => m.put((c.itemId, c.columnId), c))
    m
  }
  def put(name: String, cells: Seq[Cell]): Unit = stores.put(name, toMap(cells))
  /** Seed-once guard: evaluates `cells` and stores them only when the
    * store does not exist yet — so a QUERY that needs fixture data in
    * the stand-in store can reference it without re-collecting on every
    * invocation (Bench runs each query twice; Verify again).
    */
  def seedOnce(name: String)(cells: => Seq[Cell]): Unit =
    stores.computeIfAbsent(name, _ => toMap(cells))
  /** Idempotent single-cell write (the K1 upload-to-column mutation). */
  def upsert(name: String, cell: Cell): Unit =
    stores.computeIfAbsent(name, _ => new CellMap())
      .put((cell.itemId, cell.columnId), cell)
  def get(name: String): Seq[Cell] = {
    import scala.jdk.CollectionConverters._
    Option(stores.get(name))
      .map(_.values.asScala.toSeq.sortBy(c => (c.itemId, c.columnId)))
      .getOrElse(Seq.empty)
  }
  def drop(name: String): Unit = stores.remove(name)
}

class ItemsTableProvider extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = ItemsSource.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ItemsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ItemsTable(ItemsConf(properties))
}

class ItemsTable(conf: ItemsConf) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_items(${conf.store})"
  override def schema(): StructType = ItemsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ItemsScanBuilder(conf)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ItemsWriteBuilder(conf, info.schema())
}

class ItemsScanBuilder(conf: ItemsConf)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ItemsSource.schema
  private var pushedAgg: Option[Aggregation] = None
  private var pushedLimit: Option[Int] = None

  /** Accept the predicates the API itself can evaluate (the `ids:[...]`
    * arguments); everything else stays in Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("item_id", _) | EqualTo("column_id", _) => true
      case In("item_id", _) | In("column_id", _) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  // ---- aggregate pushdown: the API-side COUNT/MIN/MAX the reference's
  // GraphQL count queries would serve. The external system computes the
  // aggregate in ONE call; at 100 TB this is the difference between
  // shipping every cell across the network to count it and shipping one
  // number per group.
  private def fieldOf(e: V2Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
    case _ => None
  }
  private def supportedAgg(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case c: Count => !c.isDistinct && fieldOf(c.column).isDefined
    case m: Min => fieldOf(m.column).isDefined
    case m: Max => fieldOf(m.column).isDefined
    case _ => false
  }
  /** The stand-in (like the modeled API) returns FINAL aggregates — one
    * row per group, already merged — so a pushed aggregation is always
    * complete: Spark plans no partial/final agg on top at all.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.forall(e => fieldOf(e).isDefined) &&
      agg.aggregateExpressions.forall(supportedAgg)
  override def pushAggregation(agg: Aggregation): Boolean =
    if (!supportCompletePushDown(agg)) false
    else { pushedAgg = Some(agg); true }

  /** LIMIT reaches the page planner: only ceil(limit / PageSize) API
    * pages are fetched instead of the whole id space. Spark keeps its
    * own Limit on top (`isPartiallyPushed` default), so the contract
    * stays safe; the win is rows-not-fetched.
    */
  override def pushLimit(limit: Int): Boolean = { pushedLimit = Some(limit); true }

  override def build(): Scan = pushedAgg match {
    // aggregation replaces the row scan entirely; `required` no longer
    // applies (the output schema IS the aggregate schema)
    case Some(agg) => new ItemsAggScan(conf, pushed, agg)
    case None => new ItemsScan(conf, pushed, required, pushedLimit)
  }
}

/** Scan that serves a completely-pushed aggregation: the "API" (the
  * in-JVM store stand-in) evaluates group-by + COUNT/MIN/MAX itself and
  * the connector returns the final one-row-per-group result as a single
  * page — the connector analog of a GraphQL count query. Evaluation
  * happens at partition PLANNING (driver), exactly where a production
  * connector would issue the one aggregate API call; the result rows
  * ride to the executor inside the partition handle.
  */
class ItemsAggScan(conf: ItemsConf, pushed: Array[Filter], agg: Aggregation)
    extends Scan with Batch {
  import ItemsAggScan._

  private val groupCols: Seq[String] =
    agg.groupByExpressions.toSeq.map(e => fieldNameOf(e)
      .getOrElse(throw new IllegalStateException(s"unsupported group expr $e")))
  private val aggFns: Seq[AggregateFunc] = agg.aggregateExpressions.toSeq

  override def readSchema(): StructType = StructType(
    groupCols.map(c => ItemsSource.schema(c)) ++
      aggFns.zipWithIndex.map { case (f, i) => f match {
        case _: CountStar => StructField(s"count_star_$i", LongType, nullable = false)
        case c: Count => StructField(s"count_$i", LongType, nullable = false)
        case m: Min => StructField(s"min_$i", colType(fieldNameOf(m.column).get), nullable = true)
        case m: Max => StructField(s"max_$i", colType(fieldNameOf(m.column).get), nullable = true)
        case other => throw new IllegalStateException(s"unsupported agg $other")
      }})
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-items ${conf.describe} pushed=${pushed.mkString("[", ", ", "]")} " +
      s"pushedAgg=[${aggFns.mkString(", ")}] groupBy=[${groupCols.mkString(", ")}]"

  private def cellValue(c: ItemsStore.Cell, col: String): Any = col match {
    case "item_id" => c.itemId
    case "column_id" => c.columnId
    case "text" => c.text
    case "created_at" => c.createdAt
  }

  /** One partition carrying the final aggregate rows (the single API
    * response). Values are plain JVM types; the reader converts.
    */
  // lazy: Spark may plan partitions more than once (reuse/AQE); the
  // single "API response" is fetched once per scan instance
  private lazy val matchingCells = conf.backend.matchingCells(pushed)

  override def planInputPartitions(): Array[InputPartition] = {
    val cells = matchingCells
    val groups: Seq[(Seq[Any], Seq[ItemsStore.Cell])] =
      if (groupCols.isEmpty) Seq((Seq.empty, cells))
      else cells.groupBy(c => groupCols.map(g => cellValue(c, g)))
        .toSeq.sortBy(_._1.map(String.valueOf).toList)(
          // element-wise, not a separator-free concat: ("a","bc") and
          // ("ab","c") must not collide into one nondeterministic slot
          scala.math.Ordering.Implicits.seqOrdering[List, String])
    val rows: Array[Array[Any]] = groups.map { case (key, gs) =>
      (key ++ aggFns.map {
        case _: CountStar => gs.size.toLong
        case c: Count =>
          val col = fieldNameOf(c.column).get
          gs.count(g => cellValue(g, col) != null).toLong
        case m: Min => minMax(gs, fieldNameOf(m.column).get, isMin = true)
        case m: Max => minMax(gs, fieldNameOf(m.column).get, isMin = false)
        case other => throw new IllegalStateException(s"unsupported agg $other")
      }).toArray
    }.toArray
    Array(ItemsAggPage(rows))
  }
  override def createReaderFactory(): PartitionReaderFactory = new ItemsAggReaderFactory
}

object ItemsAggScan {
  def fieldNameOf(e: V2Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
    case _ => None
  }
  def colType(name: String): DataType = ItemsSource.schema(name).dataType
  private[v2] def minMax(gs: Seq[ItemsStore.Cell], col: String, isMin: Boolean): Any = {
    def pick[T](vs: Seq[T])(implicit o: Ordering[T]): Any =
      if (vs.isEmpty) null else if (isMin) vs.min else vs.max
    col match {
      case "item_id" => pick(gs.map(_.itemId))
      case "created_at" => pick(gs.map(_.createdAt))
      case "column_id" => pick(gs.map(_.columnId))
      case "text" => pick(gs.map(_.text).filter(_ != null))
    }
  }
}

case class ItemsAggPage(rows: Array[Array[Any]]) extends InputPartition

class ItemsAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[ItemsAggPage].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = InternalRow.fromSeq(
        rows(i).toIndexedSeq.map {
          case s: String => UTF8String.fromString(s)
          case other => other
        })
      override def close(): Unit = ()
    }
  }
}

class ItemsScan(conf: ItemsConf, pushed: Array[Filter], required: StructType,
                limit: Option[Int] = None)
    extends Scan with Batch with SupportsRuntimeFiltering with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-items ${conf.describe} pushed=${pushed.mkString("[", ", ", "]")}" +
      limit.map(l => s" pushedLimit=$l").getOrElse("")

  // ---- runtime (join-driven) filtering: Spark's dynamic-pruning rule
  // hands the scan the id set OBSERVED on the other side of an
  // equi-join before partitions are planned — so a lookup joined
  // against a filtered dimension fetches only the surviving ids' API
  // pages instead of the whole id space. At the reference's workload
  // this is the difference between paging every board item and paging
  // the handful a webhook batch touched. `filter()` runs driver-side
  // before `planInputPartitions()` (the BatchScanExec contract).
  @volatile private var runtime: Array[Filter] = Array.empty
  // only columns surviving pruning: Spark resolves these against the
  // scan's (pruned) output and fails analysis on absent ones
  override def filterAttributes(): Array[NamedReference] =
    Seq("item_id", "column_id").filter(required.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column).toArray
  override def filter(filters: Array[Filter]): Unit = { runtime = filters }

  /** One partition per PageSize distinct item ids — the reference's
    * chunked API paging as Spark's unit of parallelism. A pushed LIMIT
    * truncates the CELL stream (sorted by key, so deterministic) and
    * pages only the ids that survive — `LIMIT n` fetches at most
    * ceil(n / PageSize) pages instead of the whole id space. Runtime
    * filters participate exactly like pushed ones: they shrink the id
    * list BEFORE paging.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val pages = conf.backend.pageIds(pushed ++ runtime, limit)
      .grouped(ItemsSource.PageSize)
      .map(ids => ItemsPage(conf, ids.toArray, pushed ++ runtime, limit): InputPartition)
      .toArray
    ItemsScan.lastPlannedPages.set(pages.length)
    pages
  }
  override def createReaderFactory(): PartitionReaderFactory = new ItemsReaderFactory(required)

  /** Post-pushdown statistics for the planner: without them a DSv2
    * relation defaults to `defaultSizeInBytes` (effectively infinite),
    * so a FILTERED items lookup joined to a big table shuffles both
    * sides instead of broadcasting the handful of surviving cells.
    * The stand-in counts the store directly; a production connector
    * answers with the API's count endpoint — the same one call the
    * aggregate pushdown path uses.
    */
  override def estimateStatistics(): Statistics = {
    val matched = conf.backend.countMatching(pushed ++ runtime).toInt
    val n = limit.fold(matched)(l => math.min(l, matched))
    val rowBytes = required.map(_.dataType.defaultSize + 8L).sum.max(16L)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(n * rowBytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n.toLong)
    }
  }
}

object ItemsScan {
  /** Test-visible observability: pages planned by the most recent scan
    * and pages actually READ (the true API-call count — BatchScanExec
    * may plan both the unfiltered and the runtime-filtered partition
    * lists, but only the filtered one is fetched). In-JVM counters:
    * meaningful under local[*] tests, where executors share the JVM.
    */
  val lastPlannedPages = new java.util.concurrent.atomic.AtomicInteger(-1)
  val pagesFetched = new java.util.concurrent.atomic.AtomicInteger(0)
}

case class ItemsPage(conf: ItemsConf, itemIds: Array[Long], pushed: Array[Filter],
                     limit: Option[Int] = None)
    extends InputPartition

class ItemsReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[ItemsPage]
    ItemsScan.pagesFetched.incrementAndGet()
    new ItemsPageReader(page, required)
  }
}

/** Reads one API page through the configured [[ItemsBackend]] — for
  * an HTTP transport this IS the fetch for `page.itemIds` (one call
  * per partition, executor-side).
  */
class ItemsPageReader(page: ItemsPage, required: StructType)
    extends PartitionReader[InternalRow] {
  // ONE backend page read per partition = one API call; a pushed LIMIT
  // caps what each page fetches (Spark's own Limit on top enforces the
  // exact global count — isPartiallyPushed contract)
  private val it = page.conf.backend.readPage(page.itemIds, page.pushed, page.limit)
  private var current: ItemsStore.Cell = _

  override def next(): Boolean = {
    if (it.hasNext) { current = it.next(); true } else false
  }
  override def get(): InternalRow = {
    val values = required.fields.map(_.name).map {
      case "item_id" => current.itemId
      case "column_id" => UTF8String.fromString(current.columnId)
      case "text" => if (current.text == null) null else UTF8String.fromString(current.text)
      case "created_at" => current.createdAt
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
  override def close(): Unit = ()
}

// ------------------------------------------------------------------ write path
/** K1/K4 through the connector surface: `df.write.format("graft-items")
  * .option("store", s).mode("append")` upserts each row as a cell write
  * (`change_column_value`, `fixed_signature_utils.py:309-327`).
  *
  * Commit model: the backing API is the external system itself — there
  * is no staging area to make a write atomic, exactly like the
  * reference's HTTP mutations. Correctness under Spark's task retries
  * comes from IDEMPOTENCE instead: writes are keyed by
  * (item_id, column_id), so a re-executed task re-applies identical
  * upserts and the store converges ([[ItemsStore.upsert]]). `commit`
  * and `abort` are therefore bookkeeping-only — the same
  * effect-idempotency contract as `graft.sinks.UploadSink`.
  */
class ItemsWriteBuilder(conf: ItemsConf, schema: StructType) extends WriteBuilder {
  override def build(): Write = new ItemsWrite(conf, schema)
}

class ItemsWrite(conf: ItemsConf, schema: StructType) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String = s"graft-items ${conf.describe}"
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ItemsWriterFactory(conf, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class ItemsWriterFactory(conf: ItemsConf, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ItemsCellWriter(conf, schema)
}

case class ItemsWriteDone(rows: Long) extends WriterCommitMessage

/** Writes one partition's cells through the configured backend —
  * executor-side, no driver round-trip. Rows buffer to PageSize-grain
  * batches (the mutation analog of the 50-id read page), each flushed
  * as one [[ItemsBackend.upsertBatch]]; the remainder flushes in
  * `commit()`, BEFORE the commit message is produced, so an
  * acknowledged task has fully applied its rows.
  */
class ItemsCellWriter(conf: ItemsConf, schema: StructType) extends DataWriter[InternalRow] {
  private val idx = ItemsSource.schema.fields.map(f => f.name -> schema.fieldIndex(f.name)).toMap
  private val backend = conf.backend
  private val buf = scala.collection.mutable.ArrayBuffer.empty[ItemsStore.Cell]
  private var rows = 0L
  override def write(row: InternalRow): Unit = {
    val text = if (row.isNullAt(idx("text"))) null else row.getUTF8String(idx("text")).toString
    buf += ItemsStore.Cell(
      row.getLong(idx("item_id")),
      row.getUTF8String(idx("column_id")).toString,
      text,
      row.getLong(idx("created_at")))
    rows += 1
    if (buf.size >= ItemsSource.PageSize) flush()
  }
  private def flush(): Unit = if (buf.nonEmpty) { backend.upsertBatch(buf.toSeq); buf.clear() }
  override def commit(): WriterCommitMessage = { flush(); ItemsWriteDone(rows) }
  override def abort(): Unit = () // idempotent upserts: retry converges
  override def close(): Unit = ()
}
