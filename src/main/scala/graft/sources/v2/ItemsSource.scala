package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
  * The backing store here is the in-JVM [[ItemsStore]] registry (the
  * offline stand-in, same pattern as DriveStore); a production version
  * swaps the reader's data lookup for the HTTP call — partition
  * planning, pushdown and pruning are unchanged.
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
    new ItemsTable(properties.getOrDefault("store", "default"))
}

class ItemsTable(store: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_items($store)"
  override def schema(): StructType = ItemsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ItemsScanBuilder(store)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ItemsWriteBuilder(store, info.schema())
}

class ItemsScanBuilder(store: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ItemsSource.schema

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
  override def build(): Scan = new ItemsScan(store, pushed, required)
}

class ItemsScan(store: String, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-items store=$store pushed=${pushed.mkString("[", ", ", "]")}"

  // The DSv2 Filter contract allows null values inside In (and EqualTo):
  // `IN (..., NULL)` matches nothing for the null element — it must not
  // NPE partition planning.
  private def keep(c: ItemsStore.Cell): Boolean = pushed.forall {
    case EqualTo("item_id", v) => v != null && c.itemId == v.asInstanceOf[Number].longValue()
    case In("item_id", vs) => vs.exists(v => v != null && c.itemId == v.asInstanceOf[Number].longValue())
    case EqualTo("column_id", v) => v != null && c.columnId == v
    case In("column_id", vs) => vs.exists(v => v != null && v == c.columnId)
    case _ => true
  }

  /** One partition per PageSize distinct item ids — the reference's
    * chunked API paging as Spark's unit of parallelism.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val matching = ItemsStore.get(store).filter(keep)
    matching.map(_.itemId).distinct.sorted
      .grouped(ItemsSource.PageSize)
      .map(ids => ItemsPage(store, ids.toArray, pushed): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new ItemsReaderFactory(required)
}

case class ItemsPage(store: String, itemIds: Array[Long], pushed: Array[Filter])
    extends InputPartition

class ItemsReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[ItemsPage]
    new ItemsPageReader(page, required)
  }
}

/** Reads one API page. In production this is where the HTTP fetch for
  * `page.itemIds` happens (one call per partition, executor-side).
  */
class ItemsPageReader(page: ItemsPage, required: StructType)
    extends PartitionReader[InternalRow] {
  private val ids = page.itemIds.toSet
  private val it = ItemsStore.get(page.store).iterator
    .filter(c => ids.contains(c.itemId))
    .filter(c => page.pushed.forall {
      case EqualTo("column_id", v) => v != null && c.columnId == v
      case In("column_id", vs) => vs.exists(v => v != null && v == c.columnId)
      case _ => true
    })
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
class ItemsWriteBuilder(store: String, schema: StructType) extends WriteBuilder {
  override def build(): Write = new ItemsWrite(store, schema)
}

class ItemsWrite(store: String, schema: StructType) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String = s"graft-items store=$store"
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ItemsWriterFactory(store, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class ItemsWriterFactory(store: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ItemsCellWriter(store, schema)
}

case class ItemsWriteDone(rows: Long) extends WriterCommitMessage

/** Writes one partition's cells; one "API connection" per task, rows
  * applied as keyed upserts (executor-side, no driver round-trip).
  */
class ItemsCellWriter(store: String, schema: StructType) extends DataWriter[InternalRow] {
  private val idx = ItemsSource.schema.fields.map(f => f.name -> schema.fieldIndex(f.name)).toMap
  private var rows = 0L
  override def write(row: InternalRow): Unit = {
    val text = if (row.isNullAt(idx("text"))) null else row.getUTF8String(idx("text")).toString
    ItemsStore.upsert(store, ItemsStore.Cell(
      row.getLong(idx("item_id")),
      row.getUTF8String(idx("column_id")).toString,
      text,
      row.getLong(idx("created_at"))))
    rows += 1
  }
  override def commit(): WriterCommitMessage = ItemsWriteDone(rows)
  override def abort(): Unit = () // idempotent upserts: retry converges
  override def close(): Unit = ()
}
