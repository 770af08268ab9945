package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

/** In-JVM backing store, keyed by the `store` option. */
object ItemsStore {
  final case class Cell(itemId: Long, columnId: String, text: String, createdAt: Long)
  private val stores = new java.util.concurrent.ConcurrentHashMap[String, Seq[Cell]]()
  def put(name: String, cells: Seq[Cell]): Unit = stores.put(name, cells)
  /** Seed-once guard: evaluates `cells` and stores them only when the
    * store does not exist yet — so a QUERY that needs fixture data in
    * the stand-in store can reference it without re-collecting on every
    * invocation (Bench runs each query twice; Verify again).
    */
  def seedOnce(name: String)(cells: => Seq[Cell]): Unit =
    stores.computeIfAbsent(name, _ => cells)
  def get(name: String): Seq[Cell] = Option(stores.get(name)).getOrElse(Seq.empty)
  def drop(name: String): Unit = stores.remove(name)
}

class ItemsTableProvider extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = ItemsSource.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ItemsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ItemsTable(properties.getOrDefault("store", "default"))
}

class ItemsTable(store: String) extends Table with SupportsRead {
  override def name(): String = s"graft_items($store)"
  override def schema(): StructType = ItemsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ItemsScanBuilder(store)
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
