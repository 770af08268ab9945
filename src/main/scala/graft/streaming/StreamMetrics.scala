package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.util.LongAccumulator

/** Observability for the idempotent streaming sinks — the Spark-native
  * replacement for the reference's print logging (`app.py:101-102`).
  *
  * Two pieces:
  *   - per-sink [[Counters]]: LongAccumulators the sinks bump as they
  *     apply or skip effects. Executor-side `add` is free (no extra
  *     jobs, no driver round-trip); the driver reads `.value` at any
  *     time. Accumulator caveat applies: a re-executed task re-adds, so
  *     counts are at-least-once diagnostics, never effect guards — the
  *     [[ProcessedLedger]] stays the source of truth for idempotency.
  *   - [[GraftQueryListener]]: a StreamingQueryListener that, on every
  *     completed micro-batch, snapshots the engine's own numInputRows
  *     together with the sink's cumulative applied/deduped counters,
  *     keyed by the query name the sinks set (`graft_sink_<store>`).
  *
  * At 100 TB this is exactly the surface a metrics agent scrapes; the
  * snapshot log here stands in for the metrics backend.
  */
object StreamMetrics {
  /** Holds only the (serializable) accumulators — closures that bump
    * them from executors must not drag a SparkSession along.
    */
  final class Counters private[streaming] (
      /** Effects applied (event was new; side effect ran and was marked). */
      val applied: LongAccumulator,
      /** Events skipped because the registry had already marked them. */
      val deduped: LongAccumulator,
      /** Owning SparkContext, so a session restart invalidates the cache. */
      private[streaming] val appId: String) extends Serializable

  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, Counters]()

  /** Query-name key the sinks and the listener agree on. */
  def queryName(storeName: String): String = s"graft_sink_$storeName"

  /** Accumulators are registered to ONE SparkContext; a cached entry
    * from an earlier (possibly stopped) context would silently drop
    * executor-side adds, so the cache is invalidated whenever the
    * caller's context differs from the entry's.
    */
  def countersFor(spark: SparkSession, storeName: String): Counters = {
    val appId = spark.sparkContext.applicationId
    counters.compute(queryName(storeName), (_, old) =>
      if (old != null && old.appId == appId) old
      else new Counters(
        spark.sparkContext.longAccumulator("graft.sink.applied"),
        spark.sparkContext.longAccumulator("graft.sink.deduped"), appId))
  }

  private[streaming] def lookup(name: String): Option[Counters] =
    Option(counters.get(name))

  def drop(storeName: String): Unit = counters.remove(queryName(storeName))

  /** One completed micro-batch: engine-reported input rows plus the
    * sink's CUMULATIVE effect counters at snapshot time.
    */
  final case class BatchSnapshot(queryName: String, batchId: Long, inputRows: Long,
                                 applied: Long, deduped: Long)
}

/** Register with `spark.streams.addListener(new GraftQueryListener)`.
  * Snapshots arrive asynchronously after each batch — tests poll
  * [[snapshots]] rather than asserting immediately.
  */
class GraftQueryListener extends StreamingQueryListener {
  import StreamMetrics._
  private val log = new java.util.concurrent.ConcurrentLinkedQueue[BatchSnapshot]()

  def snapshots: Seq[BatchSnapshot] = {
    import scala.jdk.CollectionConverters._
    log.iterator().asScala.toSeq
  }
  /** Latest snapshot per query name (cumulative counters → last wins). */
  def latest(storeName: String): Option[BatchSnapshot] =
    snapshots.filter(_.queryName == queryName(storeName)).lastOption

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
    lookup(name).foreach { c =>
      log.add(BatchSnapshot(name, e.progress.batchId, e.progress.numInputRows,
        c.applied.value, c.deduped.value))
    }
  }
}
