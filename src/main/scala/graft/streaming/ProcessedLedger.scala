package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Cluster-real effect idempotency: a PERSISTED processed-keys ledger.
  *
  * The in-JVM [[EventPipeline.Processed]] registry only observes itself
  * when every executor shares one JVM (`local[*]`); on a real cluster
  * the seen-check and the mark can land on different JVMs and the
  * exactly-once claim silently degrades to at-least-once. This ledger
  * keeps the same marker-after-effect contract (reference anchor: the
  * webhook handler's fire-and-forget redelivery window, `app.py:54`,
  * `:101-102`) but persists the markers as parquet, so the dedup is a
  * distributed anti-JOIN over durable state — no shared memory anywhere:
  *
  *   1. `fresh = batch LEFT ANTI JOIN ledger` on the effect key
  *   2. apply the (idempotent) effect to `fresh`
  *   3. [[mark]] appends the fresh keys (+ batch id) to the ledger —
  *      only AFTER the effect succeeded
  *
  * A crash between 2 and 3 leaves the keys unmarked, so the streaming
  * retry re-applies the effect: at-least-once application against
  * idempotent effects = effectively-once. A crash after 3 re-runs the
  * anti-join, which now filters everything — no skips, no duplicates.
  * Marking FIRST would be at-most-once (a crash after the mark skips
  * the effect forever). Because every step is a distributed job over
  * persisted state, the guarantee survives driver restarts and
  * multi-JVM executors — LedgerSpec proves it by running two separate
  * SparkSessions (a fresh SparkContext each) over the same
  * checkpoint + ledger, a test the in-JVM map could not justify.
  *
  * Scale: markers are parquet PARTITIONED BY `batch_id`, so a
  * long-running stream bounds the per-batch anti-join by passing a
  * redelivery horizon — [[read]]/[[fresh]] take `minBatchId` and the
  * scan prunes to partitions `batch_id >= minBatchId` (only markers
  * younger than the source's redelivery window can ever collide with a
  * live batch; LedgerSpec asserts the pruned plan). [[compact]] folds
  * the partitions at or below a horizon into one, keeping the file
  * count flat; its crash ordering is safe because the ledger is a seen-
  * SET — the compacted copy lands (inside an existing partition dir,
  * duplicate rows are harmless to an anti-join) BEFORE the old
  * partitions are deleted, so no window ever loses a marker.
  *
  * Concurrency contract: SINGLE WRITER PER LEDGER PATH. Two concurrent
  * Spark append jobs on one directory share a `_temporary` staging dir
  * under FileOutputCommitter, where one job's commit/abort cleanup can
  * delete the other's in-flight task files — a streaming query
  * serializes its own batches, so one query per ledger is safe by
  * construction; concurrent queries must use distinct ledger paths.
  * Re-reads are monotone (a marker observed late only causes a
  * redundant idempotent re-apply, never a skip).
  *
  * Key contract: a NON-NULL `LongType` column. [[mark]] fails fast on
  * any other type (a silent cast would write nulls, and null markers
  * never satisfy the anti-join equality — the dedup would quietly
  * degrade to re-applying every redelivery) and on null keys (a null
  * key can never be marked-and-matched, so it would re-apply forever;
  * failing the batch surfaces the bug at the first occurrence).
  */
object ProcessedLedger {

  def schema(key: String): StructType = StructType(Seq(
    StructField(key, LongType, nullable = false),
    StructField("batch_id", LongType, nullable = false)))

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** The ledger as a DataFrame; an absent directory is an empty ledger.
    * `minBatchId` prunes the scan to marker partitions at or above it —
    * pass `currentBatch - redeliveryHorizon` on a long-running stream
    * so the anti-join input stays bounded instead of accreting forever.
    */
  def read(spark: SparkSession, path: String, key: String = "event_id",
           minBatchId: Long = Long.MinValue): DataFrame = {
    val (fs, p) = fsOf(spark, path)
    val all =
      if (fs.exists(p)) spark.read.schema(schema(key)).parquet(path)
      else spark.createDataFrame(new java.util.ArrayList[Row](), schema(key))
    if (minBatchId == Long.MinValue) all
    else all.filter(col("batch_id") >= minBatchId)
  }

  /** One deterministic row per key within a micro-batch: the
    * lexicographically smallest remaining-column tuple wins.
    * `dropDuplicates` keeps an ARBITRARY row, so a retried batch could
    * persist different content for the same key — this makes the
    * survivor a pure function of the batch's contents.
    */
  def canonicalPerKey(batch: DataFrame, key: String): DataFrame = {
    val rest = batch.columns.filterNot(_ == key)
    if (rest.isEmpty) batch.distinct()
    else batch.groupBy(col(key))
      .agg(min(struct(rest.map(col).toIndexedSeq: _*)).as("_r"))
      .select(col(key) +: rest.map(c => col("_r").getField(c).as(c)).toIndexedSeq: _*)
  }

  /** Rows of `batch` whose key the ledger has NOT recorded (step 1). */
  def fresh(batch: DataFrame, path: String, key: String = "event_id",
            minBatchId: Long = Long.MinValue): DataFrame = {
    requireLongKey(batch, key, "fresh")
    batch.join(read(batch.sparkSession, path, key, minBatchId).select(key), Seq(key), "left_anti")
  }

  /** Record applied keys (step 3) — call only AFTER the effect
    * succeeded. Fails fast on a non-Long or null key (see the key
    * contract above); the null check is an extra tiny job over the
    * per-batch key set, which callers already hold checkpointed.
    */
  def mark(keys: DataFrame, path: String, batchId: Long, key: String = "event_id"): Unit = {
    requireLongKey(keys, key, "mark")
    val k = keys.select(col(key)).distinct()
    if (!k.filter(col(key).isNull).isEmpty)
      throw new IllegalArgumentException(
        s"ProcessedLedger.mark: null values in key column '$key' — a null marker can never " +
          "satisfy the anti-join, so the event would be re-applied on every redelivery")
    k.withColumn("batch_id", lit(batchId))
      .write.mode("append").partitionBy("batch_id").parquet(path)
  }

  private def requireLongKey(df: DataFrame, key: String, op: String): Unit = {
    val dt = df.schema(key).dataType
    if (dt != LongType)
      throw new IllegalArgumentException(
        s"ProcessedLedger.$op: key column '$key' must be LongType, got ${dt.simpleString} — " +
          "a lossy cast would produce null markers and silently void the exactly-once contract")
  }

  def count(spark: SparkSession, path: String, key: String = "event_id"): Long =
    read(spark, path, key).count()

  /** Fold every marker partition with `batch_id <= upToBatchId` into
    * the newest of them, keeping the ledger's file count flat on a
    * long-running stream. Crash-safe without coordination: the
    * compacted rows are APPENDED into the surviving partition's
    * directory first (duplicate markers are harmless — the ledger is a
    * seen-set read through an anti-join), and only then are the older
    * partition directories deleted; a crash anywhere leaves every
    * marker present at least once. Single-writer contract applies (run
    * it from the stream's own driver between batches, not concurrently
    * with a mark).
    */
  def compact(spark: SparkSession, path: String, upToBatchId: Long,
              key: String = "event_id"): Unit = {
    val (fs, p) = fsOf(spark, path)
    if (!fs.exists(p)) return
    val parts = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(s => (s.getPath.getName.stripPrefix("batch_id=").toLong, s.getPath))
      .filter(_._1 <= upToBatchId)
      .sortBy(_._1)
    if (parts.size <= 1) return
    val target = parts.last._1
    val old = parts.init
    // distinct keys of the folded partitions, written INTO the
    // surviving partition dir (plain parquet of the key column — the
    // same file layout partitionBy produces)
    spark.read.schema(StructType(Seq(StructField(key, LongType, nullable = false))))
      .parquet(old.map(_._2.toString): _*)
      .distinct()
      .write.mode("append").parquet(s"$path/batch_id=$target")
    old.foreach { case (_, dir) => fs.delete(dir, true) }
  }

  /** A ledgered exactly-once file sink: each micro-batch's ledger-fresh
    * rows are written to `effectsPath/batch_id=<id>` (overwrite), then
    * marked. The per-batch overwrite makes even the crash window between
    * effect and mark idempotent: a retried batch recomputes the SAME
    * fresh set (replayable source + unchanged ledger) and overwrites its
    * own directory, so readers of `effectsPath` see each key exactly
    * once no matter where a failure lands. Redelivered CONTENT (same
    * keys arriving again in later files/batches — beyond what the
    * checkpoint's file/offset tracking can dedup) is dropped by the
    * anti-join. `redeliveryHorizon` (in batches) bounds the anti-join
    * read to `batch_id >= current - horizon` — set it to cover the
    * source's redelivery window and the per-batch cost stays flat for
    * the stream's lifetime. `compactEvery` (in batches, 0 = never)
    * additionally folds the out-of-horizon marker partitions into one
    * every N batches, from inside the stream's own foreachBatch — the
    * single-writer slot — so the ledger's directory count stays flat
    * too, not just its read.
    */
  def startLedgeredFileSink(events: DataFrame, checkpoint: String, ledgerPath: String,
                            effectsPath: String, key: String = "event_id",
                            redeliveryHorizon: Long = Long.MaxValue,
                            compactEvery: Long = 0L): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val minBatch =
          if (redeliveryHorizon == Long.MaxValue) Long.MinValue
          else math.max(0L, batchId - redeliveryHorizon)
        // pin ONE evaluation so the effect and the mark see the same set
        val freshRows = fresh(canonicalPerKey(batch.toDF(), key), ledgerPath, key, minBatch)
          .localCheckpoint(true)
        if (!freshRows.isEmpty) {
          freshRows.write.mode("overwrite").parquet(s"$effectsPath/batch_id=$batchId")
          mark(freshRows.select(key), ledgerPath, batchId, key)
        }
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
          minBatch > Long.MinValue)
          compact(batch.sparkSession, ledgerPath, minBatch, key)
        ()
      }
      .start()
}
