package graft.sinks

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once BATCH OUTPUT for foreachBatch file sinks: Spark
  * re-invokes foreachBatch with the same batchId after a failure, so a
  * naive append would duplicate rows. Each batch writes to a
  * batch-id-scoped directory and drops a commit marker; a redelivered
  * batchId that finds its marker is skipped. Readers take only marked
  * directories — the standard transactional-directory pattern for
  * non-transactional stores.
  */
object IdempotentBatchSink {

  def commitMarker(outDir: String, batchId: Long): java.nio.file.Path =
    Paths.get(outDir, s"batch=$batchId", "_COMMITTED")

  /** Write one micro-batch exactly once; returns true when written,
    * false when the batchId was already committed (redelivery).
    */
  def writeBatch(batch: DataFrame, outDir: String, batchId: Long): Boolean = {
    val marker = commitMarker(outDir, batchId)
    if (Files.exists(marker)) false
    else {
      val dir = Paths.get(outDir, s"batch=$batchId")
      batch.write.mode("overwrite").parquet(dir.toString)
      Files.createFile(marker)
      true
    }
  }

  /** Streaming entry: parquet output with exactly-once batch commits. */
  def start(events: DataFrame, outDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        writeBatch(batch.toDF(), outDir, batchId)
        ()
      }
      .start()

  /** Read back only COMMITTED batches. */
  def readCommitted(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val committed = Option(Paths.get(outDir).toFile.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && Files.exists(Paths.get(d.getPath, "_COMMITTED")))
      .map(_.getPath)
    require(committed.nonEmpty, s"no committed batches under $outDir")
    spark.read.parquet(committed.toIndexedSeq: _*)
  }
}
