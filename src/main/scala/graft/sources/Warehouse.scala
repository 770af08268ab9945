package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed warehouse tables — the co-located-join scale path: two
  * tables bucketed (and sorted) on the same key with the same bucket
  * count join WITHOUT any shuffle or sort at read time. At 100 TB this
  * converts the recurring fact⋈fact join from a full double shuffle
  * into a zip of pre-sorted buckets; the write-side cost is paid once.
  *
  * Uses the session catalog's native parquet bucketing (no Hive
  * dependency); table metadata lives for the session, files in
  * `spark.sql.warehouse.dir`.
  */
object Warehouse {
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Hive-style partitioned parquet output with controlled file sizes —
    * the layout knobs that decide whether a 100 TB table is readable:
    *
    *   - `partitionBy` prunes whole directories at read time for
    *     predicates on the partition columns;
    *   - `filesPerPartition` repartitions on (partition cols + a hash
    *     salt of `sortCol`) so each Hive partition gets a bounded file
    *     count — without this, EVERY task writes a file into every
    *     partition (tasks × partitions small files, the classic small-
    *     file explosion);
    *   - `maxRecordsPerFile` caps file length as a backstop against a
    *     skewed partition;
    *   - rows sort by `sortCol` within each output file: clustered
    *     values compress better and enable parquet min/max row-group
    *     skipping on that column.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       sortCol: String, filesPerPartition: Int = 4,
                       maxRecordsPerFile: Long = 5000000L): Unit = {
    val salt = pmod(hash(col(sortCol)), lit(filesPerPartition))
    df.repartition(partitionCols.map(col) :+ salt: _*)
      .sortWithinPartitions((partitionCols :+ sortCol).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
