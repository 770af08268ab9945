package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
