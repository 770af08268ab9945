package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every table is a plain parquet file under `sfDir`; loading through a
  * single helper keeps filter/column pushdown intact (the scan is always
  * the leaf of the plan — Catalyst prunes columns and pushes predicates
  * into the parquet reader automatically).
  *
  * At 100 TB these would be partitioned/bucketed table locations instead
  * of single files; the API is path-based so nothing here changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long (`spark.sql.legacy.parquet.nanosAsLong`, set by
    * [[GraftSession]]); convert to a microsecond timestamp here so every
    * query sees a normal timestamp column. NOTE: `div` (integer
    * division) is load-bearing — `/` on longs is DOUBLE division and
    * epoch nanos exceed a double's 53-bit mantissa, silently shifting
    * timestamps by ±1µs.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = table(spark, d, "events")
    if (raw.schema("ts").dataType.typeName == "long")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
