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
  /** `events.ts` arrives in whatever physical type the generator chose:
    * parquet TIMESTAMP(NANOS) reads as a raw long
    * (`spark.sql.legacy.parquet.nanosAsLong`, set by [[GraftSession]]),
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as TIMESTAMP_NTZ.
    * Normalize both to a plain session-TZ timestamp here so every query
    * sees one `ts` type (the session TZ is pinned to UTC, so the NTZ
    * cast is numerically exact). NOTE: `div` (integer division) is
    * load-bearing on the nanos path — `/` on longs is DOUBLE division
    * and epoch nanos exceed a double's 53-bit mantissa, silently
    * shifting timestamps by ±1µs.
    */
  def events(spark: SparkSession, d: String): DataFrame =
    normalizeTs(table(spark, d, "events"))

  /** The ONE home of the ts-normalization rule — the streaming file
    * replay ([[graft.streaming.EventPipeline.readEventStream]]) must
    * apply the identical conversion or batch and stream silently
    * diverge on the same bytes.
    */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType.typeName match {
      case "long" => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
