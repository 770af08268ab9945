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

  /** Derived `partsupp` relation — the driver fixture ships no
    * partsupp.parquet, but dbgen's partsupp is a DETERMINISTIC function
    * of the part and supplier keys (each part is stocked by exactly 4
    * suppliers at a fixed stride), so both engines can derive the
    * IDENTICAL relation from the tables that DO exist: this method on
    * the Spark side, [[graft.queries.ParityQueries.partsuppCte]] as the
    * DuckDB CTE on the oracle side. That unblocks TPC-H Q2/Q9/Q11/Q16/
    * Q20 without any fixture change.
    *
    * Formula (dbgen's `ps_suppkey = (ps_partkey + i*(S/4 +
    * (ps_partkey-1)/S)) mod S + 1` adapted to the fixture's 0-based
    * keys): `ps_suppkey = (p + i*step) mod S` with
    * `step = S/4 + ((p div S) mod (S/4))`, i ∈ 0..3. The `mod (S/4)`
    * keeps step in [S/4, S/2) for every fixture S (10/100/1000 —
    * P/S = 20 throughout), so i*step never hits 0 or S/2 mod S and the
    * four suppliers per part are always DISTINCT (dbgen's S is large
    * enough that its raw stride can't collide; S=10 at sf0.001 can).
    * `ps_availqty` (1..9999, like dbgen's random(1,9999)) and
    * `ps_supplycost_c` (exact integer cents, 100..100000 like dbgen's
    * random(100,100000)) are fixed modular mixes of the keys — pure
    * arithmetic both engines evaluate bit-identically, no hash
    * function needed.
    *
    * Scale note: partsupp is 4×|part| rows derived from a part-key
    * projection with a 1-row broadcast (the supplier count) — at
    * 100 TB this materializes per-partition with no shuffle, exactly
    * like reading a real partsupp table partitioned with part.
    */
  def partsupp(spark: SparkSession, d: String): DataFrame = {
    val p = part(spark, d).select(col("p_partkey"))
    val st = supplier(spark, d).agg(count(lit(1)).as("s_total"))
    p.crossJoin(broadcast(st))
      .select(col("p_partkey"), col("s_total"),
        explode(array((0 to 3).map(i => lit(i.toLong)): _*)).as("i"))
      .withColumn("ps_suppkey", expr(
        "(p_partkey + i * (s_total div 4 + ((p_partkey div s_total) % (s_total div 4)))) % s_total"))
      .select(col("p_partkey").as("ps_partkey"), col("ps_suppkey"),
        expr("(p_partkey * (i + 1) * 7 + 11) % 9999 + 1").as("ps_availqty"),
        expr("(p_partkey * 73 + ps_suppkey * 179 + i * 7919) % 99901 + 100").as("ps_supplycost_c"))
  }
}
