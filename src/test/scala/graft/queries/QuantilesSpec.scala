package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The distributed rank-window quantiles must be BIT-identical to the
  * single-buffer `percentile` they replace — the DuckDB oracle was
  * validated against `percentile`, so bit-parity here transfers that
  * validation to the scale-safe formulation.
  */
class QuantilesSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("rank-window quantiles are bit-identical to the percentile aggregate") {
    val got = ParityQueries.quantiles(spark, d)
      .orderBy("event_type").collect().toSeq
    val ref = Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"))
      .orderBy("event_type").collect().toSeq
    // Row.equals boxes doubles: comparison is doubleToLongBits — exact.
    assert(got === ref)
  }

  test("quantiles on tiny groups (n=1, n=2) interpolate like percentile") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("b", 1.0), ("b", 4.0), ("c", 1.0), ("c", 2.0), ("c", 10.0))
      .toDF("event_type", "value")
    val got = ParityQueries.quantilesOver(df).orderBy("event_type").collect().toSeq
    val ref = df.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        min(col("value")).as("v_min"), max(col("value")).as("v_max"))
      .orderBy("event_type").collect().toSeq
    assert(got === ref)
  }
}
