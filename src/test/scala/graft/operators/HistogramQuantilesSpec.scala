package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Histogram-grid quantiles: bounded error vs the exact percentile and
  * layout-independent determinism.
  */
class HistogramQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("estimates land within one bin width of the exact percentile") {
    val lo = 0.0; val hi = 500.0; val bins = 50
    val width = (hi - lo) / bins
    val est = HistogramQuantiles.quantiles(Tables.events(spark, d),
        "event_type", "value", lo, hi, bins, Seq("p50_est" -> 0.5, "p95_est" -> 0.95))
      .orderBy("event_type").collect()
    val exact = Tables.events(spark, d).groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"), expr("percentile(value, 0.95)").as("p95"))
      .orderBy("event_type").collect()
    est.zip(exact).foreach { case (e, x) =>
      assert(math.abs(e.getDouble(1) - x.getDouble(1)) <= width, s"p50 off: $e vs $x")
      assert(math.abs(e.getDouble(2) - x.getDouble(2)) <= width, s"p95 off: $e vs $x")
    }
  }

  test("estimates are identical across partition layouts and clamp out-of-grid values") {
    val df = Seq(("a", -10.0), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 999.0))
      .toDF("g", "v")
    def run(input: org.apache.spark.sql.DataFrame) =
      HistogramQuantiles.quantiles(input, "g", "v", 0.0, 10.0, 10, Seq("p50_est" -> 0.5))
        .head.getDouble(1)
    val one = run(df)
    val other = run(df.repartition(7))
    // Row-boxed doubles compare by bits; these must be the same plan result
    assert(java.lang.Double.doubleToLongBits(one) === java.lang.Double.doubleToLongBits(other))
    // -10 clamps to bin 0, 999 to bin 9; p50 target=ceil(2.5)=3 -> third
    // value overall, bin of value 2.0 -> [2,3): lo 0 + 1*(bin 2 + 1/1)
    assert(one === 3.0)
  }
}
