package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property: the distributed rank-window quantiles are RAW-BIT equal to
  * Spark's `percentile` aggregate on arbitrary grouped data — group
  * sizes 1..40, duplicate-heavy values, negative values, several
  * groups. This is the strongest form of the claim QuantilesSpec
  * asserts on fixtures: the DuckDB oracle was validated against
  * `percentile`, so bit-parity transfers that validation to the
  * scale-safe formulation for ANY data, not just the fixture.
  */
object QuantileProps extends Properties("graft.quantiles") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkTestSession.session

  private val groupGen: Gen[List[Double]] = for {
    n <- Gen.chooseNum(1, 40)
    // duplicate-heavy pool: small integer grid plus a few arbitrary doubles
    vs <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(-5, 5).map(_.toDouble / 2.0),
      Gen.chooseNum(-1e6, 1e6).map(_ / 1024.0)))
  } yield vs

  property("rank-window quantiles == percentile aggregate, raw bits") =
    Prop.forAll(Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, groupGen))) { groups =>
      import spark.implicits._
      val rows = groups.zipWithIndex.flatMap { case (vs, g) => vs.map(v => (s"g$g", v)) }
      val df = rows.toDF("event_type", "value")
      val got = ParityQueries.quantilesOver(df).orderBy("event_type").collect().toSeq
      val ref = df.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.95)").as("p95"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .orderBy("event_type").collect().toSeq
      // Row.equals boxes doubles -> doubleToLongBits comparison (exact)
      Prop(got == ref) :| s"got=$got ref=$ref"
    }
}
