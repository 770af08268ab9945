package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native dot expression must be bit-identical to the `aggregate`
  * HOF fold it replaced — every ANN oracle twin was validated against
  * that fold, so parity here transfers the validation.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(sequence(lit(1), lit(dim)), lit(0.0),
      (acc, i) => acc + element_at(a, i) * element_at(b, i))

  test("bit-identical to the aggregate-HOF fold on pseudo-random arrays") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(dim)(rnd.nextDouble() * 2 - 1),
      Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      DotProductCol.dot(col("a"), col("b"), dim).as("nat"),
      hofDot(col("a"), col("b")).as("hof"))
    // compare raw bits, not numeric equality
    val bad = cmp.filter(expr("nat IS DISTINCT FROM hof")).count()
    assert(bad === 0)
  }

  test("null array and null element both yield null, like the HOF") {
    val df = Seq(
      (Some(Seq[Option[Double]](Some(1.0), Some(2.0))), Some(Seq[Option[Double]](Some(3.0), Some(4.0)))),
      (None, Some(Seq[Option[Double]](Some(3.0), Some(4.0)))),
      (Some(Seq[Option[Double]](Some(1.0), None)), Some(Seq[Option[Double]](Some(3.0), Some(4.0)))))
      .toDF("a", "b")
    val got = df.select(DotProductCol.dot(col("a"), col("b"), 2).as("d"))
      .as[Option[Double]].collect().toSeq
    assert(got === Seq(Some(11.0), None, None))
  }

  test("works inside a transform lambda (the centroid-scoring shape) and under strict codegen") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val cents = typedlit(Seq(Seq(1.0, 0.0), Seq(0.0, 2.0)))
      val got = Seq(Seq(3.0, 5.0)).toDF("v")
        .select(transform(cents, c => DotProductCol.dot(col("v"), c, 2)).as("d"))
        .as[Seq[Double]].head()
      assert(got === Seq(3.0, 10.0))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("arrays shorter than dim fail loudly instead of silently truncating") {
    val err = intercept[Exception] {
      Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b")
        .select(DotProductCol.dot(col("a"), col("b"), 2)).collect()
    }
    assert(err.getMessage != null)
  }
}
