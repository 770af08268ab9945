package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-state distinct sketch: deterministic, layout-independent,
  * and accurate enough to be worth its bounded buffer.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val bins = 4096
  // 1000 true distinct keys, each appearing 1-3 times
  private def rows = (1L to 1000L).flatMap(k => Seq.fill((k % 3).toInt + 1)(("g", k)))
    .toDF("g", "k")

  test("occupied is a pure function of the data — identical across partition layouts") {
    val a = Sketches.distinctSketch(rows, $"g", $"k", bins).collect().head
    val b = Sketches.distinctSketch(rows.repartition(13), $"g", $"k", bins).collect().head
    assert(a === b)
  }

  test("occupied is bounded by both the exact count and the bin count") {
    val r = Sketches.distinctSketch(rows, $"g", $"k", bins)
      .select("n_rows", "n_exact", "occupied").as[(Long, Long, Long)].collect().head
    val (nRows, exact, occ) = r
    assert(nRows === 2000L && exact === 1000L)
    assert(occ <= exact && occ <= bins.toLong && occ > 0L)
  }

  test("linear-counting estimate lands within ~10% at quarter occupancy") {
    val occ = Sketches.distinctSketch(rows, $"g", $"k", bins)
      .select("occupied").as[Long].collect().head
    val est = Sketches.estimate(occ, bins)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.10, s"occ=$occ est=$est")
  }

  test("estimate edge cases: empty is zero, saturation hits the ceiling, bad input throws") {
    assert(Sketches.estimate(0L, bins) === 0.0)
    assert(Sketches.estimate(bins.toLong, bins) === bins * math.log(bins.toDouble))
    intercept[IllegalArgumentException](Sketches.estimate(bins + 1L, bins))
    intercept[IllegalArgumentException](Sketches.estimate(-1L, bins))
  }
}
