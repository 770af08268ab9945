package graft.operators

import graft.SparkSpec

/** Rolling z-score invariants on hand-built series. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: (Long, Long)*) =
    vals.map { case (t, v) => ("a", t, v) }.toDF("key", "t", "n")

  test("a spike against an alternating baseline is flagged; the baseline itself is not") {
    // 12 points alternating 10/12 (mean 11, variance 1.09), then a 100
    val pts = (0L until 12L).map(t => t -> (if (t % 2 == 0) 10L else 12L)) :+ (12L -> 100L)
    val out = TimeSeries.rollingZScore(series(pts: _*), "key", "t", "n",
        lookback = 24, minPoints = 12, zThreshold = 3.0)
      .select("t", "z", "is_anomaly").as[(Long, Double, Int)].collect()
    assert(out.length === 1) // only the spike has >= 12 baseline points
    val (t, z, flag) = out.head
    assert(t === 12L && flag === 1)
    // baseline: six 10s, six 12s -> mean 11, sample sd sqrt(12/11)
    val expected = (100.0 - 11.0) / math.sqrt(12.0 / 11.0)
    assert(math.abs(z - expected) < 1e-9)
  }

  test("zero-variance baselines are dropped rather than scored with an undefined z") {
    // constant 5s then a spike: every row's trailing baseline has
    // variance 0 (the spike is excluded from its OWN baseline), so z is
    // undefined everywhere and no row may survive — flagging against a
    // degenerate baseline is a rule-based detector's job, not z's
    val pts = (0L until 20L).map(t => t -> 5L) :+ (20L -> 50L)
    val out = TimeSeries.rollingZScore(series(pts: _*), "key", "t", "n",
        lookback = 24, minPoints = 12, zThreshold = 3.0)
      .select("t", "is_anomaly").as[(Long, Int)].collect()
    assert(out.isEmpty) // baseline variance is 0 everywhere -> no scorable row
  }

  test("per-key windows: one key's spike never leaks into another key's baseline") {
    val a = (0L until 13L).map(t => ("a", t, if (t == 12L) 99L else (10L + t % 2)))
    val b = (0L until 13L).map(t => ("b", t, 10L + t % 2))
    val out = TimeSeries.rollingZScore((a ++ b).toDF("key", "t", "n"),
        "key", "t", "n", lookback = 24, minPoints = 12, zThreshold = 3.0)
      .select("key", "is_anomaly").as[(String, Int)].collect()
    assert(out.filter(_._1 == "a").map(_._2).toSeq === Seq(1))
    assert(out.filter(_._1 == "b").map(_._2).toSeq === Seq(0))
  }
}
