package graft.operators

import graft.SparkSpec

/** Bucketed range join equals the naive theta join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 7L, 50L), (2L, 7L, 150L), (3L, 7L, 250L), (4L, 8L, 150L))
    .toDF("event_id", "k", "ts")
  private def right = Seq(
    (7L, 100L, 200L, "a"), (7L, 240L, 260L, "b"), (9L, 0L, 999L, "c"))
    .toDF("k", "s", "e", "tag")

  test("pointInInterval matches exactly the naive range predicate, boundaries inclusive") {
    for (width <- Seq(10L, 100L, 1000L)) {
      val bucketed = RangeJoin.pointInInterval(left, right, "k", "ts", "s", "e", width)
        .select("event_id", "tag").as[(Long, String)].collect().toSet
      assert(bucketed === Set((2L, "a"), (3L, "b")), s"width=$width")
    }
  }

  test("intervals spanning many buckets still match") {
    val wide = Seq((7L, 0L, 10000L, "w")).toDF("k", "s", "e", "tag")
    val out = RangeJoin.pointInInterval(left, wide, "k", "ts", "s", "e", 10L)
      .select("event_id").as[Long].collect().toSet
    assert(out === Set(1L, 2L, 3L))
  }
}
