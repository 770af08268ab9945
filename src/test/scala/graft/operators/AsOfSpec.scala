package graft.operators

import graft.SparkSpec

/** As-of join semantics on hand-built timelines. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L), // before any right row
    (2L, 10L, 205L), // after right@200
    (3L, 10L, 300L), // exactly at right@300 -> inclusive
    (4L, 20L, 999L)  // key with no right rows
  ).toDF("event_id", "k", "ts")

  private def right = Seq(
    (10L, 200L, "r200"),
    (10L, 300L, "r300")
  ).toDF("k", "rts", "payload")

  test("as-of picks the latest right row at-or-before each left timestamp") {
    val out = AsOf.join(left, right, "k", "ts", "rts", Seq("payload"))
      .select("event_id", "payload").as[(Long, Option[String])].collect().toMap
    assert(out === Map(
      1L -> None,          // nothing before ts=100
      2L -> Some("r200"),  // 200 <= 205 < 300
      3L -> Some("r300"),  // inclusive boundary
      4L -> None))         // no right rows for key 20
  }

  test("all left rows and columns survive; no fan-out on multiple right matches") {
    val out = AsOf.join(left, right, "k", "ts", "rts", Seq("payload"))
    assert(out.count() === 4L)
    assert(out.columns.toSeq === Seq("event_id", "k", "ts", "payload"))
  }
}
