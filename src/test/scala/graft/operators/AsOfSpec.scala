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

  test("a null payload value on the matched right row stays null — no backfill from older rows") {
    // right@300 is the as-of match for left@305 and carries p2 = null;
    // a per-column fill would resurrect p2 = "b200" from right@200,
    // mixing two right rows into one output row.
    val l = Seq((1L, 10L, 305L)).toDF("event_id", "k", "ts")
    val r = Seq(
      (10L, 200L, Option("a200"), Option("b200")),
      (10L, 300L, Option("a300"), Option.empty[String])
    ).toDF("k", "rts", "p1", "p2")
    val out = AsOf.join(l, r, "k", "ts", "rts", Seq("p1", "p2"))
      .select("p1", "p2").as[(Option[String], Option[String])].head()
    assert(out === (Some("a300"), None))
  }
}
