package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def feed(rows: (Long, String, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "_ts", "event_id")
      .selectExpr("user_id", "event_type", "CAST(_ts AS TIMESTAMP) AS ts", "event_id")

  test("consecutive equal attributes collapse into one version") {
    val out = Scd2.build(feed(
      (1L, "free", "2024-01-01 00:00:00", 1L),
      (1L, "free", "2024-01-02 00:00:00", 2L),
      (1L, "paid", "2024-01-03 00:00:00", 3L),
      (1L, "paid", "2024-01-04 00:00:00", 4L),
      (1L, "free", "2024-01-05 00:00:00", 5L)), "user_id", "event_type", "ts", "event_id")
      .orderBy("version").collect()
    assert(out.map(_.getAs[String]("event_type")).toSeq == Seq("free", "paid", "free"))
    assert(out.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3))
    // intervals chain: each valid_to equals the next valid_from
    assert(out(0).getAs[Timestamp]("valid_to") == out(1).getAs[Timestamp]("valid_from"))
    assert(out(1).getAs[Timestamp]("valid_to") == out(2).getAs[Timestamp]("valid_from"))
  }

  test("open interval closes at the high date and is flagged current") {
    val out = Scd2.build(feed((1L, "free", "2024-01-01 00:00:00", 1L)),
      "user_id", "event_type", "ts", "event_id").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Boolean]("is_current"))
    assert(out(0).getAs[Timestamp]("valid_to") == ts(Scd2.HighDate))
  }

  test("same-timestamp rows order by the tie column") {
    val out = Scd2.build(feed(
      (1L, "a", "2024-01-01 00:00:00", 2L),
      (1L, "b", "2024-01-01 00:00:00", 1L)), "user_id", "event_type", "ts", "event_id")
      .orderBy("version").collect()
    // event_id 1 ("b") precedes event_id 2 ("a") despite equal ts
    assert(out.map(_.getAs[String]("event_type")).toSeq == Seq("b", "a"))
    assert(!out(0).getAs[Boolean]("is_current") && out(1).getAs[Boolean]("is_current"))
  }

  test("entities are independent and exactly one current row per entity") {
    val out = Scd2.build(feed(
      (1L, "a", "2024-01-01 00:00:00", 1L),
      (1L, "b", "2024-01-02 00:00:00", 2L),
      (2L, "x", "2024-01-01 00:00:00", 3L),
      (2L, "x", "2024-01-05 00:00:00", 4L),
      (3L, "z", "2024-01-03 00:00:00", 5L)), "user_id", "event_type", "ts", "event_id")
    val current = out.filter("is_current").collect()
    assert(current.map(r => r.getAs[Long]("user_id") -> r.getAs[String]("event_type")).toSet ==
      Set(1L -> "b", 2L -> "x", 3L -> "z"))
    assert(out.count() == 4) // user 2's duplicate state collapsed
  }
}
