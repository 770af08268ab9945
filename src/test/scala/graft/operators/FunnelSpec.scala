package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Ordered-funnel semantics: stage k counts only strictly AFTER stage
  * k-1 — an out-of-order conversion must not inflate the funnel.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
  private def us(minute: Int) = ts(minute).getTime * 1000L

  test("stage timestamps are the first occurrence after the previous stage") {
    val events = Seq(
      // user 1 converts fully, but the first click predates the view:
      // only the later click counts, and the purchase between them not
      (1L, "click", ts(0)), (1L, "view", ts(1)), (1L, "purchase", ts(2)),
      (1L, "click", ts(3)), (1L, "purchase", ts(9)),
      // user 2 views twice, never clicks
      (2L, "view", ts(5)), (2L, "view", ts(6)), (2L, "purchase", ts(7)),
      // user 3 never views (not in funnel)
      (3L, "click", ts(1)), (3L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(events, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .as[(Long, Long, Option[Long], Option[Long], Int)].collect().toSeq
    assert(got === Seq(
      (1L, us(1), Some(us(3)), Some(us(9)), 3),
      (2L, us(5), None, None, 1)))
  }

  test("a hot user with 200k events folds with O(stages) state and exact semantics") {
    // the adversarial shape that makes ANY per-(user, stage) count-cap
    // wrong: 100k click events BEFORE the first view, so the true
    // conversion click is the 100,001st in click-time order. The
    // streaming fold must still find it — and must not materialize the
    // 200k-event list as one row.
    val sec = 1735725600L // 2026-01-01 10:00:00 UTC, arbitrary base
    def t(off: Long) = new Timestamp((sec + off) * 1000L)
    val hot = (1L to 100000L).map(i => (1L, "click", t(i))) ++
      Seq((1L, "view", t(100001L)), (1L, "click", t(100002L))) ++
      (1L to 100000L).map(i => (1L, "noise", t(i))) // dropped pre-shuffle
    val cold = Seq((2L, "view", t(5L)), (2L, "click", t(6L)))
    val events = scala.util.Random.shuffle(hot ++ cold).toDF("user_id", "event_type", "ts")
      .repartition(8) // arrival order and placement scrambled
    val got = Funnel.funnel(events, "user_id", "event_type", "ts", Seq("view", "click"))
      .orderBy("user_id")
      .as[(Long, Long, Option[Long], Int)].collect().toSeq
    assert(got === Seq(
      (1L, (sec + 100001L) * 1000000L, Some((sec + 100002L) * 1000000L), 2),
      (2L, (sec + 5L) * 1000000L, Some((sec + 6L) * 1000000L), 2)))
  }

  test("cohort retention: week 0 counts every user of the cohort exactly once") {
    val events = Seq(
      (1L, ts(0)), (1L, ts(5)), (2L, ts(1)),
      (2L, Timestamp.valueOf("2026-01-08 10:00:00")) // user 2 active next week
    ).toDF("user_id", "ts")
    val got = Funnel.cohortRetention(events, "user_id", "ts")
      .orderBy("week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    // both users share the first-event week; only user 2 returns a week later
    assert(got.map(r => (r._2, r._3)) === Seq((0L, 2L), (1L, 1L)))
    assert(got.map(_._1).distinct.size === 1)
  }
}
