package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property: the distributed funnel equals a driver-side reference fold
  * on arbitrary event sets — including duplicate timestamps, missing
  * stages, out-of-order generation and noise event types.
  */
object FunnelProps extends Properties("graft.funnel") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestSession.session
  private val stages = Seq("A", "B", "C")

  private case class Ev(user: Long, typ: String, minute: Int)
  private val evGen: Gen[Ev] = for {
    u <- Gen.chooseNum(1L, 3L)
    t <- Gen.oneOf("A", "B", "C", "X")
    m <- Gen.chooseNum(0, 30)
  } yield Ev(u, t, m)

  private def tsOf(minute: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
  private def usOf(minute: Int) = tsOf(minute).getTime * 1000L

  /** Reference: sequential fold per user — stage k is the min event
    * time of stages(k) strictly after stage k-1's time.
    */
  private def reference(evs: List[Ev]): Map[Long, List[Long]] =
    evs.groupBy(_.user).flatMap { case (u, es) =>
      val times = stages.foldLeft(List.empty[Long]) { (acc, st) =>
        val cands = es.filter(e => e.typ == st)
          .map(e => usOf(e.minute))
          .filter(t => acc.isEmpty || t > acc.last)
        if (acc.length == stages.indexOf(st) && cands.nonEmpty) acc :+ cands.min else acc
      }
      if (times.nonEmpty) Some(u -> times) else None
    }

  property("funnel operator == sequential reference fold (dense/hot users)") =
    Prop.forAll(Gen.listOfN(150, evGen)) { evs =>
      // 150 events over 3 users: every user is "hot" relative to the
      // 31-minute clock, forcing heavy duplicate-timestamp and
      // spam-before-entry shapes through the streaming fold
      import spark.implicits._
      val df = evs.map(e => (e.user, e.typ, tsOf(e.minute))).toDF("user_id", "event_type", "ts")
      val got = Funnel.funnel(df, "user_id", "event_type", "ts", stages)
        .collect().map { r =>
          val times = (1 to stages.size).toList
            .takeWhile(i => !r.isNullAt(i)).map(r.getLong)
          r.getLong(0) -> times
        }.toMap
      Prop(got == reference(evs)) :| s"got=$got want=${reference(evs)}"
    }

  property("funnel operator == sequential reference fold") =
    Prop.forAll(Gen.listOfN(25, evGen)) { evs =>
      import spark.implicits._
      val df = evs.map(e => (e.user, e.typ, tsOf(e.minute))).toDF("user_id", "event_type", "ts")
      val got = Funnel.funnel(df, "user_id", "event_type", "ts", stages)
        .collect().map { r =>
          val times = (1 to stages.size).toList
            .takeWhile(i => !r.isNullAt(i)).map(r.getLong)
          r.getLong(0) -> times
        }.toMap
      val want = reference(evs)
      Prop(got == want) :| s"got=$got want=$want events=$evs"
    }
}
