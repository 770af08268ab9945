package graft.operators

import graft.SparkSpec

/** One-pass profiling semantics incl. types the oracle can't render. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Option("a"), Option(2.5)),
    (2L, Option("b"), None),
    (3L, None, Option(-1.0)),
    (3L, Option("b"), Option(10.0))
  ).toDF("id", "s", "v")

  test("profile computes nulls, distincts and native-ordered min/max per column") {
    val p = Profile.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(p("id") === ((0L, 3L, "1", "3")))
    assert(p("s") === ((1L, 2L, "a", "b")))
    // numeric ordering: -1.0 < 2.5 < 10.0 (a lexical min/max would say "10.0" < "2.5")
    assert(p("v") === ((1L, 3L, "-1.0", "10.0")))
  }

  test("approx mode keeps the output shape with sketched distincts") {
    val p = Profile.profile(df, Seq("id"), approx = true)
      .as[(String, Long, Long, String, String)].head()
    assert(p._1 === "id" && p._2 === 0L && p._3 >= 2L && p._3 <= 4L)
  }
}
