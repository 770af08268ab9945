package graft.operators

import graft.SparkSpec

/** Corpus-rewriting invariants: first-owner survival, in-order
  * reassembly with short tails, total-scrub empty rewrites, within-doc
  * df counting, and boilerplate cut from every copy. The corpus-grain
  * contract is oracle-gated by q_span_scrub / q_boilerplate_strip.
  */
class RewriteSpec extends SparkSpec {
  import spark.implicits._

  test("scrubRepeatedSpans keeps a repeated span only at its first owner, in order") {
    // k=2 chunks: doc 1 = ["a b", "c d"], doc 2 = ["a b", "x y"],
    // doc 3 = ["c d", "a b"] — "a b" owned by (1,0), "c d" by (1,1)
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "c d a b")).toDF("doc_id", "text")
    val out = Rewrite.scrubRepeatedSpans(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((2L, 2L, "a b c d"))) // owner keeps everything
    assert(out(2L) === ((2L, 1L, "x y")))     // lost "a b"
    assert(out(3L) === ((2L, 0L, "")))        // lost both → empty rewrite
  }

  test("scrubRepeatedSpans: first owner of a within-doc repeat is the smallest position") {
    // doc 1 repeats "a b" at positions 0 and 1: only position 0 survives
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = Rewrite.scrubRepeatedSpans(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((2L, 1L, "a b")))
    assert(out(2L) === ((1L, 0L, "")))
  }

  test("scrubRepeatedSpans keeps a short tail chunk and ignores extra spaces") {
    val docs = Seq((1L, "a b  c"), (2L, "z z")).toDF("doc_id", "text")
    val out = Rewrite.scrubRepeatedSpans(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((2L, 2L, "a b c"))) // tail "c" is its own chunk
    assert(out(2L) === ((1L, 1L, "z z")))
  }

  test("stripBoilerplate cuts a template chunk from EVERY doc of its group only") {
    // group g1: "nav bar" in 3 of 3 docs → boilerplate; g2 has the same
    // chunk in 1 doc → content there
    val docs = Seq(
      (1L, "nav bar p q", "g1"),
      (2L, "nav bar r s", "g1"),
      (3L, "t u nav bar", "g1"),
      (4L, "nav bar v w", "g2")).toDF("doc_id", "text", "source")
    val out = Rewrite.stripBoilerplate(docs, "doc_id", "text", "source", 2, 3)
      .as[(Long, String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) === (("g1", 2L, 1L, "p q")))
    assert(out(2L) === (("g1", 2L, 1L, "r s")))
    assert(out(3L) === (("g1", 2L, 1L, "t u")))
    assert(out(4L) === (("g2", 2L, 2L, "nav bar v w"))) // other group untouched
  }

  test("stripBoilerplate counts a chunk once per doc for df") {
    // "x y" appears twice in doc 1 but only in 2 distinct docs → df=2 < 3
    val docs = Seq(
      (1L, "x y x y", "g"), (2L, "x y a b", "g"), (3L, "c d e f", "g"))
      .toDF("doc_id", "text", "source")
    val out = Rewrite.stripBoilerplate(docs, "doc_id", "text", "source", 2, 3)
      .as[(Long, String, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) === 2L && out(2L) === 2L && out(3L) === 2L) // nothing cut
  }
}
