package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Nearest-centroid classifier invariants: exact centroid arithmetic on
  * a hand-checkable corpus, argmax + lexicographic tie-break, the
  * all-OOV fallback, length-normalization under class imbalance, and
  * confusion-matrix totals. The corpus-grain contract is oracle-gated
  * by q_classify / q_classify_eval.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // Two classes with disjoint-ish vocab: "x" owns a/b, "y" owns c/d;
  // token "m" appears in both at the same rate.
  private def train = Seq(
    (1L, "a a b m", "x"),
    (2L, "a b b m", "x"),
    (3L, "c c d m", "y"),
    (4L, "c d d m", "y")).toDF("doc_id", "text", "source")

  test("classCentroids are exact per-class ppb frequencies") {
    val cen = Classify.classCentroids(train, "source", "text")
      .as[(String, String, Long)].collect().map { case (c, w, r) => (c, w) -> r }.toMap
    // class x: 8 tokens — a×3, b×3, m×2
    assert(cen(("x", "a")) === 375000000L)
    assert(cen(("x", "b")) === 375000000L)
    assert(cen(("x", "m")) === 250000000L)
    // class y: 8 tokens — c×3, d×3, m×2
    assert(cen(("y", "c")) === 375000000L)
    assert(cen(("y", "m")) === 250000000L)
    assert(cen.get(("x", "c")) === None) // no cross-class mass
  }

  test("centroidClassify predicts the matching class and scores the exact mean") {
    val cen = Classify.classCentroids(train, "source", "text")
    val test = Seq((10L, "a b"), (11L, "c d"), (12L, "m m")).toDF("doc_id", "text")
    val out = Classify.centroidClassify(test, "doc_id", "text", cen)
      .as[(Long, String, Long)].collect().map { case (id, p, s) => id -> ((p, s)) }.toMap
    assert(out(10L) === (("x", 375000000L))) // (375e6+375e6)/2
    assert(out(11L) === (("y", 375000000L)))
    // "m m" scores 250e6 in BOTH classes → lexicographic tie-break: x
    assert(out(12L) === (("x", 250000000L)))
  }

  test("all-OOV documents predict the explicit Unclassifiable marker") {
    val cen = Classify.classCentroids(train, "source", "text")
    val test = Seq((20L, "zz qq"), (21L, "a a")).toDF("doc_id", "text")
    val out = Classify.centroidClassify(test, "doc_id", "text", cen)
      .as[(Long, String, Long)].collect().map { case (id, p, s) => id -> ((p, s)) }.toMap
    assert(out(20L) === ((Classify.Unclassifiable, 0L)))
    assert(out(21L) === (("x", 375000000L)))
  }

  test("length normalization: a 10x bigger class does not tilt the centroid") {
    // class "big" has 10 copies of the same doc; per-class ppb is
    // identical to a single-copy class, so a doc matching "small"
    // still wins on vocabulary, not on class size.
    val docs = (1L to 10L).map(i => (i, "a a b", "big")) :+ ((99L, "c c d", "small"))
    val cen = Classify.classCentroids(docs.toDF("doc_id", "text", "source"), "source", "text")
    val out = Classify.centroidClassify(
      Seq((100L, "c d")).toDF("doc_id", "text"), "doc_id", "text", cen)
      .as[(Long, String, Long)].collect().head
    assert(out._2 === "small")
  }

  test("confusion counts partition the held-out set") {
    val cen = Classify.classCentroids(train, "source", "text")
    val heldOut = Seq(
      (30L, "a b", "x"), (31L, "c d", "y"), (32L, "c c", "x")).toDF("doc_id", "text", "source")
    val preds = Classify.centroidClassify(heldOut, "doc_id", "text", cen)
    val conf = Classify.confusion(heldOut, "doc_id", "source", preds)
      .as[(String, String, Long)].collect().map { case (l, p, n) => (l, p) -> n }.toMap
    assert(conf(("x", "x")) === 1L)
    assert(conf(("y", "y")) === 1L)
    assert(conf(("x", "y")) === 1L) // doc 32 is labeled x but reads like y
    assert(conf.values.sum === 3L)
  }
}
