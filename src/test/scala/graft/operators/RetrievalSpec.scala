package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** BM25 retrieval + reciprocal-rank fusion: ranking semantics on a
  * hand-built corpus (where the right answer is computable by eye) and
  * structural invariants on the real documents fixture.
  */
class RetrievalSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25: a probe's rare term outranks common-term matches") {
    // "zebra" appears in exactly one corpus doc; "apple" in two.
    // idf-odds of zebra ≫ apple, so doc 3 must rank first for the probe.
    val corpus = df(Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple apple plum plum"),
      (3L, "zebra quince")))
    val probes = df(Seq((100L, "zebra apple")))
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", probes, "doc_id", "text", 3)
      .orderBy("rk").collect()
    assert(top.map(_.getAs[Long]("doc_id")).head === 3L)
    assert(top.map(_.getAs[Int]("rk")).toSeq === (1 to top.length))
  }

  test("bm25: term saturation — tf 3 scores below 3x the tf 1 weight, above the tf 1 weight") {
    // Same doc length, same single matched term, tf 1 vs tf 3: BM25's
    // k1 saturation must give diminishing returns per extra occurrence.
    val corpus = df(Seq(
      (1L, "apple pad pad pad pad pad"),
      (2L, "apple apple apple pad pad pad")))
    val probes = df(Seq((100L, "apple")))
    val scores = Retrieval.bm25Pairs(corpus, "doc_id", "text", probes, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_u")).toMap
    assert(scores(2L) > scores(1L), s"tf=3 must outscore tf=1: $scores")
    assert(scores(2L) < 3 * scores(1L), s"saturation must cap the tf=3 gain: $scores")
  }

  test("bm25: probe term multiplicity is ignored (query terms are a set)") {
    val corpus = df(Seq((1L, "apple banana"), (2L, "plum banana")))
    val once = Retrieval.bm25Pairs(corpus, "doc_id", "text",
      df(Seq((100L, "apple"))), "doc_id", "text")
    val thrice = Retrieval.bm25Pairs(corpus, "doc_id", "text",
      df(Seq((100L, "apple apple apple"))), "doc_id", "text")
    assert(rows(once.orderBy("doc_id")) === rows(thrice.orderBy("doc_id")))
  }

  test("rrfFuse: hand-computed fusion of two partial rankings") {
    import spark.implicits._
    // System A ranks docs 10, 20; system B ranks 20, 30.
    // rrf: doc 20 = 1/62 + 1/61 (both), doc 10 = 1/61, doc 30 = 1/62.
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("probe_id", "doc_id", "r_a")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("probe_id", "doc_id", "r_b")
    val fused = Retrieval.rrfFuse(a, "r_a", b, "r_b", k0 = 60, k = 3)
      .orderBy("rk").collect()
    assert(fused.map(_.getAs[Long]("doc_id")).toSeq === Seq(20L, 10L, 30L))
    val expected = Seq(1.0 / 62 + 1.0 / 61, 1.0 / 61, 1.0 / 62)
    fused.map(_.getAs[Double]("rrf")).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-15, s"rrf $got != $want")
    }
    // one-sided docs carry a null rank from the absent system
    assert(fused.find(_.getAs[Long]("doc_id") == 10L).get.isNullAt(3))
  }

  test("rrfFuse: a doc ranked by both systems beats symmetric one-sided docs") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("probe_id", "doc_id", "r_a")
    val b = Seq((1L, 20L, 2), (1L, 30L, 1)).toDF("probe_id", "doc_id", "r_b")
    // doc 20: 1/62 + 1/62 > doc 10 = doc 30 = 1/61; tie broken by doc_id.
    val fused = Retrieval.rrfFuse(a, "r_a", b, "r_b", 60, 3).orderBy("rk").collect()
    assert(fused.map(_.getAs[Long]("doc_id")).toSeq === Seq(20L, 10L, 30L))
  }

  test("fixture invariants: every retrieved doc shares a term, ranks are dense, k bounds hold") {
    val doc = Tables.documents(spark, d)
    val top = Retrieval.bm25TopK(doc.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      doc.filter(col("doc_id") % 10 === 0), "doc_id", "text", 5)
      .localCheckpoint(true)
    assert(top.filter(col("n_matched") < 1 || col("score_u") <= 0).isEmpty)
    assert(top.groupBy("probe_id").count().filter(col("count") > 5).isEmpty)
    val ranks = top.groupBy("probe_id")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
    assert(ranks.filter(col("mn") =!= 1 || col("mx") =!= col("n")).isEmpty)
  }
}
