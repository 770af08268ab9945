package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-level contract of DSIR importance resampling: weight
  * direction (target-enriched vocabulary scores high), the clip, the
  * keep fraction, and determinism. Cross-engine arithmetic is gated
  * by q_dsir_resample's oracle.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target vocabulary: "alpha beta"; raw junk: "junk0..junk99"
  private def corpus = {
    val target = (0L until 20L).map(i => (i, "alpha beta alpha beta alpha"))
    val junk = (20L until 100L).map(i => (i, (0 until 5).map(j => s"junk${(i + j) % 97}").mkString(" ")))
    (target ++ junk).toDF("doc_id", "text")
  }

  test("target-like documents outscore junk and fill the kept set") {
    val out = Dsir.resample(corpus, corpus.filter($"doc_id" < 20), "doc_id", "text", 2000)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(out.size === 100)
    val (targetRows, junkRows) = out.partition(_._1 < 20)
    val minTarget = targetRows.map(_._2).min
    val maxJunk = junkRows.map(_._2).max
    assert(minTarget > maxJunk,
      s"target docs must outscore junk: minTarget=$minTarget maxJunk=$maxJunk")
    // keepBp=2000 of 100 docs = 20 docs; bin granularity keeps whole
    // bins so the kept set is AT LEAST 20 and exactly the top scorers
    val kept = out.filter(_._3 == 1L)
    assert(kept.size >= 20)
    assert(kept.forall(_._1 < 20), "only target-vocabulary docs should be kept")
  }

  test("weights clip at WClamp and stay positive") {
    val w = Dsir.bucketWeights(corpus, corpus.filter($"doc_id" < 20), "text")
      .collect().map(_.getLong(1))
    assert(w.nonEmpty)
    assert(w.forall(v => v > 0 && v <= Dsir.WClamp))
  }

  test("resample is deterministic across runs and partitionings") {
    val a = Dsir.resample(corpus, corpus.filter($"doc_id" < 20), "doc_id", "text", 2500)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.resample(corpus.repartition(7), corpus.filter($"doc_id" < 20),
        "doc_id", "text", 2500)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("keepBp=10000 keeps everything; keepBp=0 keeps at most the top bin") {
    val all = Dsir.resample(corpus, corpus.filter($"doc_id" < 20), "doc_id", "text", 10000)
    assert(all.filter($"kept" === 1).count() === 100)
    val none = Dsir.resample(corpus, corpus.filter($"doc_id" < 20), "doc_id", "text", 0)
    val keptTop = none.filter($"kept" === 1)
    // 0 bp still keeps the single top bin (documented overshoot bound)
    assert(keptTop.count() <= 20)
  }
}
