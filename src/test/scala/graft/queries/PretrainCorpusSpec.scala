package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Funnel-shape invariants of the pretraining-corpus capstone that the
  * hash gate alone can't articulate: the oracle proves Spark and
  * DuckDB agree, these prove the AGREED answer is a healthy pipeline —
  * every input format survives to the packed output (a quality or cap
  * stage silently starving one format regressed twice while the gate
  * stayed green during development), caps and floors hold per row, and
  * the packing arithmetic is internally consistent.
  */
class PretrainCorpusSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private lazy val out = PipelineQueries.pretrainCorpus(spark, d).cache()

  test("all four input formats survive to the packed output") {
    val formats = out.select("format").distinct().collect().map(_.getString(0)).toSet
    assert(formats === Set("pdf", "docx", "pptx", "epub"))
  }

  test("the domain cap holds per format and is actually binding at this SF") {
    val byFormat = out.groupBy("format").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byFormat.foreach { case (f, n) =>
      assert(n <= PipelineQueries.PretrainCapK, s"format $f over cap: $n")
    }
    // 500 docs / 3-id groups / 4 formats ≈ 42 groups per format, ~half
    // passing the word floor — the pdf family (always ≥10 words)
    // exceeds the cap, so at least one format must sit exactly AT it
    assert(byFormat.values.max === PipelineQueries.PretrainCapK.toLong)
  }

  test("every surviving doc meets the quality word floor") {
    // words = space-split of the extracted text, the same tokenization
    // gopherRules applied; recompute independently from the pack output
    // via the survivors' token counts: n_tokens (BPE pieces) is >= the
    // word count, which is >= the floor — check the weaker invariant
    // the output exposes directly
    val under = out.filter(col("n_tokens") < PipelineQueries.PretrainMinWords).count()
    assert(under === 0L)
  }

  test("packing arithmetic: non-negative starts, chunk spans consistent with the budget") {
    val bad = out.filter(col("start_tok") < 0 || col("n_chunks") < 1 ||
      col("n_chunks") > (col("n_tokens") / lit(256)) + lit(2)).count()
    assert(bad === 0L)
    // within a shard, start offsets are the exclusive prefix sum of
    // counts in doc_id order — no gaps, no overlaps
    import spark.implicits._
    out.select("shard", "doc_id", "n_tokens", "start_tok")
      .as[(Long, Long, Int, Long)].collect()
      .groupBy(_._1).foreach { case (shard, rows) =>
        var expect = 0L
        rows.sortBy(_._2).foreach { case (_, id, n, start) =>
          assert(start === expect, s"shard $shard doc $id: start $start != $expect")
          expect += n
        }
      }
  }
}
