package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing: placement is the prefix sum of
  * token counts in doc-id order within a shard; chunk ids follow by
  * integer division.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("single shard: known layout with a budget-straddling document") {
    // token counts: 3, 4, 5 — budget 6
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i j k l"))
      .toDF("doc_id", "text")
    val got = Packing.packSequences(docs, "doc_id", "text", shards = 1, budgetTokens = 6)
      .orderBy("doc_id")
      .select("doc_id", "start_tok", "first_chunk", "n_chunks")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 1L),  // tokens [0,3) inside chunk 0
      (2L, 3L, 0L, 2L),  // tokens [3,7) straddle the cut at 6
      (3L, 7L, 1L, 1L))) // tokens [7,12): last index 11 is still chunk 1
  }

  test("chunk spans: stride, overlap and final clamp on known sizes") {
    // 10 tokens, chunk 4, overlap 1 -> stride 3: starts 0,3,6 with the
    // last span clamped; 2-token doc -> one clamped chunk
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = Packing.chunkSpans(docs, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_tok", "end_tok")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 7L), (1L, 2L, 6L, 10L),
      (2L, 0L, 0L, 2L)))
    // coverage invariant on the fixture: consecutive chunks overlap by
    // exactly `overlap` except the clamped tail, and the last chunk
    // ends at the doc end
    val fx = Packing.chunkSpans(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text", 64, 16)
    val lastEnd = fx.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.max("end_tok").as("e"),
        org.apache.spark.sql.functions.max("n_tokens").as("n"))
      .filter($"e" =!= $"n")
    assert(lastEnd.isEmpty)
  }

  test("per-shard invariants on the documents fixture: contiguous, gap-free token stream") {
    val d = "/root/testdata/sf0.001"
    val packed = Packing.packSequences(
      graft.Tables.documents(spark, d), "doc_id", "text", shards = 4, budgetTokens = 512)
    // every shard's stream starts at 0 and each doc starts where the
    // previous one ended (no gaps, no overlaps)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    val bad = packed
      .withColumn("_prev_end", lag(col("start_tok") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("start_tok") =!= col("_prev_end"))
    assert(bad.isEmpty)
    // chunk span is consistent with the integer arithmetic (`div`, not
    // `/` — long `/` is double division)
    val inconsistent = packed.filter(
      col("n_chunks") =!= expr("((start_tok + n_tokens - 1) div 512) - (start_tok div 512) + 1") ||
        col("n_chunks") < 1)
    assert(inconsistent.filter(col("n_tokens") > 0).isEmpty)
  }
}
