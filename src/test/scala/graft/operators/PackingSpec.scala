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

  test("cdcChunks: a shared passage fingerprints identically inside different docs") {
    import spark.implicits._
    // find a boundary word (hash % 4 == 0) so the passage has interior
    // structure around it
    val words = (1 to 200).map(i => s"t$i")
    val hashes = Seq(words: _*).toDF("w")
      .select(col("w"), pmod(graft.functions.Hashing.stableHash60(col("w")), lit(4L)).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val boundary = words.find(hashes(_) == 0L).get
    val interior = words.filter(hashes(_) != 0L).take(6)
    val passage = (interior.take(3) :+ boundary) ++ interior.drop(3)
    // the same passage embedded after different prefixes
    val docA = (Seq(interior(0)) ++ passage).mkString(" ")
    val docB = (Seq(boundary, interior(1), interior(2)) ++ passage).mkString(" ")
    val chunks = Packing.cdcChunks(
      Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"), "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect()
    val fpsA = chunks.filter(_._1 == 1L).map(_._4).toSet
    val fpsB = chunks.filter(_._1 == 2L).map(_._4).toSet
    // the interior-aligned chunk (from the boundary word onward) is
    // shared even though prefixes differ
    assert(fpsA.intersect(fpsB).nonEmpty)
    // chunk word counts cover each doc exactly
    assert(chunks.filter(_._1 == 1L).map(_._3).sum === docA.split(" ").length.toLong)
    assert(chunks.filter(_._1 == 2L).map(_._3).sum === docB.split(" ").length.toLong)
  }

  test("duplicatePassages reports occurrences, distinct docs, and canonical owner") {
    import spark.implicits._
    val words = (1 to 200).map(i => s"t$i")
    val hashes = Seq(words: _*).toDF("w")
      .select(col("w"), pmod(graft.functions.Hashing.stableHash60(col("w")), lit(4L)).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = words.find(hashes(_) == 0L).get
    val ints = words.filter(hashes(_) != 0L)
    // a chunk runs from its boundary word to just before the NEXT
    // boundary (or doc end), so back-to-back repeats chunk identically
    val passage = Seq(b, ints(0), ints(1)).mkString(" ")
    val docs = Seq(
      (3L, s"$passage $passage"),
      (7L, s"${ints(3)} $passage"),
      (9L, s"${ints(4)} ${ints(5)}")).toDF("doc_id", "text")
    val out = Packing.duplicatePassages(docs, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    val dup = out.filter(r => r._2 >= 3) // the tripled passage
    assert(dup.length === 1)
    assert(dup.head._2 === 3L) // n_occ
    assert(dup.head._3 === 2L) // n_docs
    assert(dup.head._4 === 3L) // canonical = min doc id
  }
}
