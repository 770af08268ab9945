package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the standard way GPT-style
  * training pipelines turn variable-length documents into fixed-size
  * training sequences: documents are concatenated in a deterministic
  * order and the token stream is cut every `budgetTokens` tokens
  * (documents may straddle a cut; GPT-3 App. B describes exactly this).
  *
  * Distributed formulation: a doc's placement depends only on the
  * PREFIX SUM of token counts before it, so packing is one hash-shard
  * shuffle plus a per-shard cumulative-sum window:
  *   - shard = stable hash of the doc id mod `shards` — the unit of
  *     parallelism AND the packing domain, so streams are independent
  *     and adding shards rebalances without changing any shard's
  *     content (hash, not round-robin);
  *   - within a shard docs pack in doc-id order (total, reproducible);
  *   - start_tok = cumsum - n_tokens; the doc's first/last chunk ids
  *     follow by integer division, n_chunks = last - first + 1.
  *
  * Everything is integer arithmetic — bit-exact on any engine — and
  * the per-shard sort spills via the external sorter at scale.
  */
object Packing {
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shards: Int, budgetTokens: Int): DataFrame = {
    require(shards > 0 && budgetTokens > 0, s"shards=$shards budget=$budgetTokens must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(col(idCol).as("doc_id"),
        pmod(Hashing.stableHash60(col(idCol).cast("string")), lit(shards.toLong)).as("shard"),
        size(Hashing.words(col(textCol))).as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("_cum") - col("n_tokens")).as("start_tok"),
        expr(s"(_cum - n_tokens) div $budgetTokens").as("first_chunk"),
        expr(s"((_cum - 1) div $budgetTokens) - ((_cum - n_tokens) div $budgetTokens) + 1")
          .as("n_chunks"))
  }

  /** Per-document sliding-window chunk spans (the RAG / long-context
    * preprocessing shape — WITHIN a doc, unlike [[packSequences]]'
    * cross-doc concat): chunks of `chunkTokens` tokens starting every
    * `chunkTokens - overlap`, last chunk clamped to the doc end. One
    * generator per row (no shuffle at all); all integer arithmetic, so
    * spans are engine-exact. A doc shorter than one chunk yields a
    * single clamped span.
    */
  def chunkSpans(docs: DataFrame, idCol: String, textCol: String,
                 chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
    val stride = chunkTokens - overlap
    docs.select(col(idCol).as("doc_id"),
        size(Hashing.words(col(textCol))).as("n_tokens"))
      // chunks = 1 + ceil(max(0, n-C)/stride), as integer arithmetic
      .withColumn("_n_chunks",
        lit(1L) + expr(s"(greatest(n_tokens - $chunkTokens, 0) + ${stride - 1}) div $stride"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("_n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("n_tokens"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(col("chunk_idx") * stride + chunkTokens, col("n_tokens")).as("end_tok"))
  }

  def chunkSpansSql(chunkTokens: Int, overlap: Int): String = {
    val stride = chunkTokens - overlap
    s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
       |n AS (SELECT doc_id, n_tokens,
       |             1 + (greatest(n_tokens - $chunkTokens, 0) + ${stride - 1}) // $stride AS n_chunks
       |      FROM t)
       |SELECT doc_id, n_tokens, chunk_idx,
       |       chunk_idx * $stride AS start_tok,
       |       least(chunk_idx * $stride + $chunkTokens, n_tokens) AS end_tok
       |FROM (SELECT doc_id, n_tokens, unnest(range(n_chunks)) AS chunk_idx FROM n)""".stripMargin
  }

  def packSequencesSql(shards: Int, budgetTokens: Int): String =
    s"""WITH t AS (SELECT doc_id,
       |                  ${Hashing.stableHash60Sql("CAST(doc_id AS VARCHAR)")} % ${shards}::BIGINT AS shard,
       |                  len(string_split(text, ' ')) AS n_tokens
       |           FROM documents),
       |c AS (SELECT doc_id, shard, n_tokens,
       |             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
       |      FROM t)
       |SELECT doc_id, shard, n_tokens, cum - n_tokens AS start_tok,
       |       (cum - n_tokens) // $budgetTokens AS first_chunk,
       |       ((cum - 1) // $budgetTokens) - ((cum - n_tokens) // $budgetTokens) + 1 AS n_chunks
       |FROM c""".stripMargin
}
