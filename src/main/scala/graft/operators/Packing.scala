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

  /** [[packSequences]] over an EXTERNAL per-document token count — the
    * composition point for a REAL tokenizer (BPE counts instead of
    * whitespace words). Same one-shuffle prefix-sum formulation; the
    * count column is whatever the upstream tokenizer produced.
    */
  def packCounts(counts: DataFrame, idCol: String, countCol: String,
                 shards: Int, budgetTokens: Int): DataFrame = {
    require(shards > 0 && budgetTokens > 0, s"shards=$shards budget=$budgetTokens must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    counts.select(col(idCol).as("doc_id"),
        pmod(Hashing.stableHash60(col(idCol).cast("string")), lit(shards.toLong)).as("shard"),
        col(countCol).cast("int").as("n_tokens"))
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
    s"""WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens FROM documents),
       |n AS (SELECT doc_id, n_tokens,
       |             1 + (greatest(n_tokens - $chunkTokens, 0) + ${stride - 1}) // $stride AS n_chunks
       |      FROM t)
       |SELECT doc_id, n_tokens, chunk_idx,
       |       chunk_idx * $stride AS start_tok,
       |       least(chunk_idx * $stride + $chunkTokens, n_tokens) AS end_tok
       |FROM (SELECT doc_id, n_tokens, unnest(range(n_chunks)) AS chunk_idx FROM n)""".stripMargin
  }

  /** Content-defined chunking (CDC): cut a document into variable-size
    * passages at words whose stable hash ≡ 0 mod `divisor` — the
    * rolling-hash boundary rule (Rabin/FastCDC family, word
    * granularity). Because boundaries depend only on CONTENT, the same
    * passage embedded in two different documents chunks identically
    * (interior boundaries align), which is what makes the fingerprints
    * joinable across documents — a fixed-width chunker would misalign
    * on the first inserted word. Expected chunk length = `divisor`
    * words; a pathological no-boundary document degrades to one
    * doc-sized chunk (bounded by doc length, same bound as any
    * per-doc op here).
    *
    * Shape at scale: posexplode → one running-sum window PARTITIONED
    * BY DOC (document cardinality is the parallelism) → per-chunk
    * hash agg. Chunk text is reassembled order-exact via
    * sort_array(collect_list(struct(pos, word))) — never a bare
    * collect_list, whose order is partition-dependent.
    *
    * Output: doc_id, chunk_id, n_words, fp (60-bit fingerprint).
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                divisor: Int): DataFrame = {
    require(divisor > 1, s"divisor must be > 1, got $divisor")
    val p = docs
      .select(col(idCol).as("doc_id"),
        filter(Hashing.words(col(textCol)), w => length(w) > 0).as("_w"))
      .select(col("doc_id"), posexplode(col("_w")).as(Seq("pos", "word")))
    val ch = p
      .withColumn("_brk",
        when(pmod(Hashing.stableHash60(col("word")), lit(divisor.toLong)) === 0, 1L).otherwise(0L))
      .withColumn("chunk_id",
        sum("_brk").over(Window.partitionBy("doc_id").orderBy("pos")))
    ch.groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_words"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("word")))),
          s => s.getField("word")), " ").as("_chunk_text"))
      .select(col("doc_id"), col("chunk_id"), col("n_words"),
        Hashing.stableHash60(col("_chunk_text")).as("fp"))
  }

  /** Cross-document passage dedup over [[cdcChunks]] fingerprints: the
    * passages occurring more than once in the corpus, with occurrence
    * and document counts and the canonical (lowest-id) owner. One
    * fingerprint-keyed hash aggregate after the chunker — the
    * passage-granularity companion to document-level
    * [[Dedup.exactGroups]] and span-level [[Dedup.repeatedSpans]].
    */
  def duplicatePassages(docs: DataFrame, idCol: String, textCol: String,
                        divisor: Int): DataFrame =
    cdcChunks(docs, idCol, textCol, divisor)
      .groupBy("fp")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("canonical_doc"),
        min(col("n_words")).as("n_words"))
      .filter(col("n_occ") >= 2)

  def duplicatePassagesSql(table: String, idCol: String, textCol: String,
                           divisor: Int): String =
    s"""WITH w AS (SELECT $idCol, list_filter(${Hashing.wordsSql(textCol)}, x -> length(x) > 0) AS w
       |           FROM $table),
       |p AS (SELECT $idCol, unnest(w) AS word,
       |             unnest(generate_series(0, len(w) - 1)) AS pos FROM w),
       |b AS (SELECT $idCol, pos, word,
       |             CASE WHEN (${Hashing.stableHash60Sql("word")} % $divisor) = 0
       |                  THEN 1 ELSE 0 END AS brk FROM p),
       |ch AS (SELECT $idCol, pos, word,
       |              sum(brk) OVER (PARTITION BY $idCol ORDER BY pos) AS chunk_id FROM b),
       |t AS (SELECT $idCol, chunk_id, count(*) AS n_words,
       |             string_agg(word, ' ' ORDER BY pos) AS chunk_text
       |      FROM ch GROUP BY 1, 2),
       |f AS (SELECT $idCol, ${Hashing.stableHash60Sql("chunk_text")} AS fp, n_words FROM t)
       |SELECT fp, CAST(count(*) AS BIGINT) AS n_occ,
       |       CAST(count(DISTINCT $idCol) AS BIGINT) AS n_docs,
       |       min($idCol) AS canonical_doc,
       |       CAST(min(n_words) AS BIGINT) AS n_words
       |FROM f GROUP BY 1 HAVING count(*) >= 2""".stripMargin

  def packSequencesSql(shards: Int, budgetTokens: Int): String =
    s"""WITH t AS (SELECT doc_id,
       |                  ${Hashing.stableHash60Sql("CAST(doc_id AS VARCHAR)")} % ${shards}::BIGINT AS shard,
       |                  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
       |           FROM documents),
       |c AS (SELECT doc_id, shard, n_tokens,
       |             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
       |      FROM t)
       |SELECT doc_id, shard, n_tokens, cum - n_tokens AS start_tok,
       |       (cum - n_tokens) // $budgetTokens AS first_chunk,
       |       ((cum - 1) // $budgetTokens) - ((cum - n_tokens) // $budgetTokens) + 1 AS n_chunks
       |FROM c""".stripMargin
}
