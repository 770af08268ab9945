package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted model artifacts for the retrieval / curation layer.
  *
  * At 100 TB the expensive pass of BM25 and of the CCNet-style LM
  * score is the same one: tokenize + explode + first-level aggregation
  * over the raw corpus text. Everything downstream (df, dl, idf,
  * relative frequencies, the scoring join itself) derives from small
  * SUFFICIENT STATISTICS of that pass:
  *
  *   - BM25: the (doc_id, word, tf) term-frequency table
  *     ([[Retrieval.termFrequencies]]);
  *   - unigram LM: the (word, cnt) corpus counts behind
  *     [[Curation.referenceRel]].
  *
  * Both are compute-once artifacts: build them from the reference
  * corpus once, persist as parquet, and every later scoring run —
  * batch or streaming — reads the artifact instead of re-tokenizing
  * the corpus. Both are also ADDITIVE, which makes the incremental
  * path a plain append:
  *
  *   - LM counts: word counts of a delta batch simply append; the
  *     loader merges with one word-keyed aggregate, so double-counting
  *     is impossible to express (the merge IS the semantics).
  *   - BM25 tf: rows are per (doc, word); a delta of NEW documents
  *     appends disjoint rows. Contract: a delta batch must carry doc
  *     ids not already indexed (re-indexing a doc means rebuilding —
  *     same single-writer discipline as
  *     [[graft.streaming.ProcessedLedger]]). The loader folds
  *     duplicates with MAX per (doc_id, word) — a true count appears
  *     once, so max is the identity there, and a whole RETRIED delta
  *     append (the one redelivery shape parquet append cannot prevent)
  *     lands as exact-duplicate rows that max folds away. LM count
  *     appends have no such idempotent fold (counts legitimately
  *     repeat across deltas), so their retry safety comes from the
  *     upstream ledgered writer.
  *
  * Corpus-level scalars (N docs, total length, the LM total) are NOT
  * persisted: they are one tiny aggregate over the artifact and
  * freezing them would silently mis-weight every delta-updated index.
  */
object Artifacts {

  // ------------------------------------------------------------------
  // BM25 index: the (doc_id, word, tf) table
  // ------------------------------------------------------------------

  /** Build and persist the BM25 index for `corpus` at `path`. */
  def saveBm25Index(corpus: DataFrame, idCol: String, textCol: String, path: String): Unit =
    Retrieval.termFrequencies(corpus, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/tf")

  /** Incrementally index a delta batch of NEW documents (see the
    * contract above): one tokenize pass over the delta only, appended
    * to the artifact — never a corpus rebuild.
    */
  def appendBm25Delta(delta: DataFrame, idCol: String, textCol: String, path: String): Unit =
    Retrieval.termFrequencies(delta, idCol, textCol)
      .write.mode("append").parquet(s"$path/tf")

  /** The persisted tf table. Duplicates fold with MAX per (doc_id,
    * word): identity on true counts (each pair is written once), and a
    * retried delta append — exact-duplicate rows — folds away instead
    * of double-counting (sum would not be idempotent).
    */
  def loadBm25Tf(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/tf")
      .groupBy("doc_id", "word").agg(max("tf").as("tf"))

  /** Top-k BM25 retrieval fed from the artifact — identical output to
    * [[Retrieval.bm25TopK]] over the same (base + delta) corpus, which
    * the q_bm25_artifact oracle proves cross-engine.
    */
  def bm25TopKFromIndex(spark: SparkSession, path: String,
                        probes: DataFrame, probeIdCol: String, probeTextCol: String,
                        k: Int,
                        maxDf: Option[Long] = Some(Retrieval.DefaultMaxTermDf)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("probe_id")).orderBy(col("score_u").desc, col("doc_id"))
    Retrieval.bm25PairsFromTf(loadBm25Tf(spark, path), probes, probeIdCol, probeTextCol, maxDf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  // ------------------------------------------------------------------
  // Unigram-LM reference: the (word, cnt) counts
  // ------------------------------------------------------------------

  /** Build and persist the LM word counts for a reference corpus. */
  def saveLmCounts(docs: DataFrame, textCol: String, path: String): Unit =
    lmCounts(docs, textCol).write.mode("overwrite").parquet(s"$path/counts")

  /** Fold a delta batch into the artifact: counts are additive, so the
    * delta's own counts append and the loader's word-keyed aggregate
    * does the merge. Retry-UNSAFE on its own (a torn append retried
    * lands the same counts twice and sum cannot tell) — streaming
    * callers use [[writeLmCountsBatch]], whose per-batch overwrite
    * closes exactly that window.
    */
  def appendLmCounts(delta: DataFrame, textCol: String, path: String): Unit =
    lmCounts(delta, textCol).write.mode("append").parquet(s"$path/counts")

  /** The crash-safe delta write for streams: each batch's counts land
    * under `counts/batch_id=<id>` with OVERWRITE, so a retry of the
    * same batch replaces its own directory instead of double-counting
    * — the identical idempotency shape as
    * [[graft.streaming.ProcessedLedger.startLedgeredFileSink]]'s
    * effects. The loader's partition-discovery read + word-keyed
    * merge needs no change.
    */
  def writeLmCountsBatch(delta: DataFrame, textCol: String, path: String, batchId: Long): Unit =
    lmCounts(delta, textCol)
      .write.mode("overwrite").parquet(s"$path/counts/batch_id=$batchId")

  private def lmCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.Hashing.words(col(textCol))).as("_word"))
      .filter(length(col("_word")) > 0)
      .groupBy("_word").agg(count(lit(1)).as("_cnt"))

  /** The merged reference frequency table `(_word, _rel_ppb)` — same
    * arithmetic as [[Curation.referenceRel]] (sum-identical counts →
    * bit-identical ppb), ready for [[Curation.scoreWithReference]].
    */
  def loadLmRel(spark: SparkSession, path: String): DataFrame = {
    // recursive lookup: base saves write files at counts/ root, stream
    // deltas live in counts/batch_id=N/ subdirs — read every file,
    // no partition inference needed (the merge is by _word anyway)
    val counts = spark.read.option("recursiveFileLookup", "true").parquet(s"$path/counts")
      .groupBy("_word").agg(sum("_cnt").as("_cnt"))
    val tot = counts.agg(sum("_cnt").as("_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("_word"),
        round(col("_cnt") * lit(Curation.Ppb.toDouble) / col("_tot")).cast("long").as("_rel_ppb"))
  }

  // ------------------------------------------------------------------
  // Centroid classifier: the (class, word, cnt) counts
  // ------------------------------------------------------------------

  /** Build and persist the classifier's sufficient statistics: per-
    * (class, word) token counts. Class totals are NOT persisted — they
    * are one aggregate over the artifact, and freezing them would
    * mis-normalize every delta-updated centroid (the same argument as
    * the BM25/LM scalars above). Counts are additive per (class,
    * word), so new labeled data folds in by append + merge, identical
    * to the LM path.
    */
  def saveCentroidCounts(docs: DataFrame, labelCol: String, textCol: String,
                         path: String): Unit =
    centroidCounts(docs, labelCol, textCol).write.mode("overwrite").parquet(s"$path/ccounts")

  /** Fold a delta batch of newly labeled documents into the artifact
    * (additive counts — retry safety comes from the upstream ledgered
    * writer, as for [[appendLmCounts]]).
    */
  def appendCentroidCounts(delta: DataFrame, labelCol: String, textCol: String,
                           path: String): Unit =
    centroidCounts(delta, labelCol, textCol).write.mode("append").parquet(s"$path/ccounts")

  private def centroidCounts(docs: DataFrame, labelCol: String, textCol: String): DataFrame =
    Classify.classCounts(docs, labelCol, textCol)

  // ------------------------------------------------------------------
  // Span-scrub rewrite: the (chunk, owner doc, owner pos) table
  // ------------------------------------------------------------------

  /** Persist the rewrite family's sufficient statistics: the first-
    * owner table of [[Rewrite.chunkOwners]]. Deltas append their OWN
    * part-owners; the loader's re-min is the merge (min is
    * associative per dimension applied hierarchically — see
    * [[Rewrite.chunkOwners]]), so a retried append (duplicate rows)
    * folds away and incremental indexing never re-chunks the corpus.
    * Contract: a document's chunks are indexed by exactly ONE
    * save/append (doc-granular deltas — the BM25 new-docs-only
    * contract); a doc split across parts could otherwise surface a
    * part-local position as its winning og.
    */
  def saveChunkOwners(docs: DataFrame, idCol: String, textCol: String, k: Int,
                      path: String): Unit =
    Rewrite.chunkOwners(docs, idCol, textCol, k)
      .write.mode("overwrite").parquet(s"$path/owners")

  /** Fold a delta batch's chunk owners into the artifact. */
  def appendChunkOwnersDelta(delta: DataFrame, idCol: String, textCol: String, k: Int,
                             path: String): Unit =
    Rewrite.chunkOwners(delta, idCol, textCol, k)
      .write.mode("append").parquet(s"$path/owners")

  /** The merged owner table, ready for [[Rewrite.scrubWithOwners]]. */
  def loadChunkOwners(spark: SparkSession, path: String): DataFrame =
    Rewrite.mergeOwners(
      spark.read.option("recursiveFileLookup", "true").parquet(s"$path/owners"))

  /** The merged centroid table `(_cls, _word, _rel_ppb)` — identical
    * arithmetic to [[Classify.classCentroids]] over the base + delta
    * corpus BY CONSTRUCTION: counts merge sum-identical, then the same
    * [[Classify.centroidsFromCounts]] normalizes both paths.
    */
  def loadCentroids(spark: SparkSession, path: String): DataFrame =
    Classify.centroidsFromCounts(
      spark.read.option("recursiveFileLookup", "true").parquet(s"$path/ccounts")
        .groupBy("_cls", "_word").agg(sum("_cnt").as("_cnt")))

  /** The BPE merge table IS the tokenizer model — rank-ordered rules,
    * a few KB at any corpus scale. Persist once after training; every
    * segmentation job ([[Bpe.segmentExpr]]) loads it as literals into
    * one codegen'd projection. NOT additive: merges are a totally
    * ordered program, so an updated corpus retrains (cheap — the
    * corpus-sized pass is the word count, which could itself be
    * persisted via the LM-counts artifact if needed).
    */
  def saveBpeMerges(merges: Seq[Bpe.Merge], spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    merges.toDF("step", "lhs", "rhs", "pair_cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
  }

  def loadBpeMerges(spark: SparkSession, path: String): Seq[Bpe.Merge] =
    spark.read.parquet(s"$path/merges")
      .orderBy("step").collect()
      .map(r => Bpe.Merge(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  /** The unigram-LM piece table is the model, same contract as the
    * BPE merges: a ≤vocab-size row set of (piece, freq, cost) —
    * kilobytes — persisted once after EM, loaded as literals into the
    * codegen'd Viterbi projection ([[Unigram.segmentExpr]]). NOT
    * additive: costs renormalize over the whole vocabulary, so an
    * updated corpus retrains.
    */
  def saveUnigramModel(model: Seq[Unigram.Piece], spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    model.toDF("piece", "freq", "cost")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pieces")
  }

  def loadUnigramModel(spark: SparkSession, path: String): Seq[Unigram.Piece] =
    spark.read.parquet(s"$path/pieces")
      // deterministic order is part of the contract: segmentExpr bakes
      // the pieces into a literal map, but spec/debug dumps compare Seqs
      .orderBy("piece").collect()
      .map(r => Unigram.Piece(r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq

  /** PageRank domain ranks `(node, out_deg, rank_ppm)`: the shingle-
    * overlap graph + iteration chain is THE expensive pass (a full
    * corpus tokenize plus 10 join rounds), while the output is one row
    * per SOURCE — kilobytes at any corpus scale, broadcastable into
    * every downstream sampling/weighting join. Compute once per corpus
    * snapshot, persist, and every consumer pays join cost only. NOT
    * additive (a new edge perturbs every rank), so an updated corpus
    * recomputes — the same retrain-on-update contract as BPE merges.
    */
  def savePageRank(ranks: DataFrame, path: String): Unit =
    ranks.coalesce(1).write.mode("overwrite").parquet(s"$path/ranks")

  def loadPageRank(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/ranks")

  /** Probe weights: the (Dim+1)-row linear model. Persisted between
    * training phases — [[Probe.train]]'s `init` resumes GD from the
    * loaded table, the incremental path when new labeled data arrives.
    */
  def saveProbeWeights(weights: DataFrame, path: String): Unit =
    weights.coalesce(1).write.mode("overwrite").parquet(s"$path/weights")

  def loadProbeWeights(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/weights")
}
