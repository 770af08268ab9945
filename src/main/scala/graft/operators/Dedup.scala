package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data
  * pipelines: exact, MinHash+LSH, SimHash and n-gram-Jaccard.
  *
  * Scale design (the sf tables are tiny; the shapes are not):
  *   - exact: one hash-aggregate on md5(text) — a single shuffle keyed by
  *     digest, no skew (digests are uniform).
  *   - n-gram Jaccard: shingle-explode → self-join on shingle → pair
  *     count. The join key is the shingle; stop-shingle skew (a shingle
  *     shared by thousands of docs) explodes quadratically, so callers
  *     can cap document frequency (`maxShingleDf`) — the standard
  *     suffix-array-free near-dup recipe (e.g. the "MinHashLSH +
  *     verification" pipeline of Lee et al., "Deduplicating Training Data
  *     Makes Language Models Better", 2022).
  *   - MinHash LSH: fixed-width signature per doc (MinhashK mins), banded
  *     into NumBands buckets; candidates = docs sharing a band bucket.
  *     Cost per doc is O(shingles × K) map-side; the only shuffle is the
  *     band-bucket self-join whose buckets are tiny by construction.
  *     Candidates are exact-verified so LSH tuning affects recall only.
  *   - SimHash: 48-bit fingerprint; candidate pairs via 6×8-bit chunk
  *     banding (pigeonhole: hamming <= 5 implies one equal chunk, so the
  *     banding loses nothing vs brute force).
  */
object Dedup {
  import Hashing._

  /** Exact dedup: one row per distinct text, with group size and the
    * canonical (minimum) doc id. `idCol`/`textCol` name the input columns.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  /** Distinct (doc, shingle) pairs. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(shingles(col(textCol), n)).as("shingle"))

  /** Exact n-gram Jaccard pairs >= threshold (doc_a < doc_b).
    * Shingle-keyed self-join; optional document-frequency cap drops
    * stop-shingles before the quadratic step.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = docShingles(docs, idCol, textCol, n).cache()
    val pruned = maxShingleDf match {
      case Some(cap) =>
        val keep = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("shingle")
        sh.join(keep, Seq("shingle"))
      case None => sh
    }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = pruned.as("a").join(pruned.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Per-doc MinHash signature column (array<long> of MinhashK). */
  def withMinhashSignature(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      minhashSignature(shingleHashes(shingles(col(textCol), n))).as("sig"))

  /** MinHash-LSH candidate pairs, exact-verified at `threshold`.
    * Empty-shingle docs (shorter than n words) produce empty signatures
    * and are excluded — same as the reference treating empty pools as
    * no-match.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double): DataFrame = {
    val sigs = withMinhashSignature(docs, idCol, textCol, n)
      .filter(size(col("sig")) === MinhashK && !array_contains(transform(col("sig"), x => x.isNull), true))
    val bands = sigs.select(col("doc_id"), posexplode(
      array((0 until NumBands).map { b =>
        concat_ws("_", (0 until BandRows).map(r => element_at(col("sig"), b * BandRows + r + 1)): _*)
      }: _*)).as(Seq("band_idx", "band_key")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Exact verification of the candidates only.
    val exact = ngramJaccardPairs(docs, idCol, textCol, n, threshold)
    cand.join(exact, Seq("doc_a", "doc_b"))
  }

  /** Per-doc simhash (long, SimhashBits bits) from word unigram votes.
    * One explode + one hash-aggregate; the 48 per-bit sums are a single
    * aggregation pass (columnar, codegen'd).
    */
  def withSimhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wordsDf = docs.select(col(idCol).as("doc_id"),
      explode(words(col(textCol))).as("w"))
      .withColumn("h", stableHash60(col("w")))
    val votes = (0 until SimhashBits).map(b => sum(simBitContribution(col("h"), b)).as(s"v$b"))
    wordsDf.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), simhashFromVotes((0 until SimhashBits).map(b => col(s"v$b"))).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming.
    * Candidates via chunk banding: with `chunks` equal-width chunks,
    * hamming <= chunks-1 implies at least one identical chunk
    * (pigeonhole), so banding is lossless for maxHamming <= chunks-1.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, chunks: Int = 6): DataFrame = {
    require(maxHamming < chunks, "pigeonhole banding needs maxHamming < chunks")
    val width = SimhashBits / chunks
    val mask = (1L << width) - 1
    val sims = withSimhash(docs, idCol, textCol)
    val banded = sims.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until chunks).map(c =>
        shiftright(col("simhash"), c * width).bitwiseAND(mask)): _*)).as(Seq("chunk_idx", "chunk_val")))
    banded.as("a").join(banded.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
