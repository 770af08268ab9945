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
  *     shared by thousands of docs) explodes quadratically, so a
  *     document-frequency cap (`maxShingleDf`, on by default) drops
  *     stop-shingles before the quadratic step — the standard
  *     suffix-array-free near-dup recipe (e.g. the "MinHashLSH +
  *     verification" pipeline of Lee et al., "Deduplicating Training Data
  *     Makes Language Models Better", 2022). Sizes and intersections are
  *     both computed over the SAME pruned shingle universe so the Jaccard
  *     ratio stays internally consistent.
  *   - MinHash LSH: fixed-width signature per doc (MinhashK mins), banded
  *     into NumBands buckets; candidates = docs sharing a band bucket.
  *     The signature is ONE explode + ONE hash-aggregate (each
  *     permutation is a plain `min` over the same reduced shingle hash),
  *     so the shingle md5 is evaluated once per (doc, shingle) — never
  *     once per permutation. Candidate pairs are exact-verified against
  *     shingle sets restricted to candidate docs only: the quadratic
  *     shingle self-join runs over the (tiny) candidate subset, never the
  *     full corpus, which is the entire point of LSH at 100 TB.
  *   - SimHash: 48-bit fingerprint; candidate pairs via 6×8-bit chunk
  *     banding (pigeonhole: hamming <= 5 implies one equal chunk, so the
  *     banding loses nothing vs brute force).
  */
object Dedup {
  import Hashing._

  /** Default stop-shingle document-frequency cap for the quadratic
    * n-gram path. A shingle shared by k docs yields O(k²) pairs; 128
    * bounds the worst single-shingle contribution at ~8k pairs while
    * leaving genuinely rare (discriminative) shingles untouched.
    */
  val DefaultMaxShingleDf = 128

  /** Exact dedup: one row per distinct text, with group size and the
    * canonical (minimum) doc id. `idCol`/`textCol` name the input columns.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  /** Distinct (doc, shingle) pairs. The words array is projected first
    * (HOF lambdas re-evaluate inline subtrees per element) and the
    * explode happens before any per-shingle hashing so downstream
    * hashing runs codegen'd per row, not interpreted inside a lambda.
    */
  def docShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("_w"))
      .select(col("doc_id"), explode(shinglesFromWords(col("_w"), n)).as("shingle"))

  /** (doc, shingle-hash) pairs: each distinct shingle reduced to its
    * 60-bit stable hash mod P. All set arithmetic downstream (df caps,
    * sizes, intersections) runs on the 8-byte hash instead of the
    * ~n-word string — a much smaller shuffle and a cheaper join key.
    * The oracle applies the identical hash, so even the (cosmically
    * rare) collision is computed identically on both sides.
    */
  def docShingleHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docShingles(docs, idCol, textCol, n)
      .select(col("doc_id"), pmod(stableHash60(col("shingle")), lit(P)).as("sh_h"))

  /** Pairwise Jaccard over a (doc_id, sh_h) table: self-join on the
    * shingle hash → intersection counts → inter/(n_a+n_b-inter). Sizes
    * come from the SAME table as intersections, so a caller that
    * pre-prunes shingles gets a consistent pruned-universe Jaccard.
    */
  private def jaccardPairs(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    sh.as("a").join(sh.as("b"),
        col("a.sh_h") === col("b.sh_h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
  }

  /** Drop shingle hashes whose document frequency exceeds `cap`.
    * A count-over-window partitioned by the shingle hash: one exchange
    * on sh_h that the downstream pair self-join (also keyed on sh_h)
    * reuses, instead of a groupBy+join that re-evaluates the shingle
    * pipeline for the frequency table.
    */
  private def pruneStopShingles(sh: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sh.withColumn("_df", count(lit(1)).over(Window.partitionBy("sh_h")))
      .filter(col("_df") <= cap)
      .drop("_df")
  }

  /** Exact n-gram Jaccard pairs >= threshold (doc_a < doc_b).
    * Shingle-keyed self-join; the document-frequency cap (on by default)
    * drops stop-shingles before the quadratic step, and both sizes and
    * intersections are computed over the pruned universe.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame = {
    val sh = docShingleHashes(docs, idCol, textCol, n)
    val pruned = maxShingleDf.fold(sh)(pruneStopShingles(sh, _))
    jaccardPairs(pruned)
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Cross-source n-gram overlap matrix: pairwise Jaccard between the
    * distinct shingle sets of whole SOURCES (domains) — which corners
    * of a crawl mirror each other (syndication networks, scraped
    * mirrors, shared boilerplate farms), the corpus-level view the
    * per-document sweeps can't see. Aggregating to source level first
    * collapses the join's left side to one row per distinct
    * (source, shingle) — at 100 TB that's bounded by
    * sources × per-source vocabulary, not by document count — and the
    * shingle's cross-source df is bounded by the source count, so the
    * self-join fans out at most sources² per shingle even uncapped.
    * `maxSourceDf` additionally drops shingles present in more than
    * that many sources (universal boilerplate) before the quadratic
    * step.
    *
    * Output: src_a < src_b, inter, n_a, n_b, jaccard.
    */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String, n: Int,
                    maxSourceDf: Option[Int] = None): DataFrame = {
    val sh = docShingleHashes(docs, srcCol, textCol, n).distinct()
    val pruned = maxSourceDf.fold(sh)(pruneStopShingles(sh, _))
    jaccardPairs(pruned)
      .select(col("doc_a").as("src_a"), col("doc_b").as("src_b"),
        col("inter"), col("n_a"), col("n_b"), col("jaccard"))
  }

  /** MinHash estimate of [[sourceOverlap]], with the exact Jaccard and
    * the estimation error side by side — the index-tuning eval for
    * sketch-based overlap (the q_ann_recall of dedup): at 100 TB you
    * ship the K-long signature per source (constant bytes, mergeable
    * via element-wise min) instead of the full shingle sets, and this
    * query is how you validate that trade on a sample. Signature
    * agreement is an unbiased Jaccard estimator (P[min-hash collision]
    * = J); est and err are exact-int and correctly-rounded-double
    * arithmetic, so they hash-gate.
    *
    * Pairs come from the exact overlap join (shingle-keyed), so the
    * plan adds only two source-keyed equi-joins against the k-row
    * signature table — no source×source nested loop.
    *
    * Output: src_a, src_b, jaccard (exact), sig_matches (0..K),
    * est, err.
    */
  def sourceOverlapEstimate(docs: DataFrame, srcCol: String, textCol: String,
                            n: Int): DataFrame = {
    val sh = docShingleHashes(docs, srcCol, textCol, n).distinct()
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("sh_h") * a + b, lit(P))).as(s"m$i")
    }
    val sigs = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val matches = (0 until MinhashK).map(i =>
      when(col(s"a.m$i") === col(s"b.m$i"), 1L).otherwise(0L)).reduce(_ + _)
    jaccardPairs(sh)
      .select(col("doc_a").as("src_a"), col("doc_b").as("src_b"), col("jaccard"))
      .join(sigs.as("a"), col("src_a") === col("a.doc_id"))
      .join(sigs.as("b"), col("src_b") === col("b.doc_id"))
      .select(col("src_a"), col("src_b"), col("jaccard"),
        matches.as("sig_matches"))
      .withColumn("est", col("sig_matches") / MinhashK)
      .withColumn("err", abs(col("est") - col("jaccard")))
  }

  /** Asymmetric n-gram CONTAINMENT pairs: `cont(A→B) = |A∩B| / |A|`
    * over distinct-shingle sets — Broder's containment next to
    * resemblance (Jaccard). The signal symmetric dedup misses: a short
    * doc pasted whole into a long one has containment ≈ 1 while its
    * Jaccard ≈ |A|/|B| sits below any dedup threshold, so quote/
    * subset-shaped duplication survives a Jaccard sweep. Emits both
    * directions per unordered pair (doc_a < doc_b) and keeps pairs
    * whose LARGER containment clears `threshold`.
    *
    * Same plan as [[ngramJaccardPairs]] (one shingle-keyed self-join,
    * stop-shingle df cap on by default, sizes and intersections over
    * the same pruned universe) — only the final arithmetic differs:
    * `inter/n_a` and `inter/n_b`, each a single exact-int double
    * division, so the scores hash-gate.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, threshold: Double,
                       maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame = {
    val sh = docShingleHashes(docs, idCol, textCol, n)
    val pruned = maxShingleDf.fold(sh)(pruneStopShingles(sh, _))
    val sizes = pruned.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    pruned.as("a").join(pruned.as("b"),
        col("a.sh_h") === col("b.sh_h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("cont_a_in_b", col("inter") / col("n_a"))
      .withColumn("cont_b_in_a", col("inter") / col("n_b"))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "cont_a_in_b", "cont_b_in_a")
  }

  /** Per-doc novelty profile: the fraction of a doc's distinct
    * n-grams whose FIRST occurrence (by doc id order) is this doc —
    * the corpus novelty curve. Late documents full of already-seen
    * grams are boilerplate/duplication candidates even when no single
    * pair crosses a dedup threshold; a data-curation loop watches this
    * ratio decay as a crawl saturates. One gram-keyed aggregate
    * (min doc_id = first owner), one join back, one per-doc count —
    * never pairwise.
    */
  def noveltyProfile(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = docShingleHashes(docs, idCol, textCol, n)
    val first = sh.groupBy("sh_h").agg(min("doc_id").as("first_doc"))
    sh.join(first, Seq("sh_h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", col("n_novel") / col("n_grams"))
  }

  /** Incremental near-dup: a NEW delta checked against a FROZEN corpus
    * — the production dedup loop (dedup each crawl/day against
    * everything already kept without ever re-pairing the corpus with
    * itself). Returns (new_id, old_id, inter, n_new, n_old, jaccard ≥
    * threshold) pairs. The stop-gram rule prunes by the OLD side's
    * document frequency (the frozen corpus owns the statistics — a
    * delta is too small to define "stop"), and the pruned universe is
    * applied to BOTH sides' sizes: old grams via the keep-set, new
    * grams by dropping only grams the old side declared stop (novel
    * grams stay — they are the diff). Join is keyed by the gram hash:
    * |delta|-proportional, never corpus-quadratic.
    */
  def incrementalNearDups(newDocs: DataFrame, oldDocs: DataFrame,
                          idCol: String, textCol: String, n: Int, threshold: Double,
                          maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame = {
    val oldSh0 = docShingleHashes(oldDocs, idCol, textCol, n)
      .withColumnRenamed("doc_id", "old_id")
    val newSh0 = docShingleHashes(newDocs, idCol, textCol, n)
      .withColumnRenamed("doc_id", "new_id")
    val (oldSh, newSh) = maxShingleDf match {
      case Some(cap) =>
        val stop = oldSh0.groupBy("sh_h").agg(count(lit(1)).as("_df"))
          .filter(col("_df") > cap).select("sh_h")
        (oldSh0.join(stop, Seq("sh_h"), "left_anti"),
          newSh0.join(stop, Seq("sh_h"), "left_anti"))
      case None => (oldSh0, newSh0)
    }
    val nNew = newSh.groupBy("new_id").agg(count(lit(1)).as("n_new"))
    val nOld = oldSh.groupBy("old_id").agg(count(lit(1)).as("n_old"))
    newSh.join(oldSh, Seq("sh_h"))
      .groupBy("new_id", "old_id").agg(count(lit(1)).as("inter"))
      .join(nNew, "new_id").join(nOld, "old_id")
      .withColumn("jaccard", col("inter") / (col("n_new") + col("n_old") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "old_id", "inter", "n_new", "n_old", "jaccard")
  }

  /** Dedup yield report: what keep-lowest-id-per-cluster would save,
    * sliced by cluster size. `clusters` is [[duplicateClusters]] output
    * (doc_id, component_id — the label is the component's min id, so
    * the representative is the doc whose id EQUALS its label). Per
    * cluster size: cluster count, duplicates dropped (size − 1 each),
    * and the bytes those duplicates hold — the number a curation run
    * reports before committing a dedup pass. Two hash aggregates over
    * the cluster table; integer outputs, engine-portable.
    */
  def yieldReport(docs: DataFrame, idCol: String, textCol: String,
                  clusters: DataFrame): DataFrame = {
    val perCluster = docs
      .select(col(idCol).as("doc_id"), length(col(textCol)).cast("long").as("_len"))
      .join(clusters, Seq("doc_id"))
      .groupBy("component_id")
      .agg(count(lit(1)).as("size"),
        sum(when(col("doc_id") =!= col("component_id"), col("_len")).otherwise(0L))
          .as("_dup_bytes"))
    perCluster.groupBy("size")
      .agg(count(lit(1)).as("n_clusters"),
        (sum(col("size")) - count(lit(1))).as("dup_docs"),
        sum(col("_dup_bytes")).as("dup_bytes"))
  }

  /** Per-doc MinHash signature as MinhashK wide columns m0..m{K-1}.
    * One explode + one hash-aggregate; docs shorter than n words produce
    * no shingles and drop out (same as the reference treating an empty
    * pool as no-match).
    */
  def withMinhashSignature(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val hashed = docShingleHashes(docs, idCol, textCol, n)
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("sh_h") * a + b, lit(P))).as(s"m$i")
    }
    hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs alone (banded signature collisions, BEFORE
    * any exact verification) — the raw output whose quality
    * [[lshRecallReportAt]] measures and [[minhashLshPairs]] verifies.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            n: Int): DataFrame = {
    val sigs = withMinhashSignature(docs, idCol, textCol, n)
    val bands = sigs.select(col("doc_id"), posexplode(
      array((0 until NumBands).map { b =>
        concat_ws("_", (0 until BandRows).map(r => col(s"m${b * BandRows + r}")): _*)
      }: _*)).as(Seq("band_idx", "band_key")))
    bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH candidate pairs, exact-verified at `threshold` against
    * the candidate docs' shingle sets only (never the full corpus).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double): DataFrame = {
    val cand = minhashCandidatePairs(docs, idCol, textCol, n)
    // Exact verification restricted to candidates: semi-join the shingle
    // table down to docs that appear in some candidate pair, run the
    // quadratic step on that subset, keep candidate pairs only.
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val candSh = docShingleHashes(docs, idCol, textCol, n)
      .join(candDocs, Seq("doc_id"), "left_semi")
    jaccardPairs(candSh)
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Candidate quality of the MinHash-LSH rung at several operating
    * points, in ONE exact sweep: the expensive uncapped Jaccard pass
    * runs once at the loosest threshold, each operating point is then
    * a conditional count over that single pair set (never one
    * ground-truth sweep per point). Thresholds are integer basis
    * points so the cut is engine-exact. A zero denominator reports 0,
    * never NULL — a broken band geometry (zero candidates) must read
    * as recall 0, and DuckDB's `//` would raise where Spark nulls.
    * Output: one row per threshold_bp.
    */
  def lshRecallReportAt(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, thresholdsBp: Seq[Int]): DataFrame = {
    require(thresholdsBp.nonEmpty, "lshRecallReportAt needs at least one threshold")
    require(thresholdsBp.distinct.size == thresholdsBp.size,
      s"duplicate thresholds: $thresholdsBp")
    val loosest = thresholdsBp.min / 10000.0
    val gt = ngramJaccardPairs(docs, idCol, textCol, n, loosest, maxShingleDf = None)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val cand = minhashCandidatePairs(docs, idCol, textCol, n)
    // one left join tags each true pair candidate-covered; candidate
    // rows union in with a null jaccard so n_cand folds in the SAME
    // single aggregate (no 1-row cross join, no per-threshold re-run)
    val rows = gt.join(cand.withColumn("_c", lit(true)), Seq("doc_a", "doc_b"), "left")
      .select(col("jaccard"), coalesce(col("_c"), lit(false)).as("_c"),
        lit(false).as("_isCand"))
      .unionByName(cand.select(lit(null).cast("double").as("jaccard"),
        lit(false).as("_c"), lit(true).as("_isCand")))
    val aggCols = count(when(col("_isCand"), 1)).as("n_cand") +:
      thresholdsBp.flatMap { bp =>
        val in = col("jaccard") >= bp / 10000.0
        Seq(count(when(in, 1)).as(s"_t$bp"), count(when(in && col("_c"), 1)).as(s"_h$bp"))
      }
    rows.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(thresholdsBp.map { bp =>
        struct(lit(bp.toLong).as("threshold_bp"), col(s"_t$bp").as("n_truth"),
          col("n_cand"), col(s"_h$bp").as("n_hit"))
      }: _*)).as("_r"))
      .select(col("_r.threshold_bp").as("threshold_bp"), col("_r.n_truth").as("n_truth"),
        col("_r.n_cand").as("n_cand"), col("_r.n_hit").as("n_hit"))
      .select(col("threshold_bp"), col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") > 0, expr("n_hit * 1000000000 div n_truth"))
          .otherwise(0L).as("recall_ppb"),
        when(col("n_cand") > 0, expr("n_hit * 1000000000 div n_cand"))
          .otherwise(0L).as("precision_ppb"))
  }

  /** Train/test decontamination sweep (the n-gram overlap check run
    * before training — Brown et al. 2020 App. C removes training docs
    * sharing 13-grams with benchmark data): for every (corpus doc,
    * probe doc) pair sharing at least one word n-gram, the count of
    * shared distinct n-grams. Emitting the pair+count (not just a flag)
    * lets callers pick their own contamination threshold.
    *
    * Scale shape: both sides reduce to (id, shingle-hash) and equi-join
    * on the 8-byte hash — the shuffle is keyed by shingle, never a
    * cross product; the df cap (on by default, corpus side) removes
    * stop-shingles whose fan-out would dominate the join. Probe sets
    * (benchmarks) are tiny in practice, so the probe side broadcasts
    * under AQE.
    */
  def contaminationPairs(docs: DataFrame, idCol: String, textCol: String,
                         probes: DataFrame, probeIdCol: String, probeTextCol: String,
                         n: Int,
                         maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame = {
    val ds = docShingleHashes(docs, idCol, textCol, n)
    val pruned = maxShingleDf.fold(ds)(pruneStopShingles(ds, _))
    val ps = docShingleHashes(probes, probeIdCol, probeTextCol, n)
      .withColumnRenamed("doc_id", "probe_id")
    pruned.join(ps, Seq("sh_h"))
      .groupBy("doc_id", "probe_id").agg(count(lit(1)).as("n_shared"))
  }

  /** Span-level contamination: for each (corpus doc, probe) pair, the
    * LONGEST RUN of consecutive corpus positions whose n-gram also
    * appears in the probe — the cheap distributed stand-in for the
    * suffix-array "longest shared substring" pass of training-data
    * dedup: a high shared-gram COUNT ([[contaminationPairs]]) can be
    * scattered single grams, but a long consecutive run is a copied
    * PASSAGE. `span_words = max_run + n − 1` converts the gram run back
    * to words.
    *
    * Shape: corpus n-grams WITH positions (one generator pass), doc-
    * frequency cap on the gram hash (same semantics as the pair
    * operator — stop-grams die before the join), hash-join against the
    * probes' distinct gram hashes, then gaps-and-islands per
    * (doc, probe): `pos − row_number()` is constant exactly on a
    * consecutive run, so two keyed aggregates finish the job. Every
    * window is partitioned by (doc, probe) — never a global sort — and
    * all arithmetic is integer, so the DuckDB oracle gates it exactly.
    */
  def contaminationSpans(docs: DataFrame, idCol: String, textCol: String,
                         probes: DataFrame, probeIdCol: String, probeTextCol: String,
                         n: Int,
                         maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("w"))
      .select(col("doc_id"), posexplode(ngramsFromWords(col("w"), n)))
      .select(col("doc_id"), col("pos"), pmod(stableHash60(col("col")), lit(P)).as("sh_h"))
    val kept = maxShingleDf.fold(grams) { cap =>
      val keepH = grams.select("doc_id", "sh_h").distinct()
        .groupBy("sh_h").agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= cap).select("sh_h")
      grams.join(keepH, Seq("sh_h"))
    }
    val ps = docShingleHashes(probes, probeIdCol, probeTextCol, n)
      .withColumnRenamed("doc_id", "probe_id")
    val matched = kept.join(ps, Seq("sh_h"))
      .select("doc_id", "probe_id", "pos").distinct()
    val wnd = Window.partitionBy("doc_id", "probe_id").orderBy("pos")
    matched
      .withColumn("_island", col("pos") - row_number().over(wnd))
      .groupBy("doc_id", "probe_id", "_island").agg(count(lit(1)).as("_run"))
      .groupBy("doc_id", "probe_id")
      .agg(sum("_run").as("n_shared_pos"), max("_run").as("max_run"))
      .withColumn("span_words", col("max_run") + lit(n - 1))
  }

  /** Corpus-internal repeated spans: for each doc, the maximal runs of
    * consecutive positions whose n-gram occurs in at least `minDf`
    * distinct documents. At `minDf = 2` this is C4's span rule (Raffel
    * et al. 2020 strip any passage occurring more than once in the
    * corpus); at high `minDf` it is template-boilerplate detection
    * (headers/footers/navigation chrome) — the mirror image of the
    * dedup family's stop-gram rule: the high-df grams pair-finding
    * PRUNES as noise are exactly the spans a cleaning pass CUTS. One
    * row per (doc, island): the start position and width in words —
    * the spans to strip before tokenization.
    *
    * Same shape as [[contaminationSpans]] minus the probe dimension:
    * positioned grams in one generator pass, df over distinct
    * (doc, gram), islands via the pos − row_number constant, windows
    * partitioned per doc — never global. All-integer arithmetic.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int, minDf: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("w"))
      .select(col("doc_id"), posexplode(ngramsFromWords(col("w"), n)))
      .select(col("doc_id"), col("pos"), pmod(stableHash60(col("col")), lit(P)).as("sh_h"))
    val hot = grams.select("doc_id", "sh_h").distinct()
      .groupBy("sh_h").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDf).select("sh_h")
    // one gram per position and one `hot` row per hash → (doc, pos) is
    // already unique after the join; no dedup shuffle needed
    val wnd = Window.partitionBy("doc_id").orderBy("pos")
    grams.join(hot, Seq("sh_h"))
      .select("doc_id", "pos")
      .withColumn("_island", col("pos") - row_number().over(wnd))
      .groupBy("doc_id", "_island")
      .agg(min(col("pos")).cast("long").as("start_pos"), count(lit(1)).as("_run"))
      .select(col("doc_id"), col("start_pos"),
        (col("_run") + lit(n - 1)).as("span_words"))
  }

  /** Duplicate clustering: connected components over a near-dup pair
    * relation (doc_a < doc_b), labeled by the MINIMUM doc id of each
    * component — every doc in `docs` appears, singletons labeling
    * themselves. This is the step a real dedup pipeline runs after
    * pair finding: keep one canonical doc per cluster.
    *
    * Alternating large-star / small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): each
    * round, large-star links every node's LARGER neighbors to the
    * minimum of its closed neighborhood, then small-star does the same
    * for the smaller neighbors. Rounds to converge are O(log n) in the
    * component size — independent of DIAMETER — so a chain-shaped
    * component (boilerplate docs that each near-dup their neighbors)
    * converges in a handful of rounds where plain min-label
    * propagation needs one round per hop and would blow any sane
    * iteration budget at 100 TB. The fixed point is a union of stars
    * centered at each component's minimum, which is exactly the output
    * labeling. Each round localCheckpoints (iterative plans MUST cut
    * lineage or the DAG grows exponentially); the driver loop carries
    * only counts, never data. Non-convergence still throws loudly:
    * partial labels are WRONG labels.
    */
  def duplicateClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                        maxIter: Int = 20): DataFrame = {
    // canonical u < v edge set; self-pairs contribute nothing
    var edges = pairs
      .select(least(col("doc_a"), col("doc_b")).as("u"),
        greatest(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIter) {
      // large-star: for node a with closed-neighborhood min m, connect
      // every neighbor b > a to m (m <= a < b, so (m, b) is canonical)
      val bi = edges.select(col("u").as("a"), col("v").as("b"))
        .union(edges.select(col("v").as("a"), col("u").as("b")))
      val mins = bi.groupBy("a").agg(min(col("b")).as("nbr_min"))
        .select(col("a"), least(col("a"), col("nbr_min")).as("m"))
      val afterLarge = bi.join(mins, Seq("a"))
        .filter(col("b") > col("a"))
        .select(col("m").as("u"), col("b").as("v"))
        .distinct()
        .localCheckpoint(true)
      // small-star: key each edge by its larger endpoint a (so every
      // neighbor b < a); m = min neighbor; connect the other small
      // neighbors AND a itself to m
      val keyed = afterLarge.select(col("v").as("a"), col("u").as("b"))
      val smins = keyed.groupBy("a").agg(min(col("b")).as("m"))
      val next = keyed.join(smins, Seq("a"))
        .filter(col("b") =!= col("m"))
        .select(col("m").as("u"), col("b").as("v"))
        .union(smins.select(col("m").as("u"), col("a").as("v")))
        .distinct()
        .localCheckpoint(true)
      // exact convergence in ONE action: both sets are distinct, so a
      // pair counts 2 in the union iff it is in both — any other count
      // is a symmetric-difference member (a hashed proxy could
      // silently mislabel on collision; this cannot)
      converged = next.unionByName(edges)
        .groupBy("u", "v").agg(count(lit(1)).as("_n"))
        .filter(col("_n") =!= 2)
        .isEmpty
      edges = next
      iter += 1
    }
    // Partial labels are WRONG labels: refuse to emit a half-contracted
    // edge set as components.
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters did not converge within maxIter=$maxIter rounds; " +
          "star contraction should converge in O(log n) — raise maxIter")
    // fixed point = stars (component_min, member): label members by
    // their center, everything else by itself
    docs.select(col(idCol).as("doc_id"))
      .join(edges.select(col("v").as("doc_id"), col("u").as("_center")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("_center"), col("doc_id")).as("component_id"))
  }

  /** Per-doc 96-bit simhash as two 48-bit words (`sim_lo`, `sim_hi`)
    * from word unigram votes. One explode + one hash-aggregate; the 96
    * per-bit sums are a single aggregation pass (columnar, codegen'd),
    * and both hash words come from ONE md5 evaluation per (doc, word).
    */
  def withSimhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wordsDf = docs.select(col(idCol).as("doc_id"),
      explode(words(col(textCol))).as("w"))
      .withColumn("h0", stableHash48(col("w"), 0))
      .withColumn("h1", stableHash48(col("w"), 1))
    val aggs = count(lit(1)).as("n") +: (0 until SimhashWordBits).flatMap(b => Seq(
      sum(simBitValue(col("h0"), b)).as(s"a$b"),
      sum(simBitValue(col("h1"), b)).as(s"b$b")))
    wordsDf.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        simhashFromBitSums((0 until SimhashWordBits).map(b => col(s"a$b")), col("n")).as("sim_lo"),
        simhashFromBitSums((0 until SimhashWordBits).map(b => col(s"b$b")), col("n")).as("sim_hi"))
  }

  /** (doc_id, chunk_idx, chunk_val, sim_lo, sim_hi) banding table: the
    * 96-bit fingerprint cut into `chunks` equal-width pieces, half drawn
    * from each word. Factored out of [[simhashPairs]] so bucket-population
    * properties are directly testable.
    */
  def simhashBands(sims: DataFrame, chunks: Int): DataFrame = {
    require(chunks % 2 == 0 && SimhashWordBits % (chunks / 2) == 0,
      s"chunks must be even and divide 2*$SimhashWordBits evenly")
    val perWord = chunks / 2
    val width = SimhashWordBits / perWord
    val mask = (1L << width) - 1
    sims.select(col("doc_id"), col("sim_lo"), col("sim_hi"), posexplode(
      array((0 until chunks).map { c =>
        val word = if (c < perWord) col("sim_lo") else col("sim_hi")
        shiftright(word, (c % perWord) * width).bitwiseAND(mask)
      }: _*)).as(Seq("chunk_idx", "chunk_val")))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming over the
    * 96-bit fingerprint. Candidates via chunk banding: with `chunks`
    * equal-width chunks, hamming <= chunks-1 implies at least one
    * identical chunk (pigeonhole), so banding is lossless for
    * maxHamming <= chunks-1. Default 8 chunks × 12 bits: 4096 bucket
    * values per chunk index, so bucket population stays ~|corpus|/4096 —
    * the knob that keeps the within-bucket quadratic bounded at 100×.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, chunks: Int = 8): DataFrame = {
    require(maxHamming < chunks, "pigeonhole banding needs maxHamming < chunks")
    val banded = simhashBands(withSimhash(docs, idCol, textCol), chunks)
    banded.as("a").join(banded.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sim_lo").as("lo_a"), col("a.sim_hi").as("hi_a"),
        col("b.sim_lo").as("lo_b"), col("b.sim_hi").as("hi_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
