package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style corpus curation: a unigram-LM quality score, per-language
  * head/middle/tail bucketing, per-domain document caps, and
  * quality-weighted deterministic sampling. Together these are the
  * "rank by model fit, bucket, cap, resample" stage a pretraining
  * pipeline runs between dedup and mixture balancing (the reference's
  * filter/pick stages are row-local; these are the corpus-global
  * analogs).
  *
  * Determinism across engines (the oracle gate hashes values):
  *   - the score is built ONLY from integer counts, correctly-rounded
  *     IEEE double division/rounding, and integer division — no `ln`
  *     (libm-specific last-ulp), mirroring BM25's log-free rational
  *     (see [[Retrieval]]) and the quantized micro-unit convention.
  *   - bucketing compares integer bin ids against integer thresholds.
  *   - sampling is an exact integer cross-multiplication of a stable
  *     md5-derived slot against a min-max-normalized weight — no RNG,
  *     reproducible on any engine and any partitioning ([[Sampling]]).
  */
object Curation {
  /** Fixed-point unit for the score: parts-per-billion. */
  val Ppb = 1000000000L

  /** Histogram bin width for bucket thresholds, in ppb. Bounds the
    * threshold aggregate at <= Ppb/BinWidth ≈ 244k rows per language
    * regardless of corpus size — the same mergeable-grid trick as
    * [[HistogramQuantiles]] — while keeping bins ~250× finer than the
    * observed score spread on the fixture corpus.
    */
  val BinWidth = 4096L

  /** The "trained LM": corpus relative word frequencies in ppb —
    * `(_word, _rel_ppb)`. One explode + one map-side-combined count
    * aggregate + a 1-row total met with a broadcast cross join. At
    * 100 TB this is a stable artifact computed once from the reference
    * corpus and reused across scoring runs (batch AND streaming — see
    * [[graft.streaming.EventPipeline.startQualityFilter]]).
    * Overflow-safe to ~2^53 corpus tokens (the double mantissa;
    * IEEE multiply/divide/round are correctly rounded, so the quantized
    * rel_ppb is engine-identical).
    */
  def referenceRel(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(explode(Hashing.words(col(textCol))).as("_word"))
      .filter(length(col("_word")) > 0)
    val corpus = toks.groupBy("_word").agg(count(lit(1)).as("_cnt"))
    val tot = corpus.agg(sum("_cnt").as("_tot"))
    corpus.crossJoin(broadcast(tot))
      .select(col("_word"),
        round(col("_cnt") * lit(Ppb.toDouble) / col("_tot")).cast("long").as("_rel_ppb"))
  }

  /** Score documents against a FROZEN reference frequency table from
    * [[referenceRel]]: mean reference frequency of the document's
    * tokens in ppb, out-of-vocabulary tokens scoring 0 (they dilute
    * the mean — the harsh-OOV convention, which is what makes garbage
    * score low). This is the CCNet deployment shape: the LM is fit to
    * a curated reference corpus ONCE, then applied to arbitrary new
    * data.
    *
    * Shape at scale: token explode → per-(doc, word) counts (bounds
    * every later stage at one row per distinct pair, not one per token
    * instance), then one shuffle join on `word` back to the per-doc
    * pairs. All aggregation-shaped with map-side combine; the word-key
    * join's skew is bounded because the left side is per-doc DISTINCT
    * words (a stop word contributes one row per doc, never one per
    * occurrence). sum(tf·rel_ppb) <= n_tok·Ppb fits a long.
    *
    * Output: `idCol`, extras, `n_tok`, `score_ppb`.
    */
  def scoreWithReference(docs: DataFrame, idCol: String, textCol: String,
                         rel: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    val keys = (idCol +: extra).map(col)
    val toks = docs
      .select(keys :+ explode(Hashing.words(col(textCol))).as("_word"): _*)
      .filter(length(col("_word")) > 0)
    val tf = toks.groupBy(keys :+ col("_word"): _*).agg(count(lit(1)).as("_tf"))
    tf.join(rel, Seq("_word"), "left")
      .withColumn("_rel0", coalesce(col("_rel_ppb"), lit(0L)))
      .groupBy(keys: _*)
      .agg(sum(expr("_tf * _rel0")).as("_s"), sum("_tf").as("n_tok"))
      .select(keys :+ col("n_tok") :+ expr("_s div n_tok").as("score_ppb"): _*)
  }

  /** Per-document unigram-LM quality score: the corpus scored against
    * its OWN frequency table (every token in-vocabulary by
    * construction). A log-free perplexity proxy — documents of common,
    * fluent vocabulary score high; rare-token/garbage documents score
    * low — with the monotone log dropped so the score hash-gates
    * cross-engine.
    *
    * Output: `idCol`, extras, `n_tok`, `score_ppb`.
    */
  def unigramQuality(docs: DataFrame, idCol: String, textCol: String,
                     extra: Seq[String] = Nil): DataFrame =
    scoreWithReference(docs, idCol, textCol, referenceRel(docs, textCol), extra)

  /** Oracle CTE chain ending in `scored(idCol, extras..., n_tok,
    * score_ppb)` — same arithmetic, generated from the same constants.
    */
  def unigramQualityCtes(table: String, idCol: String, textCol: String,
                         extra: Seq[String] = Nil): String = {
    val keys = (idCol +: extra).mkString(", ")
    s"""toks AS (SELECT $keys, unnest(${Hashing.wordsSql(textCol)}) AS w FROM $table),
       |tk AS (SELECT $keys, w FROM toks WHERE length(w) > 0),
       |tf AS (SELECT $keys, w, count(*) AS tf FROM tk GROUP BY ALL),
       |c AS (SELECT w, sum(tf) AS cnt FROM tf GROUP BY 1),
       |tot AS (SELECT sum(cnt) AS tot FROM c),
       |rel AS (SELECT w, CAST(round(cnt * ${Ppb.toDouble} / tot) AS BIGINT) AS rel_ppb FROM c, tot),
       |scored AS (
       |  SELECT $keys, CAST(sum(tf) AS BIGINT) AS n_tok,
       |         CAST(sum(tf * rel_ppb) // sum(tf) AS BIGINT) AS score_ppb
       |  FROM tf JOIN rel USING (w) GROUP BY ALL)""".stripMargin
  }

  /** Stupid-backoff discount for unseen bigrams: backed-off unigram
    * mass is divided by 10 (integer — Brants et al.'s λ=0.4 rounded to
    * a hash-gateable power of ten).
    */
  val BackoffDiv = 10L

  /** Bigram-LM quality score with stupid backoff, scored against a
    * HELD-OUT reference corpus (the KenLM-filter shape one rung up
    * from [[unigramQuality]]): each consecutive word pair scores its
    * reference bigram frequency when the reference has seen the pair,
    * else the unigram frequency of the continuation word discounted by
    * [[BackoffDiv]], else 0 (OOV). Scoring against a SEPARATE
    * reference is what makes backoff real — self-scored corpora
    * contain every one of their own bigrams.
    *
    * Same integer-ppb discipline as the unigram path; the two
    * reference tables are word-/pair-keyed equi-joins (per-doc
    * DISTINCT pairs on the left, so stop-pair skew is bounded by
    * document count). Documents shorter than 2 words have no bigrams
    * and are absent from the output by construction.
    *
    * Output: `idCol`, n_bigrams, score_ppb.
    */
  def bigramScoreWithBackoff(docs: DataFrame, refDocs: DataFrame,
                             idCol: String, textCol: String): DataFrame = {
    def pairs(df: DataFrame, cols: Seq[Column]): DataFrame =
      df.select(cols :+ filter(Hashing.words(col(textCol)), w => length(w) > 0).as("_w"): _*)
        .filter(size(col("_w")) >= 2)
        .select(cols :+ posexplode(expr("transform(sequence(1, size(_w) - 1), i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))")) :+ col("_w"): _*)
        .select(cols :+ col("col").as("_bigram") :+
          element_at(col("_w"), col("pos") + 2).as("_w2"): _*)
    // reference tables: bigram rel + unigram rel, both in ppb of their
    // own totals
    val refPairs = pairs(refDocs, Nil)
    val bigramCnt = refPairs.groupBy("_bigram").agg(count(lit(1)).as("_cnt"))
    val bigramTot = bigramCnt.agg(sum("_cnt").as("_tot"))
    val rel2 = bigramCnt.crossJoin(broadcast(bigramTot))
      .select(col("_bigram"),
        round(col("_cnt") * lit(Ppb.toDouble) / col("_tot")).cast("long").as("_rel2_ppb"))
    val rel1 = referenceRel(refDocs, textCol)
      .select(col("_word").as("_w2"), col("_rel_ppb").as("_rel1_ppb"))
    // score side: per-doc (bigram, continuation) counts
    val tf = pairs(docs, Seq(col(idCol)))
      .groupBy(col(idCol), col("_bigram"), col("_w2")).agg(count(lit(1)).as("_tf"))
    tf.join(rel2, Seq("_bigram"), "left")
      .join(rel1, Seq("_w2"), "left")
      .withColumn("_score", coalesce(col("_rel2_ppb"),
        expr(s"_rel1_ppb div $BackoffDiv"), lit(0L)))
      .groupBy(col(idCol))
      .agg(sum(expr("_tf * _score")).as("_s"), sum("_tf").as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"), expr("_s div n_bigrams").as("score_ppb"))
  }

  /** Oracle twin of [[bigramScoreWithBackoff]]: `docsWhere`/`refWhere`
    * select the scored and reference halves of `table`.
    */
  def bigramScoreSql(table: String, idCol: String, textCol: String,
                     docsWhere: String, refWhere: String): String = {
    def pairCtes(pfx: String, where: String, keys: String) =
      s"""${pfx}w AS (SELECT $keys list_filter(${Hashing.wordsSql(textCol)}, x -> length(x) > 0) AS w
         |       FROM $table WHERE $where),
         |${pfx}bg AS (SELECT $keys
         |        unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i + 1])) AS bigram,
         |        unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i + 1])) AS w2
         |      FROM ${pfx}w WHERE len(w) >= 2)""".stripMargin
    s"""WITH ${pairCtes("r", refWhere, "")},
       |c2 AS (SELECT bigram, count(*) AS cnt FROM rbg GROUP BY 1),
       |t2 AS (SELECT sum(cnt) AS tot FROM c2),
       |rel2 AS (SELECT bigram, CAST(round(cnt * ${Ppb.toDouble} / tot) AS BIGINT) AS rel2_ppb FROM c2, t2),
       |rtk AS (SELECT unnest(w) AS word FROM rw),
       |c1 AS (SELECT word, count(*) AS cnt FROM rtk GROUP BY 1),
       |t1 AS (SELECT sum(cnt) AS tot FROM c1),
       |rel1 AS (SELECT word AS w2, CAST(round(cnt * ${Ppb.toDouble} / tot) AS BIGINT) AS rel1_ppb FROM c1, t1),
       |${pairCtes("d", docsWhere, s"$idCol,")},
       |tf AS (SELECT $idCol, bigram, w2, count(*) AS tf FROM dbg GROUP BY 1, 2, 3)
       |SELECT $idCol, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       |       CAST(sum(tf * coalesce(rel2_ppb, rel1_ppb // $BackoffDiv, 0)) // sum(tf) AS BIGINT) AS score_ppb
       |FROM tf LEFT JOIN rel2 USING (bigram) LEFT JOIN rel1 USING (w2)
       |GROUP BY 1""".stripMargin
  }

  /** CCNet head/middle/tail bucketing: per language, split the corpus
    * into score thirds — head = best LM fit (lowest perplexity), the
    * slice CCNet feeds to training first. Thresholds come from a
    * histogram grid over the integer score (NOT a per-language ntile:
    * an ntile window sorts every document of a language in one task,
    * the quantized grid keeps the per-language state <= Ppb/BinWidth
    * rows — the [[HistogramQuantiles]] scale path). Documents in one
    * bin always land in one bucket; both engines quantize identically,
    * so the boundary is deterministic.
    *
    * Output: `idCol`, lang, score_ppb, bucket.
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String): DataFrame = {
    val scored = unigramQuality(docs, idCol, textCol, Seq(langCol))
    val binned = scored.withColumn("_bin", expr(s"score_ppb div $BinWidth"))
    val binCounts = binned.groupBy(col(langCol), col("_bin")).agg(count(lit(1)).as("_bn"))
    // windows run over the ≤244k-row bin AGGREGATE per language, never
    // over documents
    val byLang = Window.partitionBy(langCol)
    val cum = binCounts
      .withColumn("_cum", sum("_bn").over(byLang.orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum("_bn").over(byLang))
    val thr = cum.groupBy(langCol).agg(
      min(when(expr("_cum * 3 >= _n"), col("_bin"))).as("_t1"),
      min(when(expr("_cum * 3 >= 2 * _n"), col("_bin"))).as("_t2"),
      min(col("_bin")).as("_bmin"), max(col("_bin")).as("_bmax"))
    // degenerate language (every doc in one histogram bin — single-doc
    // or all-equal-score): t1 == t2 == that bin would label the WHOLE
    // language 'tail' and the funnel's quality stage would drop it
    // wholesale; an indivisible distribution has no worst third → keep
    // all ('head')
    binned.join(broadcast(thr), langCol)
      .select(col(idCol), col(langCol), col("score_ppb"),
        when(col("_bmin") === col("_bmax"), "head")
          .when(col("_bin") <= col("_t1"), "tail")
          .when(col("_bin") <= col("_t2"), "middle")
          .otherwise("head").as("bucket"))
  }

  /** Oracle CTE chain ending in `bucketed(idCol, langCol, score_ppb,
    * bucket)` — composable (the funnel embeds it over a survivor CTE).
    */
  def ccnetBucketCtes(table: String, idCol: String, textCol: String,
                      langCol: String): String =
    s"""${unigramQualityCtes(table, idCol, textCol, Seq(langCol))},
       |b AS (SELECT $idCol, $langCol, score_ppb, score_ppb // $BinWidth AS bin FROM scored),
       |bc AS (SELECT $langCol, bin, count(*) AS bn FROM b GROUP BY 1, 2),
       |cum AS (SELECT $langCol, bin,
       |               sum(bn) OVER (PARTITION BY $langCol ORDER BY bin) AS cum,
       |               sum(bn) OVER (PARTITION BY $langCol) AS n FROM bc),
       |thr AS (SELECT $langCol, min(CASE WHEN cum * 3 >= n THEN bin END) AS t1,
       |               min(CASE WHEN cum * 3 >= 2 * n THEN bin END) AS t2,
       |               min(bin) AS bmin, max(bin) AS bmax
       |        FROM cum GROUP BY 1),
       |bucketed AS (
       |  SELECT $idCol, $langCol, score_ppb,
       |         CASE WHEN bmin = bmax THEN 'head'
       |              WHEN bin <= t1 THEN 'tail' WHEN bin <= t2 THEN 'middle'
       |              ELSE 'head' END AS bucket
       |  FROM b JOIN thr USING ($langCol))""".stripMargin

  def ccnetBucketsSql(table: String, idCol: String, textCol: String,
                      langCol: String): String =
    s"""WITH ${ccnetBucketCtes(table, idCol, textCol, langCol)}
       |SELECT $idCol, $langCol, score_ppb, bucket FROM bucketed""".stripMargin

  /** The end-to-end curation funnel report: how many documents and
    * tokens survive each stage of the standard pipeline —
    * raw → exact dedup (keep lowest id per exact text) →
    * quality (drop the per-language tail third, [[ccnetBuckets]]) →
    * domain cap (top `capK` per domain by `orderCol`). The first
    * number a curation run reports: where the corpus actually went.
    * Stages are applied SEQUENTIALLY (each stage's corpus statistics —
    * bucket thresholds, domain ranks — are computed over the previous
    * stage's survivors, exactly as a staged pipeline would see them),
    * and each stage is one of this module's designed operators, so the
    * funnel inherits their scale shapes. The four stage aggregates are
    * single map-side-combined rows unioned at the end.
    *
    * Output: stage_idx, stage, n_docs, n_tokens.
    */
  def curationFunnel(docs: DataFrame, idCol: String, textCol: String,
                     langCol: String, domainCol: String, orderCol: String,
                     capK: Int): DataFrame = {
    val base = docs.select(col(idCol), col(langCol), col(domainCol),
      col(orderCol), col(textCol),
      size(filter(Hashing.words(col(textCol)), w => length(w) > 0)).as("_n_tok"))
    val s1 = base
      .withColumn("_keeper", min(col(idCol)).over(Window.partitionBy(md5(col(textCol)))))
      .filter(col(idCol) === col("_keeper")).drop("_keeper")
    val s2 = s1.join(
      ccnetBuckets(s1, idCol, textCol, langCol)
        .filter(col("bucket") =!= "tail").select(col(idCol)),
      idCol)
    val s3 = s2
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(domainCol)).orderBy(col(orderCol).desc, col(idCol))))
      .filter(col("_rk") <= capK)
    def stageRow(df: DataFrame, idx: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum("_n_tok").cast("long").as("n_tokens"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    stageRow(base, 0, "raw")
      .unionAll(stageRow(s1, 1, "exact_dedup"))
      .unionAll(stageRow(s2, 2, "quality"))
      .unionAll(stageRow(s3, 3, "domain_cap"))
  }

  def curationFunnelSql(table: String, idCol: String, textCol: String,
                        langCol: String, domainCol: String, orderCol: String,
                        capK: Int): String =
    s"""WITH base AS (SELECT $idCol, $langCol, $domainCol, $orderCol, $textCol,
       |                     len(list_filter(${Hashing.wordsSql(textCol)}, x -> length(x) > 0)) AS n_tok
       |              FROM $table),
       |s1 AS (SELECT * FROM (
       |         SELECT *, min($idCol) OVER (PARTITION BY md5($textCol)) AS keeper FROM base)
       |       WHERE $idCol = keeper),
       |${ccnetBucketCtes("s1", idCol, textCol, langCol)},
       |s2 AS (SELECT s1.* FROM s1 JOIN bucketed USING ($idCol) WHERE bucket <> 'tail'),
       |s3 AS (SELECT * FROM (
       |         SELECT *, row_number() OVER (PARTITION BY $domainCol
       |                     ORDER BY $orderCol DESC, $idCol) AS rk FROM s2)
       |       WHERE rk <= $capK)
       |SELECT 0 AS stage_idx, 'raw' AS stage, count(*) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM base
       |UNION ALL SELECT 1, 'exact_dedup', count(*), CAST(sum(n_tok) AS BIGINT) FROM s1
       |UNION ALL SELECT 2, 'quality', count(*), CAST(sum(n_tok) AS BIGINT) FROM s2
       |UNION ALL SELECT 3, 'domain_cap', count(*), CAST(sum(n_tok) AS BIGINT) FROM s3""".stripMargin

  /** Per-language percentile calibration of the quality score, in basis
    * points: `pct_bp = 10000 · (docs in strictly lower bins) / n_lang`.
    * Scores are only comparable WITHIN a language (a small language's
    * common words are rarer corpus-wide), so cross-lingual thresholds
    * must be set on the calibrated rank, not the raw ppb — this is the
    * continuous companion to [[ccnetBuckets]]' three-way split. Same
    * bounded histogram grid (never a per-language rank window); docs
    * rejoin the ≤ Ppb/BinWidth-row CDF table by (lang, bin) equi-join.
    * Docs sharing a bin share a percentile — both engines quantize
    * identically. All integer arithmetic.
    *
    * Output: `idCol`, lang, score_ppb, pct_bp.
    */
  def qualityPercentile(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String): DataFrame = {
    val scored = unigramQuality(docs, idCol, textCol, Seq(langCol))
    val binned = scored.withColumn("_bin", expr(s"score_ppb div $BinWidth"))
    val byLang = Window.partitionBy(langCol)
    val cdf = binned.groupBy(col(langCol), col("_bin")).agg(count(lit(1)).as("_bn"))
      .withColumn("_cum", sum("_bn").over(byLang.orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum("_bn").over(byLang))
      .select(col(langCol), col("_bin"),
        expr("(_cum - _bn) * 10000 div _n").as("pct_bp"))
    binned.join(cdf, Seq(langCol, "_bin"))
      .select(col(idCol), col(langCol), col("score_ppb"), col("pct_bp"))
  }

  def qualityPercentileSql(table: String, idCol: String, textCol: String,
                           langCol: String): String =
    s"""WITH ${unigramQualityCtes(table, idCol, textCol, Seq(langCol))},
       |b AS (SELECT $idCol, $langCol, score_ppb, score_ppb // $BinWidth AS bin FROM scored),
       |bc AS (SELECT $langCol, bin, count(*) AS bn FROM b GROUP BY 1, 2),
       |cdf AS (SELECT $langCol, bin,
       |               CAST(((sum(bn) OVER (PARTITION BY $langCol ORDER BY bin)) - bn) * 10000
       |                    // (sum(bn) OVER (PARTITION BY $langCol)) AS BIGINT) AS pct_bp
       |        FROM bc)
       |SELECT $idCol, $langCol, score_ppb, pct_bp
       |FROM b JOIN cdf USING ($langCol, bin)""".stripMargin

  /** Per-domain cap: keep at most `k` documents per domain, best-first
    * by `orderCol` (ties broken by id — fully deterministic). The
    * standard web-corpus defense against a single domain flooding the
    * mix. The rank filter compiles to WindowGroupLimit, so each task
    * keeps a k-row heap per domain instead of sorting whole partitions;
    * domain cardinality is the parallelism (millions of domains at
    * 100 TB — no hot partition).
    *
    * Output: `idCol`, domain, orderCol, rk (1-based).
    */
  def domainCap(docs: DataFrame, idCol: String, domainCol: String,
                orderCol: String, k: Int): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    val w = Window.partitionBy(col(domainCol)).orderBy(col(orderCol).desc, col(idCol))
    docs.select(col(idCol), col(domainCol), col(orderCol))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  def domainCapSql(table: String, idCol: String, domainCol: String,
                   orderCol: String, k: Int): String =
    s"""SELECT $idCol, $domainCol, $orderCol, CAST(rk AS INTEGER) AS rk FROM (
       |  SELECT $idCol, $domainCol, $orderCol,
       |         row_number() OVER (PARTITION BY $domainCol
       |                            ORDER BY $orderCol DESC, $idCol) AS rk
       |  FROM $table) WHERE rk <= $k""".stripMargin

  /** Quality-weighted deterministic sampling: keep each document with
    * probability proportional to its min-max-normalized quality score —
    * importance resampling toward high-quality data (the soft
    * alternative to a hard head/tail cutoff). Membership is decided by
    * exact integer cross-multiplication `slot·(mx−mn) < (score−mn)·Den`
    * of a stable hash slot (no RNG, no division): the best document is
    * always kept, the worst never, and the same rows are kept on any
    * engine, any partitioning, any rerun. Degenerate all-equal-scores
    * corpus keeps everything. The min/max aggregate is 1 row of model
    * state met with a broadcast cross join.
    *
    * Output: `idCol`, n_tok, score_ppb.
    */
  def qualityWeightedSample(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = unigramQuality(docs, idCol, textCol)
    val mm = scored.agg(max("score_ppb").as("_mx"), min("score_ppb").as("_mn"))
    val slot = pmod(Hashing.stableHash60(col(idCol).cast("string")), lit(Sampling.Den))
    scored.crossJoin(broadcast(mm))
      .filter(col("_mx") === col("_mn") ||
        slot * (col("_mx") - col("_mn")) < (col("score_ppb") - col("_mn")) * lit(Sampling.Den))
      .select(col(idCol), col("n_tok"), col("score_ppb"))
  }

  def qualityWeightedSampleSql(table: String, idCol: String, textCol: String): String =
    s"""WITH ${unigramQualityCtes(table, idCol, textCol)},
       |mm AS (SELECT max(score_ppb) AS mx, min(score_ppb) AS mn FROM scored)
       |SELECT $idCol, n_tok, score_ppb FROM scored, mm
       |WHERE mx = mn OR
       |      (${Hashing.stableHash60Sql(s"CAST($idCol AS VARCHAR)")} % ${Sampling.Den}) * (mx - mn)
       |        < (score_ppb - mn) * ${Sampling.Den}""".stripMargin
}
