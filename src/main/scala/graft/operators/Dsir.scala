package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via hashed-n-gram importance resampling
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): estimate how much more likely each
  * HASHED token bucket is under a curated target corpus than under the
  * raw corpus, score every raw document by the average importance of
  * its tokens, and keep the top fraction.
  *
  * Engine disciplines, matching the rest of this module:
  *   - The feature space is FIXED at [[Buckets]] hashed unigram
  *     buckets, so the weight model is a bounded artifact (like
  *     [[Curation.referenceRel]] or an IVF centroid table) no matter
  *     the corpus size — broadcast, never shuffled.
  *   - Weights are integer ppm RATIO weights (Laplace-smoothed
  *     `p_target(b)/p_raw(b)`), clipped at [[WClamp]] — the monotone
  *     log-free variant of DSIR's log-ratio, same discipline as the
  *     log-free BM25 in [[Retrieval]]: no `ln` cross-engine hazard,
  *     and the clip bounds the per-token contribution so document
  *     sums cannot overflow (safe to ~9·10⁹ tokens/doc).
  *   - Selection uses a bounded histogram-grid threshold (the
  *     [[Curation.ccnetBuckets]] / [[HistogramQuantiles]] trick): the
  *     bin aggregate is ≤ [[WClamp]]/[[BinW]] ≈ 244k rows of model
  *     state folded on the driver — never a window or a sort over
  *     documents — and whole bins are kept, so both engines make the
  *     identical boundary decision.
  *   - The double arithmetic in the weight formula is a fixed
  *     parenthesization of IEEE multiply/divide (correctly rounded,
  *     engine-identical — the [[Curation.referenceRel]] argument);
  *     everything after quantization is integer math.
  */
object Dsir {

  /** Hashed feature space size (DSIR uses 10k buckets; 4096 keeps the
    * weight table broadcast-small and the modulus a power of two).
    */
  val Buckets = 4096L

  /** Weight scale: parts-per-million. */
  val Ppm = 1000000L

  /** Importance clip: 1000× enrichment. DSIR implementations clip the
    * ratio too — an ultra-rare raw bucket must not dominate a score.
    */
  val WClamp: Long = 1000L * Ppm

  /** Score-histogram bin width (ppm) for the selection threshold. */
  val BinW = 4096L

  private def bucketOf(word: Column): Column =
    pmod(Hashing.stableHash60(word), lit(Buckets))

  private def tokens(docs: DataFrame, textCol: String, keep: Column*): DataFrame =
    docs.select(keep :+ explode(Hashing.words(col(textCol))).as("_word"): _*)
      .filter(length(col("_word")) > 0)

  /** Per-bucket token-instance counts: (_bucket, _cnt), ≤ [[Buckets]]
    * rows from one map-side-combined aggregate.
    */
  private def bucketCounts(docs: DataFrame, textCol: String): DataFrame =
    tokens(docs, textCol)
      .groupBy(bucketOf(col("_word")).as("_bucket"))
      .agg(count(lit(1)).as("_cnt"))

  /** The DSIR weight model: one row per bucket OBSERVED IN THE RAW
    * CORPUS (raw-side driven — scoring only ever looks up buckets the
    * scored documents contain), with the clipped ppm importance
    * `w_ppm = clip(round(1e6 · p̂_target(b) / p̂_raw(b)))` under
    * add-one smoothing over [[Buckets]] cells. ≤ [[Buckets]] rows: a
    * broadcastable model artifact from two map-side-combined
    * aggregates. The two corpus token TOTALS are 1-row aggregates
    * collected to the driver and folded in as literals (model state,
    * the [[Sampling.balanceToMix]] discipline) — keeping the
    * distributed plan pure equi-joins, with no 1-row
    * BroadcastNestedLoopJoin shims.
    */
  def bucketWeights(raw: DataFrame, target: DataFrame, textCol: String): DataFrame = {
    val rawB = bucketCounts(raw, textCol)
      .select(col("_bucket"), col("_cnt").as("_rawc"))
    val tgtB = bucketCounts(target, textCol)
      .select(col("_bucket"), col("_cnt").as("_tgtc"))
    val rawTot = rawB.agg(sum("_rawc")).collect()(0).getLong(0)
    val tgtTot = tgtB.agg(coalesce(sum("_tgtc"), lit(0L))).collect()(0).getLong(0)
    rawB.join(broadcast(tgtB), Seq("_bucket"), "left")
      .select(col("_bucket"),
        least(lit(WClamp), round(
          ((coalesce(col("_tgtc"), lit(0L)) + lit(1L)).cast("double") *
            lit(Ppm.toDouble) * lit((rawTot + Buckets).toDouble)) /
            ((col("_rawc") + lit(1L)).cast("double") *
              lit((tgtTot + Buckets).toDouble)))
          .cast("long")).as("_w_ppm"))
  }

  /** Score documents against a weight model from [[bucketWeights]]:
    * `score_ppm = floor(Σ_tokens w_ppm(bucket) / n_tokens)` — the mean
    * importance of the document's tokens, integer-floored so both
    * engines quantize identically. One token explode + one broadcast
    * lookup join + one aggregate; empty documents produce no tokens
    * and drop (the raw corpus fixture has none).
    *
    * Output: idCol, n_tokens, score_ppm.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: DataFrame): DataFrame =
    tokens(docs, textCol, col(idCol))
      .select(col(idCol), bucketOf(col("_word")).as("_bucket"))
      .join(broadcast(weights), "_bucket")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("_w_ppm").as("_sw"))
      .select(col(idCol), col("n_tokens"),
        expr("_sw div n_tokens").as("score_ppm"))

  /** End-to-end importance resampling: weights from (raw, target),
    * scores over raw, then keep the top `keepBp`/10000 of documents by
    * score using the histogram-grid threshold (whole bins kept, so the
    * boundary is engine-deterministic; the kept fraction overshoots by
    * at most one bin's population).
    *
    * Output: idCol, n_tokens, score_ppm, kept (1/0).
    */
  def resample(raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
               keepBp: Int): DataFrame = {
    require(keepBp >= 0 && keepBp <= 10000, s"keepBp must be in [0, 10000], got $keepBp")
    val scored = score(raw, idCol, textCol, bucketWeights(raw, target, textCol))
      .withColumn("_bin", expr(s"score_ppm div $BinW"))
    // The ≤ WClamp/BinW ≈ 244k-row bin histogram is bounded MODEL
    // STATE (exactly [[HistogramQuantiles]]' grid): fold it on the
    // driver instead of planning a partition-less window — the
    // distributed plan stays window-free, and `kept` is a literal
    // comparison. Integer fold order is deterministic (sorted desc).
    val bins = scored.groupBy("_bin").agg(count(lit(1)).as("_bn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    val n = bins.map(_._2).sum
    var cum = 0L
    var thr = Long.MinValue
    for ((bin, bn) <- bins if thr == Long.MinValue) {
      cum += bn
      if (cum * 10000 >= keepBp.toLong * n) thr = bin
    }
    scored.select(col(idCol), col("n_tokens"), col("score_ppm"),
      when(col("_bin") >= lit(thr), lit(1L)).otherwise(lit(0L)).as("kept"))
  }

  // ------------------------------------------------------------------ SQL twin

  private def bucketSql(e: String): String =
    s"${Hashing.stableHash60Sql(e)} % $Buckets"

  private def tokCte(name: String, table: String, where: String, keys: String): String =
    s"""$name AS (
       |  SELECT $keys w AS _word
       |  FROM (SELECT *, unnest(string_split(text, ' ')) AS w FROM $table $where)
       |  WHERE length(w) > 0)""".stripMargin

  /** DuckDB twin of [[resample]] over `table(idCol, text)` with the
    * target slice given as a WHERE fragment (e.g. "WHERE doc_id % 10 = 0").
    */
  def resampleSql(table: String, idCol: String, targetWhere: String,
                  keepBp: Int): String =
    s"""WITH ${tokCte("rawtok", table, "", "")},
       |${tokCte("tgttok", table, targetWhere, "")},
       |rawb AS (SELECT ${bucketSql("_word")} AS _bucket, count(*) AS rawc
       |         FROM rawtok GROUP BY 1),
       |rawt AS (SELECT sum(rawc) AS rawtot FROM rawb),
       |tgtb AS (SELECT ${bucketSql("_word")} AS _bucket, count(*) AS tgtc
       |         FROM tgttok GROUP BY 1),
       |tgtt AS (SELECT sum(tgtc) AS tgttot FROM tgtb),
       |wts AS (
       |  SELECT rawb._bucket,
       |         least($WClamp, CAST(round(
       |           (CAST(COALESCE(tgtb.tgtc, 0) + 1 AS DOUBLE) * ${Ppm.toDouble}
       |             * CAST(rawt.rawtot + $Buckets AS DOUBLE))
       |           / (CAST(rawb.rawc + 1 AS DOUBLE)
       |             * CAST(COALESCE(tgtt.tgttot, 0) + $Buckets AS DOUBLE)))
       |           AS BIGINT)) AS w_ppm
       |  FROM rawb LEFT JOIN tgtb USING (_bucket), rawt, tgtt),
       |doctok AS (
       |  SELECT $idCol, ${bucketSql("_word")} AS _bucket
       |  FROM (SELECT $idCol, unnest(string_split(text, ' ')) AS _word FROM $table)
       |  WHERE length(_word) > 0),
       |scored AS (
       |  SELECT $idCol, count(*) AS n_tokens,
       |         CAST(sum(w_ppm) // count(*) AS BIGINT) AS score_ppm
       |  FROM doctok JOIN wts USING (_bucket) GROUP BY 1),
       |b AS (SELECT *, score_ppm // $BinW AS bin FROM scored),
       |bc AS (SELECT bin, count(*) AS bn FROM b GROUP BY 1),
       |cum AS (SELECT bin, sum(bn) OVER (ORDER BY bin DESC) AS cumtop,
       |               sum(bn) OVER () AS n FROM bc),
       |thr AS (SELECT max(CASE WHEN cumtop * 10000 >= $keepBp * n THEN bin END) AS t
       |        FROM cum)
       |SELECT $idCol, n_tokens, score_ppm,
       |       CAST(CASE WHEN bin >= COALESCE(t, ${Long.MinValue}) THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM b, thr""".stripMargin
}
