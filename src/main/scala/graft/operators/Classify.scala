package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-centroid (Rocchio) text classification: per-class unigram
  * centroids in integer ppb, then a linear match score per (doc, class)
  * with argmax prediction — the count-based stand-in for the fastText
  * source/quality classifiers a pretraining pipeline trains on weak
  * labels (domain, license tier, curated-vs-crawl) and sweeps over the
  * corpus. The reference's pipeline has no learned stage; this is the
  * corpus-global classifier rung above [[Curation]]'s fixed scoring,
  * built from the same frequency machinery so it shares its determinism
  * proof.
  *
  * Determinism (hash-gates against DuckDB):
  *   - centroid weights are `round(cnt · 1e9 / class_total)` longs —
  *     the [[Curation.referenceRel]] arithmetic per class;
  *   - the per-(doc, class) score sums longs (order-independent),
  *     divides by doc length with integer `div`;
  *   - argmax tie-breaks on the lexicographically smallest class;
  *   - docs with zero in-vocabulary tokens predict the explicit
  *     [[Classify.Unclassifiable]] marker (no RNG, no engine default).
  *
  * Scale shape: training is two map-side-combined aggregates (class ×
  * word counts, class totals) joined class-keyed — the model is
  * `classes × vocab` rows, a broadcast-sized artifact for any sane
  * class count. Scoring is the [[Curation.scoreWithReference]] shape:
  * per-doc DISTINCT words joined word-keyed to the centroids (fanout
  * ≤ class count per word), one hash agg, then a row_number window
  * whose partitions hold ≤ class-count rows — never a corpus-wide
  * sort. No NLJ anywhere: the fallback is a literal, not a cross join.
  */
object Classify {
  /** Fixed-point unit shared with [[Curation]]. */
  val Ppb: Long = Curation.Ppb

  /** Prediction for documents with no in-vocabulary token. */
  val Unclassifiable = "?"

  /** The classifier's sufficient statistics: per-(class, word) token
    * counts `(_cls, _word, _cnt)` — what [[Artifacts]] persists and
    * what [[centroidsFromCounts]] normalizes. ONE tokenize pass.
    */
  def classCounts(docs: DataFrame, labelCol: String, textCol: String): DataFrame =
    docs
      .select(col(labelCol).as("_cls"), explode(Hashing.words(col(textCol))).as("_word"))
      .filter(length(col("_word")) > 0)
      .groupBy("_cls", "_word").agg(count(lit(1)).as("_cnt"))

  /** Normalize counts to centroids `(_cls, _word, _rel_ppb)` — the ONE
    * place the ppb arithmetic lives, so recompute
    * ([[classCentroids]]) and artifact-fed ([[Artifacts.loadCentroids]])
    * paths are bit-identical by construction, not by parallel edits.
    */
  def centroidsFromCounts(cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy("_cls").agg(sum("_cnt").as("_tot"))
    cnt.join(broadcast(tot), Seq("_cls"))
      .select(col("_cls"), col("_word"),
        round(col("_cnt") * lit(Ppb.toDouble) / col("_tot")).cast("long").as("_rel_ppb"))
  }

  /** Train: per-class unigram centroid `(_cls, _word, _rel_ppb)`, each
    * class's word frequencies in ppb of that class's own token total
    * (length-normalized, so class imbalance does not tilt weights).
    */
  def classCentroids(docs: DataFrame, labelCol: String, textCol: String): DataFrame =
    centroidsFromCounts(classCounts(docs, labelCol, textCol))

  /** Score + predict: each document's tf vector against every centroid
    * (match score = Σ tf·rel_ppb div n_tok — the harsh-OOV mean of
    * [[Curation.scoreWithReference]], per class), keeping the argmax.
    *
    * Output: `idCol`, `pred`, `score_ppb` (the winning class's score;
    * 0 with pred=[[Unclassifiable]] when no token is in any centroid).
    */
  def centroidClassify(docs: DataFrame, idCol: String, textCol: String,
                       centroids: DataFrame): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(Hashing.words(col(textCol))).as("_word"))
      .filter(length(col("_word")) > 0)
    val tf = toks.groupBy(col(idCol), col("_word")).agg(count(lit(1)).as("_tf"))
    val ntok = tf.groupBy(col(idCol)).agg(sum("_tf").as("_n_tok"))
    val scores = tf.join(centroids, Seq("_word"))
      .groupBy(col(idCol), col("_cls"))
      .agg(sum(expr("_tf * _rel_ppb")).as("_s"))
    // ≤ class-count rows per partition: the window never sees the corpus
    val byDoc = Window.partitionBy(idCol).orderBy(col("_s").desc, col("_cls"))
    val best = scores.withColumn("_rn", row_number().over(byDoc))
      .filter(col("_rn") === 1).drop("_rn")
    docs.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .join(ntok, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_cls"), lit(Unclassifiable)).as("pred"),
        coalesce(expr("_s div _n_tok"), lit(0L)).as("score_ppb"))
  }

  /** Confusion matrix of a held-out evaluation: `(labelCol, pred, n)`
    * over the scored split — the per-class precision/recall inputs.
    */
  def confusion(docs: DataFrame, idCol: String, labelCol: String,
                predictions: DataFrame): DataFrame =
    docs.select(col(idCol), col(labelCol))
      .join(predictions.select(col(idCol), col("pred")), Seq(idCol))
      .groupBy(col(labelCol), col("pred"))
      .agg(count(lit(1)).as("n"))

  /** Oracle CTE chain ending in `cen(cls, w, rel_ppb)` — the SQL twin
    * of [[classCentroids]], shared by the classify and the
    * top-features oracles so the ppb arithmetic has one SQL home too.
    */
  def centroidCtes(table: String, labelCol: String, textCol: String,
                   trainWhere: String): String =
    s"""ctk AS (SELECT $labelCol AS cls, unnest(${Hashing.wordsSql(textCol)}) AS w
       |        FROM $table WHERE $trainWhere),
       |ccnt AS (SELECT cls, w, count(*) AS cnt FROM ctk WHERE length(w) > 0 GROUP BY 1, 2),
       |ctot AS (SELECT cls, sum(cnt) AS tot FROM ccnt GROUP BY 1),
       |cen AS (SELECT cls, w, CAST(round(cnt * ${Ppb.toDouble} / tot) AS BIGINT) AS rel_ppb
       |        FROM ccnt JOIN ctot USING (cls))""".stripMargin

  /** Oracle CTE chain ending in `pred(idCol, pred, score_ppb)`:
    * centroids from `table` rows matching `trainWhere`, predictions
    * for rows matching `scoreWhere` — same constants, same rounding.
    */
  def classifyCtes(table: String, idCol: String, labelCol: String,
                   textCol: String, trainWhere: String, scoreWhere: String): String =
    s"""${centroidCtes(table, labelCol, textCol, trainWhere)},
       |dtk AS (SELECT $idCol, unnest(${Hashing.wordsSql(textCol)}) AS w
       |        FROM $table WHERE $scoreWhere),
       |dtf AS (SELECT $idCol, w, count(*) AS tf FROM dtk WHERE length(w) > 0 GROUP BY 1, 2),
       |dnt AS (SELECT $idCol, sum(tf) AS n_tok FROM dtf GROUP BY 1),
       |dsc AS (SELECT $idCol, cls, sum(tf * rel_ppb) AS s
       |        FROM dtf JOIN cen USING (w) GROUP BY 1, 2),
       |dbest AS (SELECT $idCol, cls, s FROM (
       |            SELECT *, row_number() OVER (PARTITION BY $idCol ORDER BY s DESC, cls) AS rn
       |            FROM dsc) WHERE rn = 1),
       |pred AS (SELECT d.$idCol,
       |                coalesce(b.cls, '$Unclassifiable') AS pred,
       |                CAST(coalesce(b.s // n.n_tok, 0) AS BIGINT) AS score_ppb
       |         FROM (SELECT $idCol FROM $table WHERE $scoreWhere) d
       |         LEFT JOIN dbest b USING ($idCol)
       |         LEFT JOIN dnt n USING ($idCol))""".stripMargin
}
