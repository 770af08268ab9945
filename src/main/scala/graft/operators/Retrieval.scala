package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: BM25-style scoring of a
  * probe set against the corpus, and reciprocal-rank fusion of two
  * rankings — the retrieval layer of a training-data pipeline
  * (decontamination triage, RAG candidate generation, probe-based
  * quality audits all reduce to "rank corpus docs against these
  * queries").
  *
  * Determinism contract (both operators hash-gate against DuckDB):
  *   - `k1 = 1.25`, `b = 0.75`: exact in binary AND decimal, so the
  *     constants survive any literal-parsing / decimal-promotion path
  *     identically on both engines (1.2 would not: its double is not
  *     its DECIMAL(2,1)-to-double image).
  *   - the BM25 weight stays a log-free rational: the classic
  *     `ln((N-df+0.5)/(df+0.5))` idf keeps its argument and drops the
  *     ln — ln is monotone, so rankings are unchanged, and the raw
  *     odds-ratio stays inside correctly-rounded IEEE arithmetic where
  *     ln (not correctly-rounded, libm-specific) cannot hash-gate.
  *   - per-term weights are scaled to integer micro-units BEFORE the
  *     per-(probe, doc) sum: summing doubles across rows is
  *     partition-order-dependent, summing longs is not (same trick as
  *     q_ivf_assign's integer-scaled centroid sums).
  *
  * Scale shape: tf is one map-side-combined hash agg over the exploded
  * corpus; dl and df REUSE the tf aggregate (no second corpus pass);
  * the probe join is keyed by word (vocabulary-sized, Zipf skew
  * absorbed by AQE); corpus-level scalars (N, total length) are model
  * state, same class as balanceToMix's per-source counts. Per-probe
  * top-k is a row_number window WindowGroupLimit cuts map-side.
  */
object Retrieval {
  import Hashing._

  /** BM25 saturation / length-normalization constants — exact in
    * binary and decimal (see determinism contract above).
    */
  val K1 = 1.25
  val B = 0.75

  /** Integer micro-unit scale for per-term weights. */
  val ScoreScale = 1000000.0

  /** Default stop-term document-frequency cap. The scoring join's
    * fanout is Σ_t df(t)·pf(t) (pf = probes containing t), and the
    * head of the Zipf curve dominates it: a term in every corpus doc
    * AND every probe joins |corpus|×|probes| rows on its own while
    * carrying the lowest idf weight in the vocabulary — measured 27 s
    * → 0.9 s at sf0.1 for q_bm25_topk when capped. Dropping those
    * terms is classic stopword elimination, made explicit: the cap
    * bounds any single term's join contribution at maxDf·|probes|
    * rows, the same plan-shape guarantee as [[Dedup.DefaultMaxShingleDf]]
    * for the quadratic shingle joins.
    */
  val DefaultMaxTermDf = 128L

  /** BM25-scored (probe_id, doc_id) pairs:
    * `score_u = Σ_terms round(idf_odds · tf·(k1+1)/(tf + k1·lenNorm) · 1e6)`
    * summed as longs, plus the matched-term count. Every probe word is
    * counted once (probe term sets are deduped — standard bag-of-query-
    * terms BM25 with query tf clamped to 1); terms above the `maxDf`
    * document-frequency cap score no pair at all (see
    * [[DefaultMaxTermDf]]). Corpus-level stats (N, total length) are
    * computed BEFORE the cap, so the cap prunes the join without
    * shifting the surviving terms' weights.
    */
  /** The corpus term-frequency table — one row per (doc, word) with
    * its count. This is THE sufficient statistic of BM25: dl, df and
    * the corpus scalars each derive from it in one aggregate, and the
    * expensive pass at 100 TB (tokenize + explode + first-level
    * aggregation over raw text) happens exactly here —
    * [[graft.operators.Artifacts]] persists this table so scoring runs
    * never repeat it.
    */
  def termFrequencies(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus.select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))

  def bm25Pairs(corpus: DataFrame, idCol: String, textCol: String,
                probes: DataFrame, probeIdCol: String, probeTextCol: String,
                maxDf: Option[Long] = Some(DefaultMaxTermDf)): DataFrame =
    bm25PairsFromTf(termFrequencies(corpus, idCol, textCol),
      probes, probeIdCol, probeTextCol, maxDf)

  /** [[bm25Pairs]] fed from an existing (doc_id, word, tf) table —
    * recomputed or loaded from a persisted index artifact.
    */
  def bm25PairsFromTf(tf: DataFrame,
                      probes: DataFrame, probeIdCol: String, probeTextCol: String,
                      maxDf: Option[Long] = Some(DefaultMaxTermDf)): DataFrame = {
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq0 = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val dfreq = maxDf.fold(dfreq0)(c => dfreq0.filter(col("df") <= c))
    // Corpus-level scalars: one tiny 1-row job (model state). dl·N stays
    // far under 2^53, so the long product is exact and the single
    // long/long division is the only rounding step in lenNorm.
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("tot")).head
    val nDocs = stats.getLong(0)
    val totLen = stats.getLong(1)
    val lenNorm = lit(1.0) - lit(B) + lit(B) * ((col("dl") * lit(nDocs)) / lit(totLen))
    val idfOdds = (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfSat = (col("tf") * (lit(K1) + lit(1.0))) / (col("tf") + lit(K1) * lenNorm)
    val wu = round(idfOdds * tfSat * lit(ScoreScale)).cast("long")
    val weights = tf.join(dl, Seq("doc_id")).join(dfreq, Seq("word"))
      .select(col("doc_id"), col("word"), wu.as("wu"))
    val probeTerms = probes
      .select(col(probeIdCol).as("probe_id"), explode(words(col(probeTextCol))).as("word"))
      .distinct()
    probeTerms.join(weights, Seq("word"))
      .groupBy("probe_id", "doc_id")
      .agg(count(lit(1)).as("n_matched"), sum("wu").as("score_u"))
  }

  /** Top-k corpus docs per probe by BM25 score (ties → lower doc_id). */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
               probes: DataFrame, probeIdCol: String, probeTextCol: String,
               k: Int, maxDf: Option[Long] = Some(DefaultMaxTermDf)): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("score_u").desc, col("doc_id"))
    bm25Pairs(corpus, idCol, textCol, probes, probeIdCol, probeTextCol, maxDf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** DuckDB twin of [[bm25Pairs]] as a CTE chain ending in
    * `bm(probe_id, doc_id, n_matched, score_u)`. `corpusFilter` /
    * `probeFilter` are WHERE predicates over `documents` selecting the
    * two sides. Generated from the same constants as the Spark side —
    * identical parse order in every double expression.
    */
  def bm25PairsCte(corpusFilter: String, probeFilter: String,
                   maxDf: Option[Long] = Some(DefaultMaxTermDf)): String =
    s"""tf AS (SELECT doc_id, word, count(*) AS tf
       |       FROM (SELECT doc_id, unnest(${wordsSql("text")}) AS word
       |             FROM documents WHERE $corpusFilter)
       |       GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
       |dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1${
      maxDf.map(c => s" HAVING count(*) <= $c").getOrElse("")}),
       |wt AS (SELECT tf.doc_id, tf.word,
       |         CAST(round((n_docs - df + 0.5) / (df + 0.5) *
       |           ((tf * ($K1 + 1.0)) / (tf + $K1 * (1.0 - $B + $B * ((dl * n_docs) / tot)))) *
       |           $ScoreScale) AS BIGINT) AS wu
       |       FROM tf JOIN dl USING (doc_id) JOIN dfq USING (word) CROSS JOIN stats),
       |pt AS (SELECT DISTINCT doc_id AS probe_id, word
       |       FROM (SELECT doc_id, unnest(${wordsSql("text")}) AS word
       |             FROM documents WHERE $probeFilter)),
       |bm AS (SELECT probe_id, wt.doc_id, count(*) AS n_matched, CAST(sum(wu) AS BIGINT) AS score_u
       |       FROM pt JOIN wt USING (word) GROUP BY 1, 2)""".stripMargin

  /** Reciprocal-rank fusion of two rankings over (probe_id, doc_id):
    * `rrf = Σ_systems 1/(k0 + rank)`, absent side contributing 0 —
    * the standard hybrid-retrieval combiner (Cormack et al. 2009),
    * fusing e.g. a lexical and an overlap/embedding ranking without
    * score calibration. Both inputs must carry integer rank columns;
    * the two divisions and one fixed-order add are the only double
    * arithmetic, so the fused score hash-gates. Union semantics via a
    * key-equi full outer join; per-probe top-k ties break to the lower
    * doc_id.
    */
  def rrfFuse(a: DataFrame, rankACol: String, b: DataFrame, rankBCol: String,
              k0: Int, k: Int): DataFrame = {
    val rrf = coalesce(lit(1.0) / (lit(k0) + col(rankACol)), lit(0.0)) +
      coalesce(lit(1.0) / (lit(k0) + col(rankBCol)), lit(0.0))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("rrf").desc, col("doc_id"))
    a.join(b, Seq("probe_id", "doc_id"), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
