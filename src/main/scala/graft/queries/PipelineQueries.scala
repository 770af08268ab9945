package graft.queries

import graft.Tables
import graft.functions.Hashing
import graft.operators.{Artifacts, Curation, Dedup, Retrieval, Sampling, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Training-data pipeline queries (dedup / similarity / text analysis)
  * plus the W4 rule-fallback cascade. Every oracle below is GENERATED
  * from the same constants as the Spark side (Hashing.*Sql twins), so the
  * two engines compute literally the same arithmetic — including fold
  * order for doubles.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame
  import Hashing._

  private val N = 5 // word-shingle width for dedup
  private val Dim = 64 // embedding dimension (FIXTURES.md)

  /** Oracle CTE prelude: distinct 5-gram shingles per doc, reduced to
    * their 60-bit stable hashes (mirroring `Dedup.docShingleHashes` —
    * Spark joins on the 8-byte hash, so the oracle must hash with the
    * SAME function to agree even on collisions) → pairwise Jaccard
    * (`exact`). With `cap` set, stop-shingles above the document
    * frequency cap are pruned BEFORE sizes/intersections — same pruned
    * universe for both numerator and denominator.
    */
  private def shingleCte(cap: Option[Int] = None): String = {
    val hashedList = s"list_transform(${shinglesSql("w", N)}, s -> ${stableHash60Sql("s")} % ${P}::BIGINT)"
    val poolCtes = cap match {
      case Some(c) =>
        s"""sh0 AS (SELECT doc_id, unnest($hashedList) AS sh_h FROM w),
           |keep AS (SELECT sh_h FROM sh0 GROUP BY sh_h HAVING count(*) <= $c),
           |sh AS (SELECT doc_id, sh_h FROM sh0 JOIN keep USING (sh_h))""".stripMargin
      case None =>
        s"sh AS (SELECT doc_id, unnest($hashedList) AS sh_h FROM w)"
    }
    s"""w AS (SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
       |$poolCtes,
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
       |          FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |exact AS (SELECT da AS doc_a, db AS doc_b, i / (sa.n_sh + sb.n_sh - i) AS jaccard
       |          FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id)""".stripMargin
  }

  // ---------------------------------------------------------------- exact dedup
  val dedupExact: Q = (s, d) =>
    Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS canonical_id
      |FROM documents GROUP BY 1""".stripMargin

  /** Exact dedup after unaccent/case/whitespace normalization — the
    * F1 expression doing corpus-scale work (near-exact dup detection
    * that survives trivial reformatting).
    */
  val dedupNormExact: Q = (s, d) =>
    Dedup.exactGroups(
      Tables.documents(s, d).withColumn("text", graft.functions.Normalize.norm(col("text"))),
      "doc_id", "text")
  val dedupNormExactSql: String =
    """SELECT md5(trim(regexp_replace(lower(strip_accents(text)), '\s+', ' ', 'g'))) AS text_hash,
      |       count(*) AS n_docs, min(doc_id) AS canonical_id
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- n-gram Jaccard
  val dedupNgram: Q = (s, d) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", N, 0.5,
      maxShingleDf = Some(Dedup.DefaultMaxShingleDf))
  val dedupNgramSql: String =
    s"""WITH ${shingleCte(cap = Some(Dedup.DefaultMaxShingleDf))}
       |SELECT doc_a, doc_b, jaccard FROM exact WHERE jaccard >= 0.5""".stripMargin

  // ---------------------------------------------------------------- minhash LSH
  val dedupMinhash: Q = (s, d) =>
    Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text", N, 0.5)
  val dedupMinhashSql: String = {
    val bandSelects = (0 until NumBands).map { b =>
      val key = (0 until BandRows)
        .map(r => s"CAST(sig[${b * BandRows + r + 1}] AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band_idx, $key AS band_key FROM sig"
    }.mkString("\n UNION ALL ")
    s"""WITH ${shingleCte()},
       |shl AS (SELECT doc_id, ${shinglesSql("w", N)} AS sh FROM w),
       |hs AS (SELECT doc_id, list_transform(sh, s -> ${stableHash60Sql("s")} % ${P}::BIGINT) AS hs,
       |              len(sh) AS nsh FROM shl),
       |sig AS (SELECT doc_id, ${minhashSignatureSql("hs")} AS sig FROM hs WHERE nsh > 0),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM cand JOIN exact USING (doc_a, doc_b)
       |WHERE jaccard >= 0.5""".stripMargin
  }

  /** Measured candidate quality of the MinHash-LSH rung at TWO
    * operating points of the S-curve: at the 0.5 dedup threshold the
    * band geometry should catch everything (recall 1.0), at 0.005 it
    * should correctly MISS the far pairs (recall < 1 — a report that
    * can only ever read 1.0 could not detect a broken band). The
    * dedup analog of q_ann_recall's measured ladder.
    */
  private val RecallThresholds = Seq(5000, 50) // basis points
  val dedupRecall: Q = (s, d) =>
    Dedup.lshRecallReportAt(Tables.documents(s, d), "doc_id", "text", N, RecallThresholds)
  val dedupRecallSql: String = {
    val bandSelects = (0 until NumBands).map { b =>
      val key = (0 until BandRows)
        .map(r => s"CAST(sig[${b * BandRows + r + 1}] AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band_idx, $key AS band_key FROM sig"
    }.mkString("\n UNION ALL ")
    s"""WITH ${shingleCte()},
       |shl AS (SELECT doc_id, ${shinglesSql("w", N)} AS sh FROM w),
       |hs AS (SELECT doc_id, list_transform(sh, s -> ${stableHash60Sql("s")} % ${P}::BIGINT) AS hs,
       |              len(sh) AS nsh FROM shl),
       |sig AS (SELECT doc_id, ${minhashSignatureSql("hs")} AS sig FROM hs WHERE nsh > 0),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |thr AS (SELECT unnest(ARRAY[${RecallThresholds.mkString(", ")}]) AS threshold_bp),
       |gt AS (SELECT t.threshold_bp, e.doc_a, e.doc_b
       |       FROM exact e JOIN thr t ON e.jaccard >= t.threshold_bp / 10000.0),
       |hit AS (SELECT gt.threshold_bp, gt.doc_a, gt.doc_b FROM gt JOIN cand USING (doc_a, doc_b)),
       |counts AS (SELECT t.threshold_bp,
       |                  (SELECT count(*) FROM gt WHERE gt.threshold_bp = t.threshold_bp) AS n_truth,
       |                  (SELECT count(*) FROM cand) AS n_cand,
       |                  (SELECT count(*) FROM hit WHERE hit.threshold_bp = t.threshold_bp) AS n_hit
       |           FROM thr t)
       |SELECT CAST(threshold_bp AS BIGINT) AS threshold_bp,
       |       CAST(n_truth AS BIGINT) AS n_truth, CAST(n_cand AS BIGINT) AS n_cand,
       |       CAST(n_hit AS BIGINT) AS n_hit,
       |       CAST(CASE WHEN n_truth > 0 THEN n_hit * 1000000000 // n_truth ELSE 0 END AS BIGINT) AS recall_ppb,
       |       CAST(CASE WHEN n_cand > 0 THEN n_hit * 1000000000 // n_cand ELSE 0 END AS BIGINT) AS precision_ppb
       |FROM counts""".stripMargin
  }

  // ---------------------------------------------------------------- vocabulary
  /** Top-25 corpus words. The oracle's ORDER BY mirrors the exact
    * (n desc, word) tiebreak so the LIMIT boundary is deterministic on
    * both engines.
    */
  val vocabTopK: Q = (s, d) =>
    TextAnalysis.topWords(Tables.documents(s, d), "text", 25)
  val vocabTopKSql: String =
    s"""SELECT word, count(*) AS n
       |FROM (SELECT unnest(${wordsSql("text")}) AS word FROM documents)
       |GROUP BY 1 ORDER BY n DESC, word LIMIT 25""".stripMargin

  // ---------------------------------------------------------------- decontamination
  // 4-grams: on this corpus 3-grams are too generic (every doc matches
  // every probe) and 5-grams nearly never overlap — 4 discriminates.
  private val DecontamN = 4
  /** Corpus docs sharing >= 1 word 4-gram with a held-out probe set
    * (doc_id % 10 == 0 — 10% of docs), with the shared-distinct-n-gram
    * count per (doc, probe) pair.
    */
  val decontaminate: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    Dedup.contaminationPairs(
      doc.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      doc.filter(col("doc_id") % 10 === 0), "doc_id", "text", DecontamN)
  }
  /** Shared oracle CTE chain `w0/sh0/keep/sh/psh/cont` — the df-capped
    * shared-shingle pair counts between the corpus (doc_id % 10 <> 0)
    * and probe (doc_id % 10 = 0) halves. ONE definition of "overlap
    * positive" for q_decontaminate, q_rrf_fusion and q_pair_mining —
    * a cap or hashing change propagates to all three or none.
    */
  private def contaminationCtes: String = {
    val hashedList =
      s"list_transform(${shinglesSql("w", DecontamN)}, s -> ${stableHash60Sql("s")} % ${P}::BIGINT)"
    s"""w0 AS (SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
       |sh0 AS (SELECT doc_id, unnest($hashedList) AS sh_h FROM w0 WHERE doc_id % 10 <> 0),
       |keep AS (SELECT sh_h FROM sh0 GROUP BY sh_h HAVING count(*) <= ${Dedup.DefaultMaxShingleDf}),
       |sh AS (SELECT doc_id, sh_h FROM sh0 JOIN keep USING (sh_h)),
       |psh AS (SELECT doc_id AS probe_id, unnest($hashedList) AS sh_h FROM w0 WHERE doc_id % 10 = 0),
       |cont AS (SELECT sh.doc_id, psh.probe_id, count(*) AS n_shared
       |         FROM sh JOIN psh USING (sh_h) GROUP BY 1, 2)""".stripMargin
  }

  val decontaminateSql: String =
    s"""WITH $contaminationCtes
       |SELECT doc_id, probe_id, n_shared FROM cont""".stripMargin

  /** Longest contaminated span per (corpus doc, probe) — the
    * passage-level signal next to the gram-count signal of
    * q_decontaminate (same 4-grams, same df cap, same probe set).
    */
  val contamSpan: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    Dedup.contaminationSpans(
      doc.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      doc.filter(col("doc_id") % 10 === 0), "doc_id", "text", DecontamN)
  }
  val contamSpanSql: String = {
    val nGramList = ngramsSql("ws", DecontamN)
    val probeList =
      s"list_transform(${shinglesSql("ws", DecontamN)}, s -> ${stableHash60Sql("s")} % ${P}::BIGINT)"
    s"""WITH w AS (SELECT doc_id, ${wordsSql("text")} AS ws FROM documents),
       |cg AS (SELECT doc_id,
       |              unnest(range(1, len(ws) - ${DecontamN - 2})) AS pos,
       |              unnest($nGramList) AS gram
       |       FROM w WHERE doc_id % 10 <> 0),
       |cgh AS (SELECT doc_id, pos, ${stableHash60Sql("gram")} % ${P}::BIGINT AS sh_h FROM cg),
       |dfk AS (SELECT sh_h FROM (SELECT DISTINCT doc_id, sh_h FROM cgh)
       |        GROUP BY sh_h HAVING count(*) <= ${Dedup.DefaultMaxShingleDf}),
       |kept AS (SELECT cgh.doc_id, cgh.pos, cgh.sh_h FROM cgh JOIN dfk USING (sh_h)),
       |psh AS (SELECT doc_id AS probe_id, unnest($probeList) AS sh_h
       |        FROM w WHERE doc_id % 10 = 0),
       |m AS (SELECT DISTINCT doc_id, probe_id, pos FROM kept JOIN psh USING (sh_h)),
       |isl AS (SELECT doc_id, probe_id,
       |               pos - row_number() OVER (PARTITION BY doc_id, probe_id ORDER BY pos) AS island
       |        FROM m),
       |runs AS (SELECT doc_id, probe_id, island, count(*) AS run FROM isl GROUP BY 1, 2, 3)
       |SELECT doc_id, probe_id,
       |       CAST(sum(run) AS BIGINT) AS n_shared_pos,
       |       CAST(max(run) AS BIGINT) AS max_run,
       |       CAST(max(run) + ${DecontamN - 1} AS BIGINT) AS span_words
       |FROM runs GROUP BY 1, 2""".stripMargin
  }

  /** C4-rule repeated spans (minDf = 2): every maximal run of corpus
    * positions whose 4-gram occurs in ≥ 2 docs — the passages a
    * cleaning pass strips. Same gram universe as q_contam_span.
    */
  val repeatedSpan: Q = (s, d) =>
    Dedup.repeatedSpans(Tables.documents(s, d), "doc_id", "text", DecontamN, minDf = 2)
  val repeatedSpanSql: String = {
    val nGramList = ngramsSql("ws", DecontamN)
    s"""WITH w AS (SELECT doc_id, ${wordsSql("text")} AS ws FROM documents),
       |cg AS (SELECT doc_id,
       |              unnest(range(1, len(ws) - ${DecontamN - 2})) AS pos,
       |              unnest($nGramList) AS gram
       |       FROM w),
       |cgh AS (SELECT doc_id, pos, ${stableHash60Sql("gram")} % ${P}::BIGINT AS sh_h FROM cg),
       |hot AS (SELECT sh_h FROM (SELECT DISTINCT doc_id, sh_h FROM cgh)
       |        GROUP BY sh_h HAVING count(*) >= 2),
       |k AS (SELECT doc_id, pos FROM cgh JOIN hot USING (sh_h)),
       |isl AS (SELECT doc_id, pos,
       |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |        FROM k)
       |SELECT doc_id, CAST(min(pos) - 1 AS BIGINT) AS start_pos,
       |       CAST(count(*) + ${DecontamN - 1} AS BIGINT) AS span_words
       |FROM isl GROUP BY doc_id, island""".stripMargin
  }

  // ---------------------------------------------------------------- retrieval
  private val Bm25K = 5
  private val RrfK0 = 60
  private val RrfK = 5

  /** BM25 top-k retrieval: the held-out probe docs (doc_id % 10 == 0,
    * the q_decontaminate probe set) query the corpus — the retrieval
    * triage next to decontamination's overlap counting.
    */
  val bm25Retrieve: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    Retrieval.bm25TopK(doc.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      doc.filter(col("doc_id") % 10 === 0), "doc_id", "text", Bm25K)
  }
  val bm25RetrieveSql: String =
    s"""WITH ${Retrieval.bm25PairsCte("doc_id % 10 <> 0", "doc_id % 10 = 0")}
       |SELECT probe_id, doc_id, n_matched, score_u, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY score_u DESC, doc_id) AS rk FROM bm)
       |WHERE rk <= $Bm25K""".stripMargin

  /** BM25 from a PERSISTED index with an incremental delta: build the
    * tf artifact from two thirds of the corpus, append the last third
    * as a delta batch (one tokenize pass over the delta only), then
    * score the probe set from the LOADED artifact. The oracle
    * recomputes BM25 over the full corpus from raw text — so the gate
    * proves save → append → load → score ≡ recompute, cross-engine.
    */
  val bm25Artifact: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val corpus = doc.filter(col("doc_id") % 10 =!= 0)
    val probes = doc.filter(col("doc_id") % 10 === 0)
    val path = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toFile.getAbsolutePath
    Artifacts.saveBm25Index(corpus.filter(col("doc_id") % 3 =!= 1), "doc_id", "text", path)
    Artifacts.appendBm25Delta(corpus.filter(col("doc_id") % 3 === 1), "doc_id", "text", path)
    Artifacts.bm25TopKFromIndex(s, path, probes, "doc_id", "text", Bm25K)
  }
  val bm25ArtifactSql: String = bm25RetrieveSql

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 ranking with
    * the shared-4-gram contamination ranking over the same (probe,
    * corpus doc) space — the calibration-free combiner for rankings
    * whose raw scores are incomparable.
    */
  /** The two scored (probe, corpus doc) pair tables every retrieval
    * consumer shares, one materialization per (snapshot, context) —
    * q_bm25_topk and q_decontaminate, the builds, still compute fresh.
    * See [[memoized]].
    */
  private def bm25PairTable(s: SparkSession, d: String): DataFrame =
    memoized("bm25_pairs", s, d) {
      val doc = Tables.documents(s, d)
      Retrieval.bm25Pairs(doc.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        doc.filter(col("doc_id") % 10 === 0), "doc_id", "text").localCheckpoint(true)
    }
  private def contamPairTable(s: SparkSession, d: String): DataFrame =
    memoized("contam_pairs", s, d) {
      val doc = Tables.documents(s, d)
      Dedup.contaminationPairs(doc.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        doc.filter(col("doc_id") % 10 === 0), "doc_id", "text", DecontamN).localCheckpoint(true)
    }

  val rrfFusion: Q = (s, d) => {
    val wBm = Window.partitionBy(col("probe_id")).orderBy(col("score_u").desc, col("doc_id"))
    val bm = bm25PairTable(s, d)
      .select(col("probe_id"), col("doc_id"), row_number().over(wBm).as("r_bm25"))
    val wNg = Window.partitionBy(col("probe_id")).orderBy(col("n_shared").desc, col("doc_id"))
    val ng = contamPairTable(s, d)
      .select(col("probe_id"), col("doc_id"), row_number().over(wNg).as("r_ngram"))
    Retrieval.rrfFuse(bm, "r_bm25", ng, "r_ngram", RrfK0, RrfK)
  }
  val rrfFusionSql: String = {
    s"""WITH ${Retrieval.bm25PairsCte("doc_id % 10 <> 0", "doc_id % 10 = 0")},
       |$contaminationCtes,
       |ra AS (SELECT probe_id, doc_id,
       |              CAST(row_number() OVER (PARTITION BY probe_id ORDER BY score_u DESC, doc_id) AS INTEGER) AS r_bm25
       |       FROM bm),
       |rb AS (SELECT probe_id, doc_id,
       |              CAST(row_number() OVER (PARTITION BY probe_id ORDER BY n_shared DESC, doc_id) AS INTEGER) AS r_ngram
       |       FROM cont),
       |f AS (SELECT coalesce(ra.probe_id, rb.probe_id) AS probe_id,
       |             coalesce(ra.doc_id, rb.doc_id) AS doc_id, r_bm25, r_ngram,
       |             coalesce(1.0 / ($RrfK0 + r_bm25), 0.0) + coalesce(1.0 / ($RrfK0 + r_ngram), 0.0) AS rrf
       |      FROM ra FULL OUTER JOIN rb ON ra.probe_id = rb.probe_id AND ra.doc_id = rb.doc_id)
       |SELECT probe_id, doc_id, r_bm25, r_ngram, rrf, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY rrf DESC, doc_id) AS rk FROM f)
       |WHERE rk <= $RrfK""".stripMargin
  }

  /** Contrastive training-pair mining — the DPR recipe (Karpukhin et
    * al. 2020): each probe "query" gets its POSITIVE from the overlap
    * supervision signal (top shared-4-gram corpus doc) and its HARD
    * NEGATIVE as the highest-BM25 corpus doc that is NOT the positive
    * — lexically close enough to fool a retriever, known-wrong by the
    * supervision. Probes with no overlapping corpus doc mine nothing;
    * probes whose BM25 candidates are exhausted by the positive emit a
    * null negative. Both rankings reuse the audited bounded machinery
    * (df-capped shingle join, stop-term-capped BM25), and both top-1
    * picks are per-probe windows over already-capped candidate sets.
    */
  val pairMining: Q = (s, d) => {
    val wPos = Window.partitionBy(col("probe_id")).orderBy(col("n_shared").desc, col("doc_id"))
    val pos = contamPairTable(s, d)
      .withColumn("_rn", row_number().over(wPos)).filter(col("_rn") === 1)
      .select(col("probe_id"), col("doc_id").as("pos_id"), col("n_shared"))
    val wBm = Window.partitionBy(col("probe_id")).orderBy(col("score_u").desc, col("doc_id"))
    val hard = bm25PairTable(s, d)
      .join(pos.select("probe_id", "pos_id"), Seq("probe_id"))
      .filter(col("doc_id") =!= col("pos_id"))
      .withColumn("_rn", row_number().over(wBm)).filter(col("_rn") === 1)
      .select(col("probe_id"), col("doc_id").as("neg_id"), col("score_u").as("neg_score_u"))
    pos.join(hard, Seq("probe_id"), "left")
      .select(col("probe_id"), col("pos_id"), col("n_shared"),
        col("neg_id"), col("neg_score_u"))
  }
  val pairMiningSql: String = {
    s"""WITH ${Retrieval.bm25PairsCte("doc_id % 10 <> 0", "doc_id % 10 = 0")},
       |$contaminationCtes,
       |pos AS (SELECT probe_id, doc_id AS pos_id, n_shared FROM (
       |          SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY n_shared DESC, doc_id) AS rn
       |          FROM cont) WHERE rn = 1),
       |hard AS (SELECT probe_id, doc_id AS neg_id, score_u AS neg_score_u FROM (
       |           SELECT bm.probe_id, bm.doc_id, bm.score_u,
       |                  row_number() OVER (PARTITION BY bm.probe_id ORDER BY bm.score_u DESC, bm.doc_id) AS rn
       |           FROM bm JOIN pos USING (probe_id)
       |           WHERE bm.doc_id <> pos.pos_id) WHERE rn = 1)
       |SELECT p.probe_id, p.pos_id, p.n_shared, h.neg_id, h.neg_score_u
       |FROM pos p LEFT JOIN hard h USING (probe_id)""".stripMargin
  }

  // ---------------------------------------------------------------- PII redaction
  /** Synthetic contact lines built from customer (the fixture corpus
    * contains no PII-shaped strings, and a redaction oracle over text
    * that never matches would prove nothing): every third row gets an
    * email / phone / IPv4 respectively, built IDENTICALLY on both
    * engines, then scrubbed with the shared pattern chain.
    */
  val redact: Q = (s, d) => {
    val contact = concat(col("c_name"), lit(" can be reached at "),
      when(col("c_custkey") % 3 === 0,
        concat(lit("user"), col("c_custkey").cast("string"), lit("@example.com")))
        .when(col("c_custkey") % 3 === 1,
          concat(lit("+1 555-"), lpad((col("c_custkey") % 10000).cast("string"), 4, "0")))
        .otherwise(concat(lit("10."), (col("c_custkey") % 256).cast("string"),
          lit("."), (col("c_nationkey") % 256).cast("string"), lit(".7"))))
    Tables.customer(s, d)
      .select(col("c_custkey"), contact.as("contact"))
      .withColumn("redacted", TextAnalysis.redactPii(col("contact")))
  }
  val redactSql: String =
    s"""SELECT c_custkey, contact, ${TextAnalysis.redactPiiSql("contact")} AS redacted
       |FROM (SELECT c_custkey,
       |        c_name || ' can be reached at ' ||
       |        CASE WHEN c_custkey % 3 = 0 THEN 'user' || CAST(c_custkey AS VARCHAR) || '@example.com'
       |             WHEN c_custkey % 3 = 1 THEN '+1 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
       |             ELSE '10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' ||
       |                  CAST(c_nationkey % 256 AS VARCHAR) || '.7' END AS contact
       |      FROM customer)""".stripMargin

  // ---------------------------------------------------------------- dup clusters
  /** Connected components over the n-gram near-dup pairs; oracle is a
    * recursive-CTE transitive closure taking the min reachable id.
    */
  val dupClusters: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Dedup.duplicateClusters(docs, "doc_id",
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", N, 0.5,
        maxShingleDf = Some(Dedup.DefaultMaxShingleDf)))
  }
  /** One CC labeling per (snapshot, context) for the consumer queries
    * (yield report, leakage-safe split) — q_dup_clusters, the build,
    * still computes fresh. See [[memoized]].
    */
  private def dupClusterLabels(s: SparkSession, d: String): DataFrame =
    memoized("dup_cluster_labels", s, d) {
      val docs = Tables.documents(s, d)
      Dedup.duplicateClusters(docs, "doc_id",
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", N, 0.5,
          maxShingleDf = Some(Dedup.DefaultMaxShingleDf))).localCheckpoint(true)
    }
  val dupClustersSql: String =
    s"""WITH RECURSIVE ${shingleCte(cap = Some(Dedup.DefaultMaxShingleDf))},
       |pairs AS (SELECT doc_a, doc_b FROM exact WHERE jaccard >= 0.5),
       |und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |        UNION SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM und
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
       |labels AS (SELECT a AS doc_id, min(b) AS min_reach FROM reach GROUP BY 1)
       |SELECT d.doc_id, least(d.doc_id, coalesce(l.min_reach, d.doc_id)) AS component_id
       |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id""".stripMargin

  // ---------------------------------------------------------------- dedup yield
  /** What keep-one-per-cluster would save, by cluster size — the
    * report a curation run reads before committing a dedup pass.
    */
  val dedupYield: Q = (s, d) =>
    Dedup.yieldReport(Tables.documents(s, d), "doc_id", "text", dupClusterLabels(s, d))
  val dedupYieldSql: String =
    s"""WITH RECURSIVE ${shingleCte(cap = Some(Dedup.DefaultMaxShingleDf))},
       |pairs AS (SELECT doc_a, doc_b FROM exact WHERE jaccard >= 0.5),
       |und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |        UNION SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM und
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
       |labels AS (SELECT a AS doc_id, min(b) AS min_reach FROM reach GROUP BY 1),
       |comp AS (SELECT d.doc_id, least(d.doc_id, coalesce(l.min_reach, d.doc_id)) AS component_id
       |         FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
       |pc AS (SELECT component_id, count(*) AS size,
       |              CAST(sum(CASE WHEN c.doc_id != c.component_id
       |                            THEN length(d2.text) ELSE 0 END) AS BIGINT) AS dup_bytes
       |       FROM comp c JOIN documents d2 ON c.doc_id = d2.doc_id
       |       GROUP BY 1)
       |SELECT size, count(*) AS n_clusters,
       |       CAST(sum(size) - count(*) AS BIGINT) AS dup_docs,
       |       CAST(sum(dup_bytes) AS BIGINT) AS dup_bytes
       |FROM pc GROUP BY size""".stripMargin

  // ---------------------------------------------------------------- novelty
  /** Per-doc novel-gram ratio over the same 5-gram universe as the
    * dedup family.
    */
  val novelty: Q = (s, d) =>
    Dedup.noveltyProfile(Tables.documents(s, d), "doc_id", "text", N)
  val noveltySql: String = {
    val hashedList = s"list_transform(${shinglesSql("w", N)}, s -> ${stableHash60Sql("s")} % ${P}::BIGINT)"
    s"""WITH w AS (SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
       |sh AS (SELECT doc_id, unnest($hashedList) AS sh_h FROM w),
       |f AS (SELECT sh_h, min(doc_id) AS first_doc FROM sh GROUP BY 1)
       |SELECT sh.doc_id, count(*) AS n_grams,
       |       CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |       CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) / count(*) AS novelty
       |FROM sh JOIN f USING (sh_h) GROUP BY sh.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- incremental dedup
  /** Odd doc_ids are the arriving delta, even doc_ids the frozen
    * corpus — the each-crawl-against-everything-kept loop.
    */
  val incrementalDedup: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    Dedup.incrementalNearDups(
      doc.filter(col("doc_id") % 2 === 1), doc.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", N, 0.5, Some(Dedup.DefaultMaxShingleDf))
  }
  val incrementalDedupSql: String = {
    val hashedList = s"list_transform(${shinglesSql("w", N)}, s -> ${stableHash60Sql("s")} % ${P}::BIGINT)"
    s"""WITH w AS (SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
       |osh AS (SELECT doc_id AS old_id, unnest($hashedList) AS sh_h FROM w WHERE doc_id % 2 = 0),
       |nsh AS (SELECT doc_id AS new_id, unnest($hashedList) AS sh_h FROM w WHERE doc_id % 2 = 1),
       |stop AS (SELECT sh_h FROM osh GROUP BY sh_h HAVING count(*) > ${Dedup.DefaultMaxShingleDf}),
       |ok AS (SELECT old_id, sh_h FROM osh WHERE sh_h NOT IN (SELECT sh_h FROM stop)),
       |nk AS (SELECT new_id, sh_h FROM nsh WHERE sh_h NOT IN (SELECT sh_h FROM stop)),
       |sn AS (SELECT new_id, count(*) AS n_new FROM nk GROUP BY 1),
       |so AS (SELECT old_id, count(*) AS n_old FROM ok GROUP BY 1),
       |i AS (SELECT new_id, old_id, count(*) AS inter FROM nk JOIN ok USING (sh_h) GROUP BY 1, 2)
       |SELECT new_id, old_id, inter, n_new, n_old,
       |       inter / (n_new + n_old - inter) AS jaccard
       |FROM i JOIN sn USING (new_id) JOIN so USING (old_id)
       |WHERE inter / (n_new + n_old - inter) >= 0.5""".stripMargin
  }

  // ---------------------------------------------------------------- vocab coverage
  private val VocabCoverV = 100
  val vocabCover: Q = (s, d) =>
    TextAnalysis.vocabCoverage(Tables.documents(s, d), "doc_id", "text", VocabCoverV)
  val vocabCoverSql: String =
    TextAnalysis.vocabCoverageSql("documents", "text", VocabCoverV)

  // ---------------------------------------------------------------- containment
  /** Asymmetric containment pairs at 0.8 — quote/subset duplication the
    * symmetric Jaccard sweep misses (a short doc pasted into a long one).
    */
  private val ContainThreshold = 0.8
  val containment: Q = (s, d) =>
    Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text", N, ContainThreshold,
      Some(Dedup.DefaultMaxShingleDf))
  val containmentSql: String =
    s"""WITH ${shingleCte(cap = Some(Dedup.DefaultMaxShingleDf))}
       |SELECT da AS doc_a, db AS doc_b, i AS inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       |       i / sa.n_sh AS cont_a_in_b, i / sb.n_sh AS cont_b_in_a
       |FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
       |WHERE greatest(i / sa.n_sh, i / sb.n_sh) >= $ContainThreshold""".stripMargin

  // ------------------------------------------------------- leakage-safe split
  /** Contamination-safe train/eval/test split: the split key is the
    * near-dup CLUSTER representative, not the document id — so a
    * document and its near-duplicates land on the SAME side by
    * construction. Splitting by doc_id (q_train_split) is the classic
    * eval-leakage bug: ~5% of this corpus sits in multi-doc clusters,
    * and a plain hash split routinely strands one copy of a pair in
    * train and its near-duplicate in test, where it scores as
    * memorization. Same deterministic hash-range machinery as
    * q_train_split ([[Sampling.split]]), same cluster labels as
    * q_dup_clusters — composed, the leak is structurally impossible
    * (SamplingSpec asserts no cluster spans two splits).
    */
  val splitByCluster: Q = (s, d) =>
    Sampling.split(dupClusterLabels(s, d), col("component_id"),
        Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
      .select("doc_id", "component_id", "split")
  val splitByClusterSql: String =
    s"""WITH RECURSIVE ${shingleCte(cap = Some(Dedup.DefaultMaxShingleDf))},
       |pairs AS (SELECT doc_a, doc_b FROM exact WHERE jaccard >= 0.5),
       |und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |        UNION SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM und
       |  UNION
       |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
       |labels AS (SELECT a AS doc_id, min(b) AS min_reach FROM reach GROUP BY 1),
       |comp AS (SELECT d.doc_id, least(d.doc_id, coalesce(l.min_reach, d.doc_id)) AS component_id
       |         FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
       |SELECT doc_id, component_id,
       |       CASE WHEN slot < 8000 THEN 'train'
       |            WHEN slot < 9000 THEN 'eval'
       |            ELSE 'test' END AS split
       |FROM (SELECT doc_id, component_id,
       |             ${stableHash60Sql("CAST(component_id AS VARCHAR)")} % 10000 AS slot
       |      FROM comp)""".stripMargin

  // ---------------------------------------------------------------- simhash
  // 7 = chunks-1, the losslessness ceiling for the 8×12 banding; on the
  // 96-bit fingerprint this is comparable tolerance to the old 5-of-48.
  private val SimMaxHamming = 7
  val dedupSimhash: Q = (s, d) =>
    Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", SimMaxHamming)
  /** Brute-force O(n²) oracle over the SAME 96-bit two-word fingerprint
    * (sim_lo from md5 hex 1-12, sim_hi from 13-24) — the banding is a
    * candidate filter, provably lossless for maxHamming < chunks, so the
    * banded Spark plan and the unbanded oracle must agree exactly.
    */
  val dedupSimhashSql: String = {
    val sumCols = ("count(*) AS n" +: (0 until SimhashWordBits).flatMap(b => Seq(
      s"sum(${simBitValueSql("h0", b)}) AS a$b",
      s"sum(${simBitValueSql("h1", b)}) AS b$b"))).mkString(", ")
    val loExpr = simhashFromBitSumsSql((0 until SimhashWordBits).map(b => s"a$b"), "n")
    val hiExpr = simhashFromBitSumsSql((0 until SimhashWordBits).map(b => s"b$b"), "n")
    s"""WITH wx AS (SELECT doc_id, unnest(${wordsSql("text")}) AS word FROM documents),
       |h AS (SELECT doc_id, ${stableHash48Sql("word", 0)} AS h0,
       |             ${stableHash48Sql("word", 1)} AS h1 FROM wx),
       |votes AS (SELECT doc_id, $sumCols FROM h GROUP BY 1),
       |sim AS (SELECT doc_id, $loExpr AS sim_lo, $hiExpr AS sim_hi FROM votes)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.sim_lo, b.sim_lo)) + bit_count(xor(a.sim_hi, b.sim_hi)) AS INTEGER) AS hamming
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim_lo, b.sim_lo)) + bit_count(xor(a.sim_hi, b.sim_hi)) <= $SimMaxHamming""".stripMargin
  }

  /** SimHash banding COST profile — the knob q_dedup_simhash's
    * losslessness gate doesn't measure. For two pigeonhole
    * decompositions of the same 96-bit fingerprint (8 chunks × 12 bits
    * and 12 × 8, both lossless at hamming ≤ 7): the bucket-population
    * statistics and the EXACT pair-generation workload Σ C(c,2) each
    * banding would feed its join — computed from bucket sizes alone,
    * never by materializing the (skew-quadratic) pairs; the fixture's
    * low-entropy chunks cluster hard (max bucket ~1.2k of 5k docs at
    * sf0.1 for 12×8, 9.5M generated pairs vs 1.9M for 8×12 — the
    * narrow-chunk scheme pays 5× the join work for the same recall,
    * exactly the trade this report exists to quantify before a 100×
    * corpus turns the hot bucket quadratic). `truth_pairs` (identical
    * on both rows) is the true ≤-7 pair count via the cheaper lossless
    * banding: pair keys only through the join, distinct, then the
    * 1-row-per-doc fingerprint table broadcasts back for the hamming
    * check. The oracle recomputes the bucket algebra AND brute-forces
    * the truth O(n²), so both the workload arithmetic and the
    * losslessness sit on the hash gate.
    */
  private val SimSchemes = Seq(8, 12)
  /** One fingerprint table per (snapshot, context) for the eval —
    * q_dedup_simhash, the build, still computes fresh. See [[memoized]].
    */
  private def simhashTable(s: SparkSession, d: String): DataFrame =
    memoized("simhash_fps", s, d) {
      Dedup.withSimhash(Tables.documents(s, d), "doc_id", "text").localCheckpoint(true)
    }
  val simhashSelectivity: Q = (s, d) => {
    val sims = simhashTable(s, d) // both bandings + the truth read one fingerprint table
    val banded8 = Dedup.simhashBands(sims, SimSchemes.head).select("doc_id", "chunk_idx", "chunk_val")
    val truth = banded8.as("a").join(banded8.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .join(broadcast(sims.select(col("doc_id").as("doc_a"),
        col("sim_lo").as("lo_a"), col("sim_hi").as("hi_a"))), Seq("doc_a"))
      .join(broadcast(sims.select(col("doc_id").as("doc_b"),
        col("sim_lo").as("lo_b"), col("sim_hi").as("hi_b"))), Seq("doc_b"))
      .filter(expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)") <= SimMaxHamming)
      .agg(count(lit(1)).as("truth_pairs"))
    SimSchemes.map { chunks =>
      Dedup.simhashBands(sims, chunks)
        .groupBy("chunk_idx", "chunk_val").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_buckets"), max(col("c")).as("max_bucket"),
          sum(expr("c * (c - 1) div 2")).cast("long").as("gen_pairs"))
        .crossJoin(broadcast(truth)) // 1-row broadcast scalar attach, never a data-path cartesian
        .select(lit(chunks.toLong).as("chunks"),
          lit((SimhashWordBits * 2 / chunks).toLong).as("chunk_bits"),
          col("n_buckets"), col("max_bucket"), col("gen_pairs"), col("truth_pairs"),
          when(col("gen_pairs") > 0, expr("truth_pairs * 1000000000 div gen_pairs"))
            .otherwise(0L).as("yield_ppb"))
    }.reduce(_ unionAll _)
  }
  val simhashSelectivitySql: String = {
    val sumCols = ("count(*) AS n" +: (0 until SimhashWordBits).flatMap(b => Seq(
      s"sum(${simBitValueSql("h0", b)}) AS a$b",
      s"sum(${simBitValueSql("h1", b)}) AS b$b"))).mkString(", ")
    val loExpr = simhashFromBitSumsSql((0 until SimhashWordBits).map(b => s"a$b"), "n")
    val hiExpr = simhashFromBitSumsSql((0 until SimhashWordBits).map(b => s"b$b"), "n")
    def bandsCte(chunks: Int): String = {
      val perWord = chunks / 2
      val width = SimhashWordBits / perWord
      val mask = (1L << width) - 1
      (0 until chunks).map { c =>
        val word = if (c < perWord) "sim_lo" else "sim_hi"
        s"SELECT doc_id, $c AS ci, ($word >> ${(c % perWord) * width}) & $mask AS cv FROM sim"
      }.mkString("\n UNION ALL ")
    }
    def schemeSelect(chunks: Int): String =
      s"""SELECT CAST($chunks AS BIGINT) AS chunks,
         |       CAST(${SimhashWordBits * 2 / chunks} AS BIGINT) AS chunk_bits,
         |       count(*) AS n_buckets, CAST(max(c) AS BIGINT) AS max_bucket,
         |       CAST(sum(c * (c - 1) // 2) AS BIGINT) AS gen_pairs,
         |       (SELECT t FROM truth) AS truth_pairs,
         |       CASE WHEN sum(c * (c - 1) // 2) > 0
         |            THEN CAST((SELECT t FROM truth) * 1000000000 // sum(c * (c - 1) // 2) AS BIGINT)
         |            ELSE 0 END AS yield_ppb
         |FROM (SELECT ci, cv, CAST(count(*) AS BIGINT) AS c FROM bands$chunks GROUP BY 1, 2)""".stripMargin
    s"""WITH wx AS (SELECT doc_id, unnest(${wordsSql("text")}) AS word FROM documents),
       |h AS (SELECT doc_id, ${stableHash48Sql("word", 0)} AS h0,
       |             ${stableHash48Sql("word", 1)} AS h1 FROM wx),
       |votes AS (SELECT doc_id, $sumCols FROM h GROUP BY 1),
       |sim AS (SELECT doc_id, $loExpr AS sim_lo, $hiExpr AS sim_hi FROM votes),
       |bands8 AS (${bandsCte(8)}),
       |bands12 AS (${bandsCte(12)}),
       |truth AS (SELECT count(*) AS t FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |          WHERE bit_count(xor(a.sim_lo, b.sim_lo)) + bit_count(xor(a.sim_hi, b.sim_hi)) <= $SimMaxHamming)
       |${schemeSelect(8)}
       |UNION ALL
       |${schemeSelect(12)}""".stripMargin
  }

  // ---------------------------------------------------------------- text analysis
  val tokenCount: Q = (s, d) =>
    TextAnalysis.withTokenCounts(Tables.documents(s, d), "doc_id", "text")
  val tokenCountSql: String =
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_re_tokens,
      |       CAST(length(text) AS INTEGER) AS n_chars
      |FROM documents""".stripMargin

  val qualityScore: Q = (s, d) =>
    TextAnalysis.withQualityScore(Tables.documents(s, d), "doc_id", "text")
  val qualityScoreSql: String = {
    val stop = TextAnalysis.markerCountSql("w", TextAnalysis.EnStopwords)
    s"""SELECT doc_id, n_words, distinct_ratio, mean_word_len, stop_ratio,
       |       distinct_ratio * 0.5 + stop_ratio * 0.25 +
       |         CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 8.0 THEN 0.25 ELSE 0.0 END AS quality_score
       |FROM (SELECT doc_id,
       |        CAST(len(w) AS INTEGER) AS n_words,
       |        CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio,
       |        CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS mean_word_len,
       |        CAST($stop AS DOUBLE) / len(w) AS stop_ratio
       |      FROM (SELECT doc_id, text, ${wordsSql("text")} AS w FROM documents))""".stripMargin
  }

  /** Gopher-style hard rule gate next to the soft quality score.
    * Bounds chosen to discriminate on this corpus (word counts 10..99,
    * mean word lengths 3.7..5.3): each rule passes some docs and fails
    * others, so the gate's joint selectivity is non-vacuous under the
    * oracle.
    */
  private val GopherMinWords = 30L
  private val GopherMaxWords = 80L
  private val GopherMinMeanLen = 4L
  private val GopherMaxMeanLen = 5L
  private val GopherRepDen = 8L
  private val GopherMinStop = 2L
  val gopherRules: Q = (s, d) =>
    TextAnalysis.gopherRules(Tables.documents(s, d), "doc_id", "text",
      GopherMinWords, GopherMaxWords, GopherMinMeanLen, GopherMaxMeanLen,
      GopherRepDen, GopherMinStop)
  val gopherRulesSql: String =
    TextAnalysis.gopherRulesSql("documents", "doc_id", "text",
      GopherMinWords, GopherMaxWords, GopherMinMeanLen, GopherMaxMeanLen,
      GopherRepDen, GopherMinStop)

  val langId: Q = (s, d) =>
    TextAnalysis.withLangId(Tables.documents(s, d), "doc_id", "text")
  val langIdSql: String = {
    val scores = TextAnalysis.LangMarkers.map { case (lang, set) =>
      s"${TextAnalysis.markerCountSql("w", set)} AS s_$lang"
    }.mkString(", ")
    val best = "greatest(" + TextAnalysis.LangMarkers.map(m => s"s_${m._1}").mkString(", ") + ")"
    val pred = TextAnalysis.LangMarkers.foldRight("'und'") { case ((lang, _), acc) =>
      s"CASE WHEN s_$lang = best AND best > 0 THEN '$lang' ELSE $acc END"
    }
    s"""SELECT doc_id, $pred AS pred_lang
       |FROM (SELECT doc_id, $best AS best, * FROM
       |  (SELECT doc_id, $scores FROM (SELECT doc_id, ${wordsSql("text")} AS w FROM documents)))""".stripMargin
  }

  /** Script-range language ID — the classifier that separates zh/ja/ko
    * where marker words can't see script: per-script code-point ppm
    * over a six-script fixture battery (Latin, Han, Han+kana, Hangul,
    * Cyrillic, Arabic), dominant script by first-max, lang by the
    * documented thresholds. The oracle recomputes every count with its
    * OWN regexp ranges (`\x{4E00}-\x{9FFF}` etc.) — two independent
    * script classifiers under one hash gate, the `q_unicode_norm`
    * cross-check posture.
    */
  val scriptId: Q = (s, d) => {
    val idx = pmod(col("doc_id"), lit(6))
    val num = (col("doc_id") % 97).cast("string")
    val text = when(idx === 0, concat(lit("the quick brown fox number "), num))
      .when(idx === 1, concat(lit("中文语料质量检测第"), num, lit("篇")))
      .when(idx === 2, concat(lit("日本語のテキストです第"), num, lit("回")))
      .when(idx === 3, concat(lit("한국어 말뭉치 문서 "), num))
      .when(idx === 4, concat(lit("Русский текст номер "), num))
      .otherwise(concat(lit("نص عربي رقم "), num))
    Tables.documents(s, d).select("doc_id")
      .withColumn("p", graft.functions.CodeOps.scriptProfile(text))
      .select(col("doc_id"), col("p.n_cp").as("n_cp"),
        col("p.latin_ppm").as("latin_ppm"), col("p.han_ppm").as("han_ppm"),
        col("p.kana_ppm").as("kana_ppm"), col("p.hangul_ppm").as("hangul_ppm"),
        col("p.cyrillic_ppm").as("cyrillic_ppm"), col("p.arabic_ppm").as("arabic_ppm"),
        col("p.digit_ppm").as("digit_ppm"), col("p.other_ppm").as("other_ppm"),
        col("p.script").as("script"), col("p.lang").as("lang"))
  }
  val scriptIdSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE doc_id % 6
      |      WHEN 0 THEN 'the quick brown fox number ' || (doc_id % 97)
      |      WHEN 1 THEN '中文语料质量检测第' || (doc_id % 97) || '篇'
      |      WHEN 2 THEN '日本語のテキストです第' || (doc_id % 97) || '回'
      |      WHEN 3 THEN '한국어 말뭉치 문서 ' || (doc_id % 97)
      |      WHEN 4 THEN 'Русский текст номер ' || (doc_id % 97)
      |      ELSE 'نص عربي رقم ' || (doc_id % 97) END AS text
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    length(regexp_replace(text, '\s', '', 'g')) AS total,
      |    length(regexp_replace(text, '[^A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS latin,
      |    length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS han,
      |    length(regexp_replace(text, '[^\x{3040}-\x{30FF}]', '', 'g')) AS kana,
      |    length(regexp_replace(text, '[^\x{AC00}-\x{D7AF}\x{1100}-\x{11FF}]', '', 'g')) AS hangul,
      |    length(regexp_replace(text, '[^\x{0400}-\x{04FF}]', '', 'g')) AS cyr,
      |    length(regexp_replace(text, '[^\x{0600}-\x{06FF}]', '', 'g')) AS ar,
      |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit
      |  FROM t),
      |p AS (SELECT *, total - latin - han - kana - hangul - cyr - ar - digit AS other FROM c)
      |SELECT doc_id, CAST(total AS BIGINT) AS n_cp,
      |  CAST(latin * 1000000 // total AS BIGINT) AS latin_ppm,
      |  CAST(han * 1000000 // total AS BIGINT) AS han_ppm,
      |  CAST(kana * 1000000 // total AS BIGINT) AS kana_ppm,
      |  CAST(hangul * 1000000 // total AS BIGINT) AS hangul_ppm,
      |  CAST(cyr * 1000000 // total AS BIGINT) AS cyrillic_ppm,
      |  CAST(ar * 1000000 // total AS BIGINT) AS arabic_ppm,
      |  CAST(digit * 1000000 // total AS BIGINT) AS digit_ppm,
      |  CAST(other * 1000000 // total AS BIGINT) AS other_ppm,
      |  CASE WHEN latin >= han AND latin >= kana AND latin >= hangul AND latin >= cyr
      |            AND latin >= ar AND latin >= digit AND latin >= other THEN 'latin'
      |       WHEN han >= kana AND han >= hangul AND han >= cyr AND han >= ar
      |            AND han >= digit AND han >= other THEN 'han'
      |       WHEN kana >= hangul AND kana >= cyr AND kana >= ar AND kana >= digit
      |            AND kana >= other THEN 'kana'
      |       WHEN hangul >= cyr AND hangul >= ar AND hangul >= digit AND hangul >= other THEN 'hangul'
      |       WHEN cyr >= ar AND cyr >= digit AND cyr >= other THEN 'cyrillic'
      |       WHEN ar >= digit AND ar >= other THEN 'arabic'
      |       WHEN digit >= other THEN 'digit'
      |       ELSE 'other' END AS script,
      |  CASE WHEN kana * 1000000 // total >= 50000 THEN 'ja'
      |       WHEN hangul * 1000000 // total >= 500000 THEN 'ko'
      |       WHEN han * 1000000 // total >= 500000 THEN 'zh'
      |       WHEN cyr * 1000000 // total >= 500000 THEN 'ru'
      |       WHEN ar * 1000000 // total >= 500000 THEN 'ar'
      |       WHEN latin * 1000000 // total >= 500000 THEN 'latin'
      |       ELSE 'und' END AS lang
      |FROM p""".stripMargin

  /** Edit distance cross-engine: both engines run their OWN
    * Levenshtein DP (Spark's `levenshtein`, DuckDB's `levenshtein`)
    * over a rotation-corrupted hypothesis — a non-trivial
    * insert/delete/substitute mix, so the two independent DPs must
    * agree cell for cell. The CER (character error rate, ppm) is the
    * ASR-eval primitive a speech corpus pipeline runs against its
    * transcripts.
    */
  val editDistance: Q = (s, d) =>
    Tables.documents(s, d).select("doc_id")
      .withColumn("_ref", concat(lit("the quick brown fox "),
        col("doc_id").cast("string"), lit(" jumps over "),
        (col("doc_id") % 7).cast("string"), lit(" lazy dogs")))
      .withColumn("_k", (pmod(col("doc_id"), lit(10)) + 2).cast("int"))
      .withColumn("_hyp", expr("concat(substring(_ref, _k + 1), substring(_ref, 1, _k))"))
      .select(col("doc_id"),
        length(col("_ref")).cast("long").as("len_ref"),
        levenshtein(col("_ref"), col("_hyp")).cast("long").as("dist"),
        expr("CAST(levenshtein(_ref, _hyp) AS BIGINT) * 1000000 div length(_ref)")
          .as("cer_ppm"))
  val editDistanceSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         'the quick brown fox ' || doc_id || ' jumps over ' || (doc_id % 7)
      |           || ' lazy dogs' AS ref,
      |         CAST(doc_id % 10 + 2 AS INTEGER) AS k
      |  FROM documents),
      |h AS (SELECT doc_id, ref, substr(ref, k + 1) || substr(ref, 1, k) AS hyp FROM t)
      |SELECT doc_id, CAST(length(ref) AS BIGINT) AS len_ref,
      |       CAST(levenshtein(ref, hyp) AS BIGINT) AS dist,
      |       CAST(levenshtein(ref, hyp) * 1000000 // length(ref) AS BIGINT) AS cer_ppm
      |FROM h""".stripMargin

  /** Zipf frequency spectrum of the corpus vocabulary. */
  val freqSpectrum: Q = (s, d) =>
    TextAnalysis.freqSpectrum(Tables.documents(s, d), "text")
  val freqSpectrumSql: String = TextAnalysis.freqSpectrumSql("documents", "text")

  /** Language-ID confusion matrix against the fixture's lang label. */
  val langIdEval: Q = (s, d) =>
    TextAnalysis.langIdEval(Tables.documents(s, d), "doc_id", "text", "lang")
  val langIdEvalSql: String =
    s"""WITH p AS ($langIdSql)
       |SELECT d.lang, p.pred_lang, count(*) AS n
       |FROM p JOIN documents d USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  /** Gopher-style repetition signals; null top-n-gram ratios for docs
    * shorter than n words on BOTH engines (left joins).
    */
  val repetition: Q = (s, d) =>
    TextAnalysis.withRepetitionSignals(Tables.documents(s, d), "doc_id", "text")
  val repetitionSql: String =
    s"""WITH w AS (SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
       |ws AS (SELECT doc_id, unnest(w) AS word FROM w),
       |wstat AS (SELECT doc_id, count(*) AS n_words, count(DISTINCT word) AS n_distinct
       |          FROM ws GROUP BY 1),
       |g2 AS (SELECT doc_id, unnest(${ngramsSql("w", 2)}) AS g FROM w),
       |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
       |r2 AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top2gram_ratio
       |       FROM c2 GROUP BY 1),
       |g3 AS (SELECT doc_id, unnest(${ngramsSql("w", 3)}) AS g FROM w),
       |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
       |r3 AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top3gram_ratio
       |       FROM c3 GROUP BY 1)
       |SELECT wstat.doc_id, n_words,
       |       1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_ratio,
       |       top2gram_ratio, top3gram_ratio
       |FROM wstat LEFT JOIN r2 USING (doc_id) LEFT JOIN r3 USING (doc_id)""".stripMargin

  val docFingerprint: Q = (s, d) =>
    TextAnalysis.withFingerprint(Tables.documents(s, d), "doc_id", "text", N)
  val docFingerprintSql: String =
    s"""SELECT doc_id, text_hash,
       |       list_aggregate(hs, 'min') AS min_shingle_hash,
       |       list_aggregate(hs, 'max') AS max_shingle_hash
       |FROM (SELECT doc_id, ${stableHash60Sql("text")} AS text_hash,
       |             list_transform(${shinglesSql("w", N)}, s -> ${stableHash60Sql("s")} % ${P}::BIGINT) AS hs
       |      FROM (SELECT doc_id, text, ${wordsSql("text")} AS w FROM documents))""".stripMargin

  // ---------------------------------------------------------------- tf/df + packing
  private val TfDfK = 3
  val tfdfTopk: Q = (s, d) =>
    TextAnalysis.topTermsByTfDf(Tables.documents(s, d), "doc_id", "text", TfDfK)
  val tfdfTopkSql: String = TextAnalysis.topTermsByTfDfSql(TfDfK)

  /** Top-50 bigram collocations by lift, min 5 occurrences. */
  private val CollocMinCount = 5L
  private val CollocK = 50
  val collocations: Q = (s, d) =>
    TextAnalysis.collocations(Tables.documents(s, d), "text", CollocMinCount, CollocK)
  val collocationsSql: String =
    TextAnalysis.collocationsSql("documents", "text", CollocMinCount, CollocK)

  private val PackShards = 8
  private val PackBudget = 2048
  val seqPack: Q = (s, d) =>
    graft.operators.Packing.packSequences(Tables.documents(s, d), "doc_id", "text", PackShards, PackBudget)
  val seqPackSql: String = graft.operators.Packing.packSequencesSql(PackShards, PackBudget)

  private val ChunkTokens = 64
  private val ChunkOverlap = 16
  val chunkSpans: Q = (s, d) =>
    graft.operators.Packing.chunkSpans(Tables.documents(s, d), "doc_id", "text", ChunkTokens, ChunkOverlap)
  val chunkSpansSql: String = graft.operators.Packing.chunkSpansSql(ChunkTokens, ChunkOverlap)

  /** Typo-tolerant keyword matching (OCR-noise shape): dictionary terms
    * deliberately misspelled by one edit so the oracle exercises real
    * fuzzy hits, not just exact words.
    */
  private val FuzzyDict = Seq("scann", "columm", "qery", "mergee")
  private val FuzzyDist = 1
  val fuzzyKeyword: Q = (s, d) =>
    TextAnalysis.fuzzyKeywordMatches(Tables.documents(s, d), "text", FuzzyDict, FuzzyDist)
  val fuzzyKeywordSql: String = {
    val dictRows = FuzzyDict.map(w => s"('$w')").mkString(", ")
    s"""WITH v AS (SELECT word, count(*) AS occ
       |           FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |           GROUP BY word),
       |d(dict_word) AS (VALUES $dictRows),
       |m AS (SELECT d.dict_word, v.word, v.occ
       |      FROM v JOIN d ON levenshtein(v.word, d.dict_word) <= $FuzzyDist)
       |SELECT dict_word, count(*) AS n_variants,
       |       CAST(sum(occ) AS BIGINT) AS n_occurrences, min(word) AS first_variant
       |FROM m GROUP BY dict_word""".stripMargin
  }

  // ---------------------------------------------------------------- count-min
  /** CM-sketch frequency estimates probed at the stopword list (hot
    * keys, real collisions at width 512) plus the fuzzy dictionary's
    * misspellings (absent/rare keys — estimates still ≥ 0 exact).
    */
  private val CmWidth = 512
  private lazy val CmProbes: Seq[String] = TextAnalysis.EnStopwords ++ FuzzyDict
  val cmSketchEst: Q = (s, d) =>
    Sketches.cmEstimates(
      Tables.documents(s, d).select(explode(words(col("text"))).as("k")),
      col("k"), CmProbes, CmWidth)
  val cmSketchEstSql: String =
    Sketches.cmEstimatesSql(
      s"SELECT unnest(${wordsSql("text")}) AS k FROM documents", CmProbes, CmWidth)

  /** Two-pass heavy hitters over the document token stream: bounded CM
    * candidates at ≥0.1% of token mass, exact verify over the sliver
    * ([[Sketches.heavyHitters]] for the full scale rationale). Tokens
    * keep the curation discipline (empty tokens from repeated
    * separators excluded) so counts agree with the funnel layer.
    */
  private val HhPpm = 1000L
  val heavyHittersQ: Q = (s, d) =>
    Sketches.heavyHitters(
      Tables.documents(s, d).select(explode(words(col("text"))).as("k"))
        .filter(length(col("k")) > 0),
      col("k"), CmWidth, HhPpm)
  val heavyHittersSqlQ: String =
    Sketches.heavyHittersSql(
      s"SELECT word FROM (SELECT unnest(${wordsSql("text")}) AS word FROM documents) WHERE length(word) > 0",
      CmWidth, HhPpm)

  /** Bloom-mask decontamination triage: the probe docs' 4-gram set
    * compressed to a 2^16-bit broadcast mask (8 KiB), each corpus doc
    * counting flagged grams with k=4 bit probes per gram — no corpus
    * shuffle against the probe side; the exact shingle join then only
    * runs over the flagged sliver. The oracle recomputes the SAME bit
    * positions relationally, so membership decisions hash-gate, not
    * just aggregate counts.
    */
  private val BloomM = 1 << 16
  private val BloomK = 4
  val bloomContam: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    Sketches.bloomContamination(doc.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      doc.filter(col("doc_id") % 10 === 0), "text", n = 4, m = BloomM, k = BloomK)
  }
  val bloomContamSql: String =
    Sketches.bloomContaminationSql("doc_id % 10 <> 0", "doc_id % 10 = 0",
      n = 4, m = BloomM, k = BloomK)

  /** HLL distinct-user sketch per event type next to the exact count —
    * the large-cardinality companion to q_distinct_sketch, gated
    * bit-for-bit (order-free integer registers, integer-scaled harmonic
    * sum, one final division).
    */
  val hllSketch: Q = (s, d) =>
    Sketches.hllEstimates(Tables.events(s, d), col("event_type"), col("user_id"))
  val hllSketchSql: String =
    Sketches.hllEstimatesSql("events", "event_type", "user_id")

  // ---------------------------------------------------------------- embeddings
  private val TopK = 5
  val annTopK: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", Dim, TopK)
  }
  val annTopKSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |s AS (SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
       |             ${cosineSql("q.v", "c.v", Dim)} AS cosine
       |      FROM e q JOIN e c ON c.vec_id != q.vec_id WHERE q.vec_id < 8)
       |SELECT query_id, nn_id, cosine, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rk FROM s)
       |WHERE rk <= $TopK""".stripMargin

  private val Planes = 8
  val annLsh: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", Dim, 3, Planes)
  }
  val annLshSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, ${signBucketSql("v", Dim, Planes)} AS bucket FROM e),
       |s AS (SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
       |             ${cosineSql("q.v", "c.v", Dim)} AS cosine
       |      FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
       |      WHERE q.vec_id < 8)
       |SELECT query_id, nn_id, cosine, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rk FROM s)
       |WHERE rk <= 3""".stripMargin

  /** Same result as q_ann_topk, computed through the bounded TopKAgg
    * aggregate (map-side partial top-k) instead of windows — shares the
    * q_ann_topk oracle because output is identical by construction.
    */
  val annTopKAgg: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopKAgg(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", Dim, TopK)
  }

  // ---------------------------------------------------------------- IVF ANN
  private val IvfK = 8
  private val IvfProbe = 2
  private val IvfTopN = 3
  /** Deterministic pseudo-centroids from the shared md5 hyperplane
    * generator — fixed constants on both engines (in production these
    * come from k-means; the operator structure is what's under test).
    */
  private val IvfCentroids: Seq[Seq[Double]] =
    (0 until IvfK).map(i => (1 to Dim).map(d => hyperplane(100 + i, d)).toSeq)

  val annIvf: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
      Dim, IvfTopN, IvfCentroids, IvfProbe)
  }
  val annIvfSql: String = {
    def lit64(c: Seq[Double]): String = c.mkString("[", ", ", "]")
    val simExprs = IvfCentroids.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      s"${dotFoldSql("v", lit64(c), Dim)} / (nrm * $cn) AS c$i"
    }.mkString(",\n       ")
    val gmax = (0 until IvfK).map(i => s"c$i").mkString("greatest(", ", ", ")")
    val argmax = (0 until IvfK).map(i => s"WHEN c$i = m THEN $i").mkString("CASE ", " ", " END")
    val probeStructs = (0 until IvfK).map(i => s"{'sim': c$i, 'list_id': $i}").mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${dotFoldSql("v", "v", Dim)}) AS nrm FROM e),
       |s AS (SELECT vec_id, v, nrm,
       |       $simExprs
       |      FROM n),
       |a AS (SELECT vec_id, v, nrm, $argmax AS list_id
       |      FROM (SELECT *, $gmax AS m FROM s)),
       |qp AS (SELECT query_id, qv, qnrm, list_id FROM (
       |        SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, sim, list_id,
       |               row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id DESC) AS pr
       |        FROM (SELECT vec_id, v, nrm, unnest($probeStructs, recursive := true)
       |              FROM s WHERE vec_id < 8))
       |       WHERE pr <= $IvfProbe),
       |sc AS (SELECT qp.query_id, a.vec_id AS nn_id,
       |              ${dotFoldSql("qp.qv", "a.v", Dim)} / (qp.qnrm * a.nrm) AS cosine
       |       FROM a JOIN qp ON a.list_id = qp.list_id AND a.vec_id != qp.query_id)
       |SELECT query_id, nn_id, cosine, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rk FROM sc)
       |WHERE rk <= $IvfTopN""".stripMargin
  }

  /** One Lloyd round of the IVF k-means trainer under the hash gate:
    * assign every vector to its argmax-cosine centroid (fixed seed
    * centroids), recompute centroids as per-list MEANS, reassign, and
    * output (vec_id, list0, list1). The mean is where cross-engine
    * double summation normally diverges (partition-order
    * reassociation), so the sums are INTEGER-scaled — each component is
    * `sum(round(v[i]*1e6)::bigint) div n / 1e6`: exact integers in any
    * order, identical truncating division, identical doubles on both
    * engines. Empty lists keep their seed centroid, exactly like
    * [[graft.operators.Similarity.trainIvfCentroids]] (whose loop body
    * this mirrors; the k×dim collect is model state, same as there).
    */
  val ivfAssign: Q = (s, d) => {
    val e0 = Similarity.withIvfList(Tables.embeddings(s, d), "embedding", Dim, IvfCentroids)
      .select(col("vec_id"), col("v"), col("ivf_list").as("list0"))
    val aggs = count(lit(1)).as("_n") +: (0 until Dim).map(i =>
      sum(round(col("v")(i) * 1e6).cast("long")).as(s"_s$i"))
    val sums = e0.groupBy(col("list0")).agg(aggs.head, aggs.tail: _*).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), (0 until Dim).map(i => r.getLong(2 + i)))))
      .toMap
    val cents1 = IvfCentroids.zipWithIndex.map { case (old, i) =>
      sums.get(i).filter(_._1 > 0)
        .map { case (n, ss) => ss.map(x => (x / n).toDouble / 1e6).toSeq }
        .getOrElse(old)
    }
    Similarity.withIvfList(e0, "v", Dim, cents1)
      .select(col("vec_id"), col("list0"), col("ivf_list").as("list1"))
  }
  val ivfAssignSql: String = {
    def lit64(c: Seq[Double]): String = c.mkString("[", ", ", "]")
    val c0Rows = IvfCentroids.zipWithIndex
      .map { case (c, i) => s"($i, ${lit64(c)})" }.mkString(",\n  ")
    val sumCols = (0 until Dim)
      .map(i => s"sum(CAST(round(v[${i + 1}] * 1000000.0) AS BIGINT)) AS s$i").mkString(", ")
    val meanList = (0 until Dim).map(i => s"(s.s$i // s.n) / 1000000.0").mkString("[", ", ", "]")
    // argmax = row_number over (sim DESC, list_id): lowest id wins exact
    // ties, matching withIvfList's first-strict-maximum fold.
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${dotFoldSql("v", "v", Dim)}) AS nrm FROM e),
       |c0(list_id, cv) AS (VALUES
       |  $c0Rows),
       |a0 AS (SELECT n.vec_id, n.v, n.nrm, c0.list_id,
       |              ${dotFoldSql("n.v", "c0.cv", Dim)} / (n.nrm * sqrt(${dotFoldSql("c0.cv", "c0.cv", Dim)})) AS sim
       |       FROM n CROSS JOIN c0),
       |l0 AS (SELECT vec_id, v, nrm, list_id AS list0
       |       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn FROM a0)
       |       WHERE rn = 1),
       |s AS (SELECT list0, count(*) AS n, $sumCols FROM l0 GROUP BY list0),
       |c1 AS (SELECT c0.list_id,
       |              CASE WHEN s.n IS NULL OR s.n = 0 THEN c0.cv ELSE $meanList END AS cv
       |       FROM c0 LEFT JOIN s ON s.list0 = c0.list_id),
       |a1 AS (SELECT l0.vec_id, l0.list0, c1.list_id,
       |              ${dotFoldSql("l0.v", "c1.cv", Dim)} / (l0.nrm * sqrt(${dotFoldSql("c1.cv", "c1.cv", Dim)})) AS sim
       |       FROM l0 CROSS JOIN c1)
       |SELECT vec_id, list0, list_id AS list1
       |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn FROM a1)
       |WHERE rn = 1""".stripMargin
  }

  /** Cluster-balanced diversity sampling: the m most-central vectors
    * of EVERY IVF list, equal allocation regardless of cluster size —
    * the coreset-selection shape (big clusters are downsampled hard,
    * small clusters keep their coverage; SemDedup-pipeline
    * "diversify" stage). The winning cosine is quantized to integer
    * micro-units BEFORE the rank order so the cut is engine-exact;
    * the per-list top-m runs as a WindowGroupLimit (map-side partial
    * top-m per list, never a full-cluster sort in one task).
    */
  private val DiverseM = 8
  val diverseSample: Q = (s, d) => {
    val a = Similarity.withIvfAssignment(Tables.embeddings(s, d), "embedding", Dim, IvfCentroids)
      .select(col("vec_id"), col("ivf_list"),
        round(col("ivf_sim") * 1e6).cast("long").as("sim_u"))
    val w = Window.partitionBy("ivf_list").orderBy(col("sim_u").desc, col("vec_id"))
    a.withColumn("rk", row_number().over(w)).filter(col("rk") <= DiverseM)
      .select(col("vec_id"), col("ivf_list").cast("long").as("ivf_list"),
        col("sim_u"), col("rk").cast("long").as("rk"))
  }
  val diverseSampleSql: String = {
    def lit64(c: Seq[Double]): String = c.mkString("[", ", ", "]")
    val c0Rows = IvfCentroids.zipWithIndex
      .map { case (c, i) => s"($i, ${lit64(c)})" }.mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${dotFoldSql("v", "v", Dim)}) AS nrm FROM e),
       |c0(list_id, cv) AS (VALUES
       |  $c0Rows),
       |a0 AS (SELECT n.vec_id, c0.list_id,
       |              ${dotFoldSql("n.v", "c0.cv", Dim)} / (n.nrm * sqrt(${dotFoldSql("c0.cv", "c0.cv", Dim)})) AS sim
       |       FROM n CROSS JOIN c0),
       |l0 AS (SELECT vec_id, CAST(list_id AS BIGINT) AS ivf_list,
       |              CAST(round(sim * 1000000.0) AS BIGINT) AS sim_u
       |       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn FROM a0)
       |       WHERE rn = 1)
       |SELECT vec_id, ivf_list, sim_u, CAST(rk AS BIGINT) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY ivf_list ORDER BY sim_u DESC, vec_id) AS rk FROM l0)
       |WHERE rk <= $DiverseM""".stripMargin
  }

  // ---------------------------------------------------------------- SQ ANN
  private val SqTopN = 5
  /** Oracle CTE chain ending in `r(vec_id, v, r0..r63)` — per-dim
    * int8 codes and reconstructions from min/max ranges the oracle
    * trains itself with the same exact aggregates as
    * [[graft.operators.Similarity.trainSqRanges]] (min/max are order-
    * insensitive, so both engines derive identical ranges — no
    * centroid literals needed, unlike the PQ chain).
    */
  private def sqReconCtes: String = {
    val mnmx = (0 until Dim).map(i => s"min(v[${i + 1}]) AS mn$i, max(v[${i + 1}]) AS mx$i").mkString(", ")
    val scales = (0 until Dim).map(i =>
      s"mn$i, CASE WHEN mx$i = mn$i THEN 0.0 ELSE (mx$i - mn$i) / 255.0 END AS sc$i").mkString(", ")
    val codes = (0 until Dim).map(i =>
      s"mn$i, sc$i, CASE WHEN sc$i = 0.0 THEN 0 ELSE CAST(round((v[${i + 1}] - mn$i) / sc$i) AS INTEGER) END AS c$i").mkString(", ")
    val recon = (0 until Dim).map(i => s"c$i, mn$i + CAST(c$i AS DOUBLE) * sc$i AS r$i").mkString(", ")
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |st AS (SELECT $mnmx FROM e),
       |sc AS (SELECT $scales FROM st),
       |c AS (SELECT vec_id, v, $codes FROM e CROSS JOIN sc),
       |r AS (SELECT vec_id, v, $recon FROM c)""".stripMargin
  }

  /** Int8 SQ encode of the embedding table: 64 floats → 64 byte codes
    * + integer-scaled reconstruction error (the SQ counterpart of
    * q_pq_codes; ranges trained in-query from exact min/max).
    */
  val sqCodes: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val ranges = Similarity.trainSqRanges(emb, "embedding", Dim)
    Similarity.withSqCodes(emb, "embedding", Dim, ranges)
      .select(col("vec_id"),
        concat_ws("-", (0 until Dim).map(i => col(s"_c$i").cast("string")): _*).as("code_str"),
        col("qerr_u"))
  }
  val sqCodesSql: String = {
    val codeStr = (0 until Dim).map(i => s"CAST(c$i AS VARCHAR)").mkString("concat_ws('-', ", ", ", ")")
    val err = (0 until Dim).map(i => s"(v[${i + 1}] - r$i) * (v[${i + 1}] - r$i)").mkString(" + ")
    s"""WITH $sqReconCtes
       |SELECT vec_id, $codeStr AS code_str,
       |       CAST(round(($err) * 1000000.0) AS BIGINT) AS qerr_u
       |FROM r""".stripMargin
  }

  /** ADC top-k over the SQ-compressed corpus for the vec_id < 8 query
    * set — the third rung of the compression ladder next to q_pq_adc
    * and q_ivfadc (codes-only corpus side, exact query side).
    */
  val annSq: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val ranges = Similarity.trainSqRanges(emb, "embedding", Dim)
    Similarity.sqAdcTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
      Dim, ranges, SqTopN)
  }
  val annSqSql: String = {
    val d2 = (0 until Dim).map(i => s"(q.v[${i + 1}] - r.r$i) * (q.v[${i + 1}] - r.r$i)").mkString(" + ")
    s"""WITH $sqReconCtes,
       |qr AS (SELECT q.vec_id AS query_id, r.vec_id AS nn_id, $d2 AS d2
       |       FROM r CROSS JOIN (SELECT vec_id, v FROM e WHERE vec_id < 8) q
       |       WHERE r.vec_id != q.vec_id)
       |SELECT query_id, nn_id, d2, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d2, nn_id) AS rk FROM qr)
       |WHERE rk <= $SqTopN""".stripMargin
  }

  // ---------------------------------------------------------------- PQ ANN
  private val PqM = 4
  private val PqKCents = 8
  private val PqSubDim = Dim / PqM
  private val PqTopN = 5
  /** Deterministic codebooks from the shared hyperplane generator
    * (offset 300 keeps them disjoint from the LSH plane families and
    * the IVF seeds). In production codebooks come from per-subspace
    * k-means; the operator structure is what's under test, exactly as
    * with [[IvfCentroids]].
    */
  private val PqCentroids: Seq[Seq[Seq[Double]]] =
    (0 until PqM).map(m => (0 until PqKCents).map(c =>
      (1 to PqSubDim).map(dd => hyperplane(300 + m * PqKCents + c, dd)).toSeq).toSeq)

  /** PQ encode of the whole embedding table: 64 floats → 4 codebook
    * ids + the integer-scaled quantization error.
    */
  val pqCodes: Q = (s, d) =>
    Similarity.withPqCodes(Tables.embeddings(s, d), "embedding", Dim, PqCentroids)
      .select(col("vec_id") +: (0 until PqM).map(i => col(s"code$i")) :+ col("qerr_u"): _*)

  /** Shared oracle CTE chain ending in `enc(vec_id, m, code, d2)` —
    * the same d² = svv − 2·⟨sv,c⟩ + cvv arithmetic as
    * [[graft.operators.Similarity.withPqCodes]], argmin ties to the
    * lower code.
    */
  private def pqEncCtes: String = {
    val rows = (for { m <- 0 until PqM; c <- 0 until PqKCents } yield
      s"($m, $c, ${PqCentroids(m)(c).mkString("[", ", ", "]")})").mkString(",\n  ")
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cb(m, code, cv) AS (VALUES
       |  $rows),
       |cc AS (SELECT m, code, cv, ${dotFoldSql("cv", "cv", PqSubDim)} AS cvv
       |       FROM (SELECT m, code, list_transform(cv, x -> CAST(x AS DOUBLE)) AS cv FROM cb)),
       |sub AS (SELECT vec_id, s.m, list_slice(v, s.m * $PqSubDim + 1, (s.m + 1) * $PqSubDim) AS sv
       |        FROM e CROSS JOIN (SELECT DISTINCT m FROM cb) s),
       |sv2 AS (SELECT vec_id, m, sv, ${dotFoldSql("sv", "sv", PqSubDim)} AS svv FROM sub),
       |dd AS (SELECT vec_id, sv2.m, code, svv - 2.0 * ${dotFoldSql("sv", "cv", PqSubDim)} + cvv AS d2
       |       FROM sv2 JOIN cc ON sv2.m = cc.m),
       |enc AS (SELECT vec_id, m, code, d2 FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn FROM dd)
       |        WHERE rn = 1)""".stripMargin
  }

  val pqCodesSql: String = {
    val codeCols = (0 until PqM)
      .map(i => s"max(CASE WHEN m = $i THEN code END) AS code$i").mkString(", ")
    val errSum = (0 until PqM).map(i => s"max(CASE WHEN m = $i THEN d2 END)").mkString(" + ")
    s"""WITH $pqEncCtes
       |SELECT vec_id, $codeCols,
       |       CAST(round(($errSum) * 1000000.0) AS BIGINT) AS qerr_u
       |FROM enc GROUP BY vec_id""".stripMargin
  }

  /** ADC top-k over the PQ-compressed corpus for the vec_id < 8 query
    * set (same probes as the other ANN variants; smaller adc =
    * closer).
    */
  val pqAdc: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.pqAdcTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
      Dim, PqCentroids, PqTopN)
  }
  val pqAdcSql: String = {
    val codeCols = (0 until PqM)
      .map(i => s"max(CASE WHEN m = $i THEN code END) AS c$i").mkString(", ")
    val joins = (1 until PqM).map(i =>
      s"JOIN lut l$i ON l$i.query_id = l0.query_id AND l$i.m = $i AND l$i.code = codes.c$i")
      .mkString("\n        ")
    val adcSum = (0 until PqM).map(i => s"l$i.d2").mkString(" + ")
    s"""WITH $pqEncCtes,
       |qsub AS (SELECT vec_id AS query_id, s.m, list_slice(v, s.m * $PqSubDim + 1, (s.m + 1) * $PqSubDim) AS sv
       |         FROM e CROSS JOIN (SELECT DISTINCT m FROM cb) s WHERE vec_id < 8),
       |qsv AS (SELECT query_id, m, sv, ${dotFoldSql("sv", "sv", PqSubDim)} AS svv FROM qsub),
       |lut AS (SELECT query_id, qsv.m, code, svv - 2.0 * ${dotFoldSql("sv", "cv", PqSubDim)} + cvv AS d2
       |        FROM qsv JOIN cc ON qsv.m = cc.m),
       |codes AS (SELECT vec_id, $codeCols FROM enc GROUP BY vec_id),
       |adc AS (SELECT l0.query_id, codes.vec_id AS nn_id, $adcSum AS adc
       |        FROM codes
       |        JOIN lut l0 ON l0.m = 0 AND l0.code = codes.c0
       |        $joins
       |        WHERE codes.vec_id != l0.query_id)
       |SELECT query_id, nn_id, adc, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, nn_id) AS rk FROM adc)
       |WHERE rk <= $PqTopN""".stripMargin
  }

  /** ADC top-20 shortlist → exact-L2 re-rank top-5: the production PQ
    * retrieval pipeline end-to-end under the hash gate.
    */
  private val PqShortlistK = 20
  val pqRerank: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.pqRerankTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
      Dim, PqCentroids, PqShortlistK, PqTopN)
  }
  val pqRerankSql: String = {
    val codeCols = (0 until PqM)
      .map(i => s"max(CASE WHEN m = $i THEN code END) AS c$i").mkString(", ")
    val joins = (1 until PqM).map(i =>
      s"JOIN lut l$i ON l$i.query_id = l0.query_id AND l$i.m = $i AND l$i.code = codes.c$i")
      .mkString("\n        ")
    val adcSum = (0 until PqM).map(i => s"l$i.d2").mkString(" + ")
    val exactD2 = s"${dotFoldSql("q.qv", "q.qv", Dim)} - 2.0 * ${dotFoldSql("q.qv", "c.cv", Dim)}" +
      s" + ${dotFoldSql("c.cv", "c.cv", Dim)}"
    s"""WITH $pqEncCtes,
       |qsub AS (SELECT vec_id AS query_id, s.m, list_slice(v, s.m * $PqSubDim + 1, (s.m + 1) * $PqSubDim) AS sv
       |         FROM e CROSS JOIN (SELECT DISTINCT m FROM cb) s WHERE vec_id < 8),
       |qsv AS (SELECT query_id, m, sv, ${dotFoldSql("sv", "sv", PqSubDim)} AS svv FROM qsub),
       |lut AS (SELECT query_id, qsv.m, code, svv - 2.0 * ${dotFoldSql("sv", "cv", PqSubDim)} + cvv AS d2
       |        FROM qsv JOIN cc ON qsv.m = cc.m),
       |codes AS (SELECT vec_id, $codeCols FROM enc GROUP BY vec_id),
       |adc AS (SELECT l0.query_id, codes.vec_id AS nn_id, $adcSum AS adc
       |        FROM codes
       |        JOIN lut l0 ON l0.m = 0 AND l0.code = codes.c0
       |        $joins
       |        WHERE codes.vec_id != l0.query_id),
       |short AS (SELECT query_id, nn_id FROM (
       |           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, nn_id) AS ark FROM adc)
       |          WHERE ark <= $PqShortlistK),
       |ex AS (SELECT short.query_id, short.nn_id, $exactD2 AS d2
       |       FROM short
       |       JOIN (SELECT vec_id, v AS cv FROM e) c ON c.vec_id = short.nn_id
       |       JOIN (SELECT vec_id, v AS qv FROM e WHERE vec_id < 8) q ON q.vec_id = short.query_id)
       |SELECT query_id, nn_id, d2, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d2, nn_id) AS rk FROM ex)
       |WHERE rk <= $PqTopN""".stripMargin
  }

  /** IVFADC — IVF list pruning composed with ADC over PQ codes (the
    * fixed IVF centroids of q_ann_ivf + the fixed codebooks of
    * q_pq_codes; equi-join on list_id, codes-only corpus side).
    */
  val ivfAdc: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfAdcTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
      Dim, IvfTopN, IvfCentroids, IvfProbe, PqCentroids)
  }
  val ivfAdcSql: String = {
    def lit64(c: Seq[Double]): String = c.mkString("[", ", ", "]")
    val simExprs = IvfCentroids.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      s"${dotFoldSql("v", lit64(c), Dim)} / (nrm * $cn) AS c$i"
    }.mkString(",\n       ")
    val gmax = (0 until IvfK).map(i => s"c$i").mkString("greatest(", ", ", ")")
    val argmax = (0 until IvfK).map(i => s"WHEN c$i = m THEN $i").mkString("CASE ", " ", " END")
    val probeStructs = (0 until IvfK).map(i => s"{'sim': c$i, 'list_id': $i}").mkString("[", ", ", "]")
    val pqRows = (for { mm <- 0 until PqM; c <- 0 until PqKCents } yield
      s"($mm, $c, ${PqCentroids(mm)(c).mkString("[", ", ", "]")})").mkString(",\n  ")
    val codeCols = (0 until PqM).map(i => s"max(CASE WHEN m = $i THEN code END) AS c$i").mkString(", ")
    val joins = (1 until PqM).map(i =>
      s"JOIN lut l$i ON l$i.query_id = l0.query_id AND l$i.m = $i AND l$i.code = codes.c$i")
      .mkString("\n        ")
    val adcSum = (0 until PqM).map(i => s"l$i.d2").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${dotFoldSql("v", "v", Dim)}) AS nrm FROM e),
       |s AS (SELECT vec_id, v, nrm,
       |       $simExprs
       |      FROM n),
       |a AS (SELECT vec_id, v, $argmax AS list_id
       |      FROM (SELECT *, $gmax AS m FROM s)),
       |cb(m, code, cv) AS (VALUES
       |  $pqRows),
       |cc AS (SELECT m, code, cv, ${dotFoldSql("cv", "cv", PqSubDim)} AS cvv
       |       FROM (SELECT m, code, list_transform(cv, x -> CAST(x AS DOUBLE)) AS cv FROM cb)),
       |sub AS (SELECT vec_id, ss.m, list_slice(v, ss.m * $PqSubDim + 1, (ss.m + 1) * $PqSubDim) AS sv
       |        FROM a CROSS JOIN (SELECT DISTINCT m FROM cb) ss),
       |sv2 AS (SELECT vec_id, m, sv, ${dotFoldSql("sv", "sv", PqSubDim)} AS svv FROM sub),
       |dd AS (SELECT vec_id, sv2.m, code, svv - 2.0 * ${dotFoldSql("sv", "cv", PqSubDim)} + cvv AS d2
       |       FROM sv2 JOIN cc ON sv2.m = cc.m),
       |enc AS (SELECT vec_id, m, code FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn FROM dd)
       |        WHERE rn = 1),
       |codes AS (SELECT vec_id, $codeCols FROM enc GROUP BY vec_id),
       |qp AS (SELECT query_id, list_id FROM (
       |        SELECT vec_id AS query_id, sim, list_id,
       |               row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id DESC) AS pr
       |        FROM (SELECT vec_id, unnest($probeStructs, recursive := true)
       |              FROM s WHERE vec_id < 8))
       |       WHERE pr <= $IvfProbe),
       |qsub AS (SELECT vec_id AS query_id, ss.m, list_slice(v, ss.m * $PqSubDim + 1, (ss.m + 1) * $PqSubDim) AS sv
       |         FROM e CROSS JOIN (SELECT DISTINCT m FROM cb) ss WHERE vec_id < 8),
       |qsv AS (SELECT query_id, m, sv, ${dotFoldSql("sv", "sv", PqSubDim)} AS svv FROM qsub),
       |lut AS (SELECT query_id, qsv.m, code, svv - 2.0 * ${dotFoldSql("sv", "cv", PqSubDim)} + cvv AS d2
       |        FROM qsv JOIN cc ON qsv.m = cc.m),
       |cand AS (SELECT qp.query_id, a.vec_id AS nn_id
       |         FROM a JOIN qp ON a.list_id = qp.list_id
       |         WHERE a.vec_id != qp.query_id),
       |adc AS (SELECT cand.query_id, cand.nn_id, $adcSum AS adc
       |        FROM cand
       |        JOIN codes ON codes.vec_id = cand.nn_id
       |        JOIN lut l0 ON l0.query_id = cand.query_id AND l0.m = 0 AND l0.code = codes.c0
       |        $joins)
       |SELECT query_id, nn_id, adc, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, nn_id) AS rk FROM adc)
       |WHERE rk <= $IvfTopN""".stripMargin
  }

  val embedNearDup: Q = (s, d) =>
    Similarity.blockedNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", "label", Dim, 0.4)
  val embedNearDupSql: String =
    s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosineSql("a.v", "b.v", Dim)} AS cosine
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${cosineSql("a.v", "b.v", Dim)} >= 0.4""".stripMargin

  /** The label-free scale path: blocks are sign-LSH buckets. */
  val embedNearDupLsh: Q = (s, d) =>
    Similarity.lshNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", Dim, 0.4, Planes)
  val embedNearDupLshSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |bk AS (SELECT vec_id, v, ${signBucketSql("v", Dim, Planes)} AS blk FROM e)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosineSql("a.v", "b.v", Dim)} AS cosine
       |FROM bk a JOIN bk b ON a.blk = b.blk AND a.vec_id < b.vec_id
       |WHERE ${cosineSql("a.v", "b.v", Dim)} >= 0.4""".stripMargin

  /** SemDedup over the IVF clustering: survivors after dropping the
    * higher-id member of every within-cluster pair at cosine ≥ 0.4.
    */
  val semDedup: Q = (s, d) =>
    Similarity.semDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        Dim, IvfCentroids, 0.4)
      .select(col("id").as("vec_id"), col("list_id"))
  val semDedupSql: String = {
    def lit64(c: Seq[Double]): String = c.mkString("[", ", ", "]")
    val simExprs = IvfCentroids.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      s"${dotFoldSql("v", lit64(c), Dim)} / (nrm * $cn) AS c$i"
    }.mkString(",\n       ")
    val gmax = (0 until IvfK).map(i => s"c$i").mkString("greatest(", ", ", ")")
    val argmax = (0 until IvfK).map(i => s"WHEN c$i = m THEN $i").mkString("CASE ", " ", " END")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${dotFoldSql("v", "v", Dim)}) AS nrm FROM e),
       |s AS (SELECT vec_id, v, nrm,
       |       $simExprs
       |      FROM n),
       |a AS (SELECT vec_id, v, nrm, $argmax AS list_id
       |      FROM (SELECT *, $gmax AS m FROM s)),
       |drp AS (SELECT DISTINCT b.vec_id
       |        FROM a x JOIN a b ON x.list_id = b.list_id AND x.vec_id < b.vec_id
       |        WHERE ${cosineSql("x.v", "b.v", Dim)} >= 0.4)
       |SELECT vec_id, list_id FROM a
       |WHERE vec_id NOT IN (SELECT vec_id FROM drp)""".stripMargin
  }

  /** Recall@3 of the sign-LSH index against the exact top-3 — the
    * index-tuning eval under the oracle gate (the `planes`/`tables`
    * dial reads this number; [[Similarity.recallAtK]]'s scaladoc is the
    * tuning loop). Embeds the brute-force baseline as its truth side.
    */
  val annRecall: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 8)
    Similarity.recallAtK(
      Similarity.lshTopK(emb, q, "vec_id", "embedding", Dim, 3, Planes),
      Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", Dim, 3))
  }
  val annRecallSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |xs AS (SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
       |              ${cosineSql("q.v", "c.v", Dim)} AS cosine
       |       FROM e q JOIN e c ON c.vec_id != q.vec_id WHERE q.vec_id < 8),
       |exact AS (SELECT query_id, nn_id
       |          FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rk FROM xs)
       |          WHERE rk <= 3),
       |b AS (SELECT vec_id, v, ${signBucketSql("v", Dim, Planes)} AS bucket FROM e),
       |ls AS (SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
       |              ${cosineSql("q.v", "c.v", Dim)} AS cosine
       |       FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
       |       WHERE q.vec_id < 8),
       |approx AS (SELECT query_id, nn_id
       |           FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rk FROM ls)
       |           WHERE rk <= 3),
       |hit AS (SELECT query_id, count(*) AS n_hit
       |        FROM exact JOIN approx USING (query_id, nn_id) GROUP BY 1),
       |ne AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY 1)
       |SELECT query_id, CAST(coalesce(n_hit, 0) AS DOUBLE) / n_exact AS recall
       |FROM ne LEFT JOIN hit USING (query_id)""".stripMargin

  // ---------------------------------------------------------------- W4 rule cascade
  /** Pool derived from lineitem: synthetic file names exercise accents,
    * case, extensions and the latest/first/all pick modes.
    */
  private def rulePool(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.select(
      col("l_orderkey").as("item_id"),
      concat(lit("col"), pmod(col("l_partkey"), lit(3))).as("column_id"),
      (col("l_linenumber").cast("long") * 1000000000000L +
        col("l_partkey") * 1000000L + col("l_suppkey")).as("asset_id"),
      concat(
        when(col("l_returnflag") === "A", "Documento SCANNÉ ")
          .when(col("l_returnflag") === "R", "Documento v2 final ")
          .otherwise("Otro papel "),
        col("l_linenumber"),
        when(pmod(col("l_linenumber"), lit(3)) === 0, ".pdf")
          .when(pmod(col("l_linenumber"), lit(3)) === 1, ".PDF")
          .otherwise(".jpg")).as("name"),
      unix_millis(col("l_shipdate").cast("timestamp")).as("created_at"))
  }

  val ruleFallback: Q = (s, d) => {
    import s.implicits._
    // file_types use the reference's dotless `_file_ext` format; the
    // default rule is the reference's `{"file_types": ["pdf"]}`
    // (`Leyton_depot.py:318`, `:332`).
    val rules = Seq(
      ("col0", 1, Seq("scanne"), Seq("v2"), Seq("pdf"), "latest", Option.empty[Int]),
      ("col0", 2, Seq.empty[String], Seq.empty[String], Seq("pdf"), "latest", Option.empty[Int]),
      ("col1", 1, Seq("v2"), Seq.empty[String], Seq("any"), "all", Some(2))
    ).toDF("column_id", "priority", "include_any_of", "exclude_any_of", "file_types", "pick", "max")
    val default = Seq(
      ("__default__", 1, Seq.empty[String], Seq.empty[String], Seq("pdf"), "latest", Option.empty[Int])
    ).toDF("column_id", "priority", "include_any_of", "exclude_any_of", "file_types", "pick", "max")
    graft.operators.RuleCascade(rulePool(s, d), rules, default)
      .select("item_id", "column_id", "asset_id", "name", "created_at")
  }
  val ruleFallbackSql: String = {
    val normName = """trim(regexp_replace(lower(strip_accents(name)), '\s+', ' ', 'g'))"""
    s"""WITH pool AS (
       |  SELECT l_orderkey AS item_id,
       |         'col' || CAST(l_partkey % 3 AS VARCHAR) AS column_id,
       |         CAST(l_linenumber AS BIGINT) * 1000000000000 + l_partkey * 1000000 + l_suppkey AS asset_id,
       |         (CASE WHEN l_returnflag = 'A' THEN 'Documento SCANNÉ '
       |               WHEN l_returnflag = 'R' THEN 'Documento v2 final '
       |               ELSE 'Otro papel ' END)
       |           || CAST(l_linenumber AS VARCHAR)
       |           || (CASE CAST(l_linenumber % 3 AS INTEGER) WHEN 0 THEN '.pdf' WHEN 1 THEN '.PDF' ELSE '.jpg' END) AS name,
       |         epoch_ms(l_shipdate) AS created_at
       |  FROM lineitem),
       |rules(column_id, priority, include_any_of, exclude_any_of, file_types, pick, max_n) AS (VALUES
       |  ('col0', 1, ['scanne'], ['v2'], ['pdf'], 'latest', CAST(NULL AS INTEGER)),
       |  ('col0', 2, []::VARCHAR[], []::VARCHAR[], ['pdf'], 'latest', CAST(NULL AS INTEGER)),
       |  ('col1', 1, ['v2'], []::VARCHAR[], ['any'], 'all', 2)),
       |eff_rules AS (
       |  SELECT * FROM rules
       |  UNION ALL
       |  SELECT column_id, 1, []::VARCHAR[], []::VARCHAR[], ['pdf'], 'latest', CAST(NULL AS INTEGER)
       |  FROM (SELECT DISTINCT column_id FROM pool)
       |  WHERE column_id NOT IN (SELECT column_id FROM rules)),
       |cand AS (
       |  SELECT p.item_id, p.column_id, p.asset_id, p.name, p.created_at,
       |         r.priority, r.pick, r.max_n
       |  FROM pool p JOIN eff_rules r USING (column_id)
       |  WHERE (list_contains(r.file_types, 'any') OR list_contains(r.file_types,
       |           CASE WHEN lower(p.name) LIKE '%.pdf' THEN 'pdf'
       |                WHEN lower(p.name) LIKE '%.jpg' THEN 'jpg' ELSE '' END))
       |    AND (len(r.include_any_of) = 0 OR
       |         len(list_filter(r.include_any_of, k -> $normName LIKE '%' || k || '%')) > 0)
       |    AND len(list_filter(r.exclude_any_of, k -> $normName LIKE '%' || k || '%')) = 0),
       |win AS (
       |  SELECT * FROM (SELECT *, dense_rank() OVER (PARTITION BY item_id, column_id ORDER BY priority) AS pr
       |                 FROM cand) WHERE pr = 1),
       |picked AS (
       |  SELECT *, row_number() OVER (PARTITION BY item_id, column_id
       |    ORDER BY CASE WHEN pick = 'first' THEN created_at ELSE -created_at END, asset_id) AS rn
       |  FROM win)
       |SELECT item_id, column_id, asset_id, name, created_at FROM picked
       |WHERE CASE WHEN pick IN ('latest', 'first') THEN rn = 1 ELSE rn <= coalesce(max_n, 2147483647) END""".stripMargin
  }

  // -------------------------------------------------------- deterministic sampling
  /** Language-rebalancing stratified sample: downsample the head
    * language (en), keep more of the tail — membership from the stable
    * doc-id hash, so the subset is identical on any cluster layout and
    * the oracle reproduces it from the formula.
    */
  val sampleStratified: Q = (s, d) =>
    Sampling.stratified(Tables.documents(s, d), col("doc_id"), col("lang"),
        Map("en" -> 0.25), defaultRate = 0.6)
      .select("doc_id", "lang", "source")
  val sampleStratifiedSql: String =
    s"""SELECT doc_id, lang, source FROM documents
       |WHERE ${stableHash60Sql("CAST(doc_id AS VARCHAR)")} % 10000 <
       |      CASE WHEN lang = 'en' THEN 2500 ELSE 6000 END""".stripMargin

  /** Disjoint 80/10/10 train/eval/test split by hash range. */
  val trainSplit: Q = (s, d) =>
    Sampling.split(Tables.documents(s, d), col("doc_id"),
        Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
  val trainSplitSql: String =
    s"""SELECT doc_id,
       |       CASE WHEN slot < 8000 THEN 'train'
       |            WHEN slot < 9000 THEN 'eval'
       |            ELSE 'test' END AS split
       |FROM (SELECT doc_id,
       |             ${stableHash60Sql("CAST(doc_id AS VARCHAR)")} % 10000 AS slot
       |      FROM documents)""".stripMargin

  /** Pretraining-mixture rebalance: target shares 50/25/12.5/12.5 over
    * four sources, every other source dropped. The thresholds are
    * DATA-DEPENDENT (computed from per-source counts, binding source
    * kept whole), so the oracle recomputes the same two-phase plan.
    */
  private val MixWeights = Seq("src0" -> 500, "src1" -> 250, "src2" -> 125, "src3" -> 125)
  val mixBalance: Q = (s, d) =>
    Sampling.balanceToMix(Tables.documents(s, d), col("doc_id"), col("source"),
        MixWeights.toMap)
      .select("doc_id", "source")
  val mixBalanceSql: String = {
    val wRows = MixWeights.map { case (s, w) => s"('$s', $w)" }.mkString(", ")
    s"""WITH w(source, wt) AS (VALUES $wRows),
       |counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
       |j AS (SELECT w.source, w.wt, counts.n FROM w JOIN counts USING (source)),
       |bind AS (SELECT wt, n FROM j ORDER BY CAST(n AS DOUBLE) / wt, source LIMIT 1),
       |th AS (SELECT j.source, (10000 * j.wt * bind.n) // (bind.wt * j.n) AS thresh
       |       FROM j CROSS JOIN bind)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN th ON d.source = th.source
       |WHERE ${stableHash60Sql("CAST(doc_id AS VARCHAR)")} % 10000 < th.thresh""".stripMargin
  }

  /** Temperature-flattened mixture weights (τ = 2): per-source sampling
    * weight ∝ √n and the implied epochs-per-source — the
    * oversampling-vs-repetition dial next to the hard-threshold
    * [[mixBalance]].
    */
  val mixTemperature: Q = (s, d) =>
    Sampling.temperatureWeights(Tables.documents(s, d), col("source"))
  val mixTemperatureSql: String =
    s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       |w AS (SELECT source, n, CAST(round(sqrt(n) * 1000000.0) AS BIGINT) AS w_u FROM c),
       |t AS (SELECT CAST(sum(w_u) AS BIGINT) AS tot, CAST(sum(n) AS BIGINT) AS n_tot FROM w)
       |SELECT source, n, CAST(w_u AS DOUBLE) / tot AS weight,
       |       CAST(w_u AS DOUBLE) / tot * n_tot / n AS epochs
       |FROM w CROSS JOIN t""".stripMargin

  // ------------------------------------------------------- CCNet curation
  /** Unigram-LM quality score (log-free perplexity proxy) per document. */
  val lmQuality: Q = (s, d) =>
    Curation.unigramQuality(Tables.documents(s, d), "doc_id", "text")
  val lmQualitySql: String =
    s"""WITH ${Curation.unigramQualityCtes("documents", "doc_id", "text")}
       |SELECT doc_id, n_tok, score_ppb FROM scored""".stripMargin

  /** The unigram LM as a PERSISTED artifact with an incremental delta:
    * word counts of three quarters of the corpus saved, the last
    * quarter appended (counts are additive — the loader's word-keyed
    * merge is the update), then every document scored against the
    * LOADED reference. Oracle recomputes the LM from the full corpus:
    * artifact-fed scoring must be bit-identical to recompute.
    */
  val lmArtifact: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val path = java.nio.file.Files.createTempDirectory("graft_lm_ref").toFile.getAbsolutePath
    Artifacts.saveLmCounts(doc.filter(col("doc_id") % 4 =!= 2), "text", path)
    Artifacts.appendLmCounts(doc.filter(col("doc_id") % 4 === 2), "text", path)
    Curation.scoreWithReference(doc, "doc_id", "text", Artifacts.loadLmRel(s, path))
  }
  val lmArtifactSql: String = lmQualitySql

  /** C4-style repeated-span scrub: 6-word spans occurring more than
    * once in the corpus survive only at their first owner; documents
    * are REWRITTEN from the surviving spans (the rewrite counterpart
    * of the span-REPORTING queries q_repeated_span/q_contam_span).
    */
  private val ScrubK = 6
  val spanScrub: Q = (s, d) =>
    graft.operators.Rewrite.scrubRepeatedSpans(Tables.documents(s, d), "doc_id", "text", ScrubK)
  val spanScrubSql: String =
    graft.operators.Rewrite.scrubRepeatedSpansSql("documents", "doc_id", "text", ScrubK)

  /** The span-scrub's owner table as a PERSISTED artifact with an
    * incremental delta: owners of 90% of the corpus saved, the last
    * tenth appended (re-minning the union is the merge), then THE
    * DELTA alone rewritten against the loaded owners — the production
    * each-crawl-against-everything-kept rewrite loop that never
    * re-chunks the corpus. The oracle recomputes the FULL-corpus scrub
    * and restricts it to the delta docs: artifact-fed incremental
    * rewriting must be bit-identical to recompute.
    */
  val scrubDelta: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val path = java.nio.file.Files.createTempDirectory("graft_owners").toFile.getAbsolutePath
    Artifacts.saveChunkOwners(doc.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", ScrubK, path)
    Artifacts.appendChunkOwnersDelta(doc.filter(col("doc_id") % 10 === 0), "doc_id", "text", ScrubK, path)
    graft.operators.Rewrite.scrubWithOwners(
      doc.filter(col("doc_id") % 10 === 0), "doc_id", "text", ScrubK,
      Artifacts.loadChunkOwners(s, path))
  }
  val scrubDeltaSql: String =
    graft.operators.Rewrite.scrubRepeatedSpansSql("documents", "doc_id", "text", ScrubK)
      .replace("FROM tot t LEFT JOIN rebuilt r USING (doc_id)",
        "FROM tot t LEFT JOIN rebuilt r USING (doc_id)\nWHERE t.doc_id % 10 = 0")

  /** RefinedWeb-style boilerplate strip: 2-word chunks present in ≥ 3
    * distinct documents of the same source are template noise there
    * and are cut from every document of that source.
    */
  private val BoilerK = 2
  private val BoilerMinDf = 3
  val boilerplateStrip: Q = (s, d) =>
    graft.operators.Rewrite.stripBoilerplate(
      Tables.documents(s, d), "doc_id", "text", "source", BoilerK, BoilerMinDf)
  val boilerplateStripSql: String =
    graft.operators.Rewrite.stripBoilerplateSql(
      "documents", "doc_id", "text", "source", BoilerK, BoilerMinDf)

  /** Per-language head/middle/tail thirds by LM fit (CCNet buckets). */
  val ccnetBucket: Q = (s, d) =>
    Curation.ccnetBuckets(Tables.documents(s, d), "doc_id", "text", "lang")
  val ccnetBucketSql: String =
    Curation.ccnetBucketsSql("documents", "doc_id", "text", "lang")

  /** Cap each source at its 10 largest documents (anti-flooding). */
  private val DomainCapK = 10
  val domainCap: Q = (s, d) =>
    Curation.domainCap(Tables.documents(s, d), "doc_id", "source", "n_chars", DomainCapK)
  val domainCapSql: String =
    Curation.domainCapSql("documents", "doc_id", "source", "n_chars", DomainCapK)

  /** Importance resampling by min-max-normalized quality weight. */
  val weightedSample: Q = (s, d) =>
    Curation.qualityWeightedSample(Tables.documents(s, d), "doc_id", "text")
  val weightedSampleSql: String =
    Curation.qualityWeightedSampleSql("documents", "doc_id", "text")

  /** DSIR hashed-n-gram importance resampling: every 10th document is
    * the curated target slice, the full table is the raw corpus, and
    * the top 25% of raw documents by clipped ratio-weight score are
    * kept. The oracle recomputes the whole chain — bucket hashing,
    * smoothed clipped weights, floored mean scores, histogram-grid
    * threshold — so weight arithmetic drift anywhere fails every row.
    */
  val dsirResample: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    graft.operators.Dsir.resample(
      doc, doc.filter(col("doc_id") % 10 === 0), "doc_id", "text", keepBp = 2500)
  }
  val dsirResampleSql: String =
    graft.operators.Dsir.resampleSql("documents", "doc_id",
      "WHERE doc_id % 10 = 0", keepBp = 2500)

  /** Bigram LM with stupid backoff: even doc_ids are the reference
    * corpus ("train"), odd doc_ids are scored — the held-out split that
    * makes backoff non-vacuous (self-scoring sees all its own bigrams).
    */
  val lmBigram: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    Curation.bigramScoreWithBackoff(
      doc.filter(col("doc_id") % 2 === 1), doc.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
  }
  val lmBigramSql: String =
    Curation.bigramScoreSql("documents", "doc_id", "text",
      "doc_id % 2 = 1", "doc_id % 2 = 0")

  /** Nearest-centroid source classifier: centroids trained on doc_id %
    * 5 != 0, every fifth document held out and classified — the
    * fastText-style weak-label sweep (here the weak label is `source`).
    */
  private val ClassifyTrainWhere = "doc_id % 5 <> 0"
  private val ClassifyScoreWhere = "doc_id % 5 = 0"
  private def classifyPred(s: org.apache.spark.sql.SparkSession, d: String) = {
    val doc = Tables.documents(s, d)
    graft.operators.Classify.centroidClassify(
      doc.filter(expr(ClassifyScoreWhere)), "doc_id", "text",
      graft.operators.Classify.classCentroids(
        doc.filter(expr(ClassifyTrainWhere)), "source", "text"))
  }
  val classify: Q = (s, d) => classifyPred(s, d)
  val classifySql: String =
    s"""WITH ${graft.operators.Classify.classifyCtes("documents", "doc_id", "source",
      "text", ClassifyTrainWhere, ClassifyScoreWhere)}
       |SELECT doc_id, pred, score_ppb FROM pred""".stripMargin

  /** Model interpretability: each class's top-weight centroid words —
    * what the classifier actually keys on (the feature audit run
    * before shipping a weak-label sweep). Per-class top-k via
    * WindowGroupLimit over the classes×vocab centroid table.
    */
  private val ClassifyTopF = 5
  val classifyFeatures: Q = (s, d) => {
    val cen = graft.operators.Classify.classCentroids(
      Tables.documents(s, d).filter(expr(ClassifyTrainWhere)), "source", "text")
    val w = Window.partitionBy(col("_cls")).orderBy(col("_rel_ppb").desc, col("_word"))
    cen.withColumn("rk", row_number().over(w)).filter(col("rk") <= ClassifyTopF)
      .select(col("_cls").as("cls"), col("_word").as("word"),
        col("_rel_ppb").as("rel_ppb"), col("rk").cast("long").as("rk"))
  }
  val classifyFeaturesSql: String =
    s"""WITH ${graft.operators.Classify.centroidCtes("documents", "source", "text", ClassifyTrainWhere)}
       |SELECT cls, w AS word, rel_ppb, CAST(rk AS BIGINT) AS rk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY cls ORDER BY rel_ppb DESC, w) AS rk FROM cen)
       |WHERE rk <= $ClassifyTopF""".stripMargin

  /** The centroid model as a PERSISTED artifact with an incremental
    * delta: counts of most of the train split saved, the last fifth of
    * it appended (per-(class, word) counts are additive — the loader's
    * merge + re-derived class totals ARE the update), then the held-out
    * fifth classified against the LOADED centroids. Oracle recomputes
    * the centroids from the full train split: artifact-fed
    * classification must be bit-identical to recompute.
    */
  val classifyArtifact: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val path = java.nio.file.Files.createTempDirectory("graft_centroids").toFile.getAbsolutePath
    Artifacts.saveCentroidCounts(
      doc.filter(expr(ClassifyTrainWhere) && col("doc_id") % 5 =!= 4), "source", "text", path)
    Artifacts.appendCentroidCounts(
      doc.filter(col("doc_id") % 5 === 4), "source", "text", path)
    graft.operators.Classify.centroidClassify(
      doc.filter(expr(ClassifyScoreWhere)), "doc_id", "text",
      Artifacts.loadCentroids(s, path))
  }
  val classifyArtifactSql: String = classifySql

  /** Held-out confusion matrix of [[classify]] — the classifier's
    * eval artifact (per-class precision/recall inputs).
    */
  val classifyEval: Q = (s, d) =>
    graft.operators.Classify.confusion(
      Tables.documents(s, d).filter(expr(ClassifyScoreWhere)), "doc_id", "source",
      classifyPred(s, d))
  val classifyEvalSql: String =
    s"""WITH ${graft.operators.Classify.classifyCtes("documents", "doc_id", "source",
      "text", ClassifyTrainWhere, ClassifyScoreWhere)}
       |SELECT d.source, p.pred, count(*) AS n
       |FROM documents d JOIN pred p USING (doc_id)
       |WHERE d.$ClassifyScoreWhere
       |GROUP BY 1, 2""".stripMargin

  /** Cross-source 3-gram overlap matrix (which domains mirror each
    * other). 3-grams: at 5 the fixture's source pairs barely collide;
    * at 3 all pairs have signal (same discrimination argument as
    * DecontamN).
    */
  private val OverlapN = 3
  val sourceOverlap: Q = (s, d) =>
    Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", OverlapN)
  val sourceOverlapSql: String = {
    val hashedList =
      s"list_transform(${shinglesSql("w", OverlapN)}, s -> ${stableHash60Sql("s")} % ${P}::BIGINT)"
    s"""WITH w AS (SELECT source, ${wordsSql("text")} AS w FROM documents),
       |sh AS (SELECT DISTINCT source, unnest($hashedList) AS sh_h FROM w),
       |sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
       |i AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.source < b.source
       |      GROUP BY 1, 2)
       |SELECT src_a, src_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       |       inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
       |FROM i JOIN sizes sa ON src_a = sa.source
       |       JOIN sizes sb ON src_b = sb.source""".stripMargin
  }

  /** Domain-authority PageRank over the source-overlap graph: sources
    * sharing ≥ [[PageRankMinInter]] 3-gram shingles are linked (both
    * directions — content mirroring is symmetric), and
    * [[graft.operators.Graph.pageRank]] ranks them in exact integer
    * ppm. The curation read: a source whose content is mirrored by many
    * well-connected sources ranks high (hub/canonical), an isolated
    * source keeps the teleport floor — the domain-level quality weight
    * a Common-Crawl-style pipeline joins onto every document before
    * sampling. Threshold 80 sits above the fixture's median pairwise
    * overlap (~63), so the graph is sparse but connected enough to
    * differentiate ranks at every SF.
    */
  private val PageRankMinInter = 80

  /** Per-(corpus snapshot, SparkContext) memo of computed model state —
    * the in-process face of the compute-once-per-snapshot artifact
    * story: BUILD queries (q_bpe_merges, q_linear_probe,
    * q_source_overlap) always train/compute fresh, so their benched
    * cost stays the true build cost, while CONSUMER queries (tokenize/
    * vocab/segment from the merges, AUC from the weights, rank/triangle
    * stats from the overlap graph) reuse one materialized model —
    * exactly what they do at 100 TB, where the model is a persisted
    * artifact and consumers pay load + apply. Checkpointed DataFrames
    * live on a SparkContext, hence the context in the key.
    */
  // Weak-keyed by the SparkContext OBJECT: a stopped context's
  // checkpointed DataFrames must never be served to a new context
  // (identity-hash keys could collide after GC) and the dead context's
  // entries should become collectable with it.
  private val modelMemo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext,
        java.util.concurrent.ConcurrentHashMap[(String, String), Any]]())
  private def memoized[T](kind: String, s: SparkSession, d: String)(f: => T): T = {
    val perCtx = modelMemo.synchronized {
      modelMemo.computeIfAbsent(s.sparkContext,
        _ => new java.util.concurrent.ConcurrentHashMap[(String, String), Any]())
    }
    perCtx.computeIfAbsent((kind, d), _ => f.asInstanceOf[Any]).asInstanceOf[T]
  }

  /** The thresholded source-overlap pair table (src_a < src_b, inter) —
    * the materialized input graph of the whole authority family.
    */
  private def overlapPairs(s: SparkSession, d: String): DataFrame =
    memoized("overlap_pairs", s, d) {
      Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", OverlapN)
        .filter(col("inter") >= PageRankMinInter)
        .localCheckpoint(true)
    }

  private def sourceRanks(s: SparkSession, d: String): DataFrame = {
    val ov = overlapPairs(s, d)
    val edges = ov.select(col("src_a").as("src"), col("src_b").as("dst"))
      .union(ov.select(col("src_b").as("src"), col("src_a").as("dst")))
    graft.operators.Graph.pageRank(
      Tables.documents(s, d).select(col("source").as("node")).distinct(), edges)
  }
  /** The overlap-graph CTEs (`w, sh, i, e, nodes`) feeding PageRank. */
  private val pageRankGraphCtes: String = {
    val hashedList =
      s"list_transform(${shinglesSql("w", OverlapN)}, s -> ${stableHash60Sql("s")} % ${P}::BIGINT)"
    s"""w AS (SELECT source, ${wordsSql("text")} AS w FROM documents),
       |sh AS (SELECT DISTINCT source, unnest($hashedList) AS sh_h FROM w),
       |i AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.source < b.source
       |      GROUP BY 1, 2 HAVING count(*) >= $PageRankMinInter),
       |e AS (SELECT src_a AS src, src_b AS dst FROM i
       |      UNION ALL SELECT src_b, src_a FROM i),
       |nodes AS (SELECT DISTINCT source AS node FROM documents)""".stripMargin
  }
  val pageRank: Q = (s, d) =>
    sourceRanks(s, d).select(col("node").as("source"), col("out_deg"), col("rank_ppm"))
  val pageRankSql: String =
    s"""WITH $pageRankGraphCtes,
       |${graft.operators.Graph.pageRankCtes()}
       |${graft.operators.Graph.pageRankSelect(nodeAs = "source")}""".stripMargin

  /** Local clustering structure of the SAME overlap graph: per-source
    * triangle membership + clustering coefficient — copy-RING detection
    * (neighbors that also mirror each other) next to PageRank's hub
    * ranking. The a<b<c oriented enumeration is two equi-joins.
    */
  val triangles: Q = (s, d) => {
    val ov = overlapPairs(s, d)
    graft.operators.Graph.triangleStats(
        Tables.documents(s, d).select(col("source").as("node")).distinct(),
        ov.select(col("src_a").as("u"), col("src_b").as("v")))
      .select(col("node").as("source"), col("deg"), col("n_tri"), col("clust_ppm"))
  }
  val trianglesSql: String =
    s"""WITH $pageRankGraphCtes,
       |eu AS (SELECT src_a AS u, src_b AS v FROM i),
       |${graft.operators.Graph.triangleStatsSql(edgeCte = "eu", nodeAs = "source")}""".stripMargin

  /** The rank table as a compute-ONCE-per-corpus-snapshot artifact
    * ([[graft.operators.Artifacts.savePageRank]]): the first consumer
    * in a process pays the graph build + save; every later consumer
    * loads kilobytes of parquet. Keyed by the dataset dir — exactly
    * the reuse a 100 TB curation pipeline gets from materializing
    * domain ranks once per crawl snapshot. NOT additive, so a new
    * snapshot (different dir) rebuilds.
    */
  private val pageRankArtifacts = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def rankArtifactPath(s: SparkSession, d: String): String =
    pageRankArtifacts.computeIfAbsent(d, dir => {
      val path = java.nio.file.Files.createTempDirectory("graft_pagerank").toFile.getAbsolutePath
      graft.operators.Artifacts.savePageRank(sourceRanks(s, dir), path)
      path
    })

  /** The composition the rank exists for: authority-weighted document
    * sampling. Each doc keeps with probability min(rank·10, 1) in ppm
    * via the same deterministic hash-membership machinery as the
    * Sampling family — docs from hub sources survive, isolated-source
    * docs thin to the teleport floor ×10 (~7.5%). The rank table comes
    * FROM the persisted artifact, so the query itself is one broadcast
    * join + one hash filter over loaded parquet — the 100 TB
    * consumption shape — while the oracle recomputes the whole graph,
    * putting save/load parity itself on the hash gate (the
    * q_bm25_artifact proof pattern).
    */
  private val AuthorityBoost = 10
  val authoritySample: Q = (s, d) => {
    val ranks = graft.operators.Artifacts.loadPageRank(s, rankArtifactPath(s, d))
      .select(col("node").as("source"), col("rank_ppm"))
    Tables.documents(s, d).join(broadcast(ranks), Seq("source"))
      .filter(pmod(stableHash60(col("doc_id").cast("string")), lit(graft.operators.Graph.Scale)) <
        least(col("rank_ppm") * AuthorityBoost, lit(graft.operators.Graph.Scale)))
      .select(col("doc_id"), col("source"), col("rank_ppm"))
  }
  val authoritySampleSql: String =
    s"""WITH $pageRankGraphCtes,
       |${graft.operators.Graph.pageRankCtes()},
       |ranks AS (${graft.operators.Graph.pageRankSelect(nodeAs = "source")})
       |SELECT d.doc_id, d.source, ranks.rank_ppm
       |FROM documents d JOIN ranks USING (source)
       |WHERE ${stableHash60Sql("CAST(d.doc_id AS VARCHAR)")} % ${graft.operators.Graph.Scale} < LEAST(ranks.rank_ppm * $AuthorityBoost, ${graft.operators.Graph.Scale})""".stripMargin

  /** BPE tokenizer training over the corpus ([[graft.operators.Bpe]]):
    * q_bpe_merges is the learned merge table itself (the MODEL — 8
    * rules at the fixture scale), q_bpe_tokenize the per-document
    * token counts under that vocabulary (the compression a tokenizer
    * build is judged by), q_bpe_vocab the corpus token-frequency
    * report of the final segmentation. All three share one training
    * definition on each side, so the Spark loop and the DuckDB
    * unrolled-CTE chain cannot drift.
    */
  private val BpeSteps = graft.operators.Bpe.DefaultSteps
  /** One training run per (snapshot, context): the model all consumer
    * queries share — see [[memoized]].
    */
  private def bpeModel(s: SparkSession, d: String): (Seq[graft.operators.Bpe.Merge], DataFrame) =
    memoized("bpe_model", s, d) {
      graft.operators.Bpe.train(Tables.documents(s, d), "text", BpeSteps)
    }
  val bpeMerges: Q = (s, d) => {
    val (merges, _) = graft.operators.Bpe.train(Tables.documents(s, d), "text", BpeSteps)
    import s.implicits._
    merges.toDF("step", "lhs", "rhs", "pair_cnt")
  }
  val bpeMergesSql: String =
    s"""WITH ${graft.operators.Bpe.trainCtes("documents", "text", BpeSteps)}
       |${graft.operators.Bpe.mergesSql(BpeSteps)}""".stripMargin

  val bpeTokenize: Q = (s, d) => {
    val (_, vocab) = bpeModel(s, d)
    graft.operators.Bpe.tokenize(Tables.documents(s, d), "doc_id", "text", vocab)
  }
  val bpeTokenizeSql: String =
    s"""WITH ${graft.operators.Bpe.trainCtes("documents", "text", BpeSteps)},
       |v AS (SELECT word, len(string_split(trim(sym), '  ')) AS n_sym FROM w$BpeSteps),
       |tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS word FROM documents)
       |SELECT doc_id, count(*) AS n_words, CAST(sum(v.n_sym) AS BIGINT) AS n_bpe
       |FROM tok JOIN v USING (word) GROUP BY 1""".stripMargin

  private val BpeVocabK = 20
  val bpeVocab: Q = (s, d) => {
    val (_, vocab) = bpeModel(s, d)
    graft.operators.Bpe.tokenFrequencies(vocab)
      .orderBy(col("freq").desc, col("tok")).limit(BpeVocabK)
  }
  val bpeVocabSql: String =
    s"""WITH ${graft.operators.Bpe.trainCtes("documents", "text", BpeSteps)},
       |toks AS (SELECT tok, CAST(sum(cnt) AS BIGINT) AS freq FROM (
       |  SELECT cnt, unnest(string_split(trim(sym), '  ')) AS tok FROM w$BpeSteps) GROUP BY 1)
       |SELECT tok, freq FROM toks ORDER BY freq DESC, tok LIMIT $BpeVocabK""".stripMargin

  /** The training-batch assembly capstone: BPE-tokenize every document
    * under the trained merges, then pack the REAL token counts into
    * fixed-budget sequences ([[graft.operators.Packing.packCounts]]) —
    * tokenizer → counts → one hash-shard shuffle → prefix-sum
    * placement, the end-to-end path a GPT-style data loader runs. The
    * oracle replays the whole chain: the unrolled BPE training CTEs
    * feed the same window arithmetic.
    */
  private val TokenPackShards = 8
  private val TokenPackBudget = 256
  val tokenPipeline: Q = (s, d) => {
    val (_, vocab) = bpeModel(s, d)
    val counts = graft.operators.Bpe.tokenize(Tables.documents(s, d), "doc_id", "text", vocab)
    graft.operators.Packing.packCounts(counts, "doc_id", "n_bpe",
      TokenPackShards, TokenPackBudget)
  }
  val tokenPipelineSql: String =
    s"""WITH ${graft.operators.Bpe.trainCtes("documents", "text", BpeSteps)},
       |v AS (SELECT word, len(string_split(trim(sym), '  ')) AS n_sym FROM w$BpeSteps),
       |tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS word FROM documents),
       |counts AS (SELECT doc_id, CAST(sum(v.n_sym) AS INTEGER) AS n_tokens
       |           FROM tok JOIN v USING (word) GROUP BY 1),
       |t AS (SELECT doc_id,
       |             ${stableHash60Sql("CAST(doc_id AS VARCHAR)")} % ${TokenPackShards}::BIGINT AS shard,
       |             n_tokens FROM counts),
       |c AS (SELECT doc_id, shard, n_tokens,
       |             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
       |      FROM t)
       |SELECT doc_id, shard, n_tokens, cum - n_tokens AS start_tok,
       |       (cum - n_tokens) // $TokenPackBudget AS first_chunk,
       |       ((cum - 1) // $TokenPackBudget) - ((cum - n_tokens) // $TokenPackBudget) + 1 AS n_chunks
       |FROM c""".stripMargin

  /** The pretraining-corpus MEGA-capstone: every family of the 100 TB
    * story chained end-to-end under ONE hash gate —
    *
    *   mixed binary shard (PDF/DOCX/PPTX/EPUB payloads, groups of 3
    *   doc_ids sharing one payload so exact duplicates genuinely
    *   exist) → magic-byte dispatch + per-format TEXT extraction
    *   ([[graft.operators.CorpusIngest.dispatch]]) → exact dedup
    *   (md5 keep-oldest) → Gopher quality rules (the min-word-count /
    *   word-length / repetition battery — on this template corpus the
    *   load-bearing rule is the ≥[[PretrainMinWords]]-word floor,
    *   which drops the 1-page docx/pptx/epub shards; a mean-score
    *   bucketing would be degenerate here because template docs
    *   collapse to near-identical scores) → per-format domain cap
    *   (top-[[PretrainCapK]] by n_chars) → BPE tokenization under the
    *   `documents`-trained merges → fixed-budget sequence packing.
    *
    * Each stage is the SAME operator its standalone query gates, but
    * applied to the previous stage's survivors — so a drift anywhere
    * (a codec byte, a dedup key, a quality threshold, a cap ordering,
    * a merge rank, a prefix sum) flips rows here. The oracle rebuilds
    * the extracted text closed-form and replays the whole funnel in
    * SQL. Scale shape: extraction/dedup-key/tokenize are map-side
    * projections; ONE exchange for the dedup window, one bounded
    * histogram for quality, a 4-partition WindowGroupLimit for the
    * cap, one hash-shard exchange for packing — no global windows.
    */
  private[queries] val PretrainCapK = 20
  private[queries] val PretrainMinWords = 10L
  val pretrainCorpus: Q = (s, d) => {
    val (merges, _) = bpeModel(s, d)
    val grp = expr("doc_id div 3")
    val seed = grp * lit(101L)
    // page count varies on grp div 4 so it is UNCORRELATED with the
    // format (= grp % 4): every format gets both 1- and 2-page docs,
    // and the quality word-floor cuts within each format, not a
    // format wholesale
    val pages = (pmod(expr("doc_id div 12"), lit(2)) + lit(1)).cast("int")
    val idx = pmod(grp, lit(4))
    val payload = when(idx === 0, graft.functions.PdfOps.synthPdfText(seed, pages))
      .when(idx === 1, graft.functions.OfficeOps.synthDocx(seed, pages))
      .when(idx === 2, graft.functions.OfficeOps.synthPptx(seed, pages))
      .otherwise(graft.functions.OfficeOps.synthEpub(seed, pages))
    val (format, text) = graft.operators.CorpusIngest.dispatch(col("payload"))
    val extracted = Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("payload", payload)
      .select(col("doc_id"), format.as("format"), text.as("text"))
      .withColumn("n_chars", length(col("text")))
    val s1 = extracted
      .withColumn("_keeper", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("_keeper")).drop("_keeper")
    val s2 = s1.join(
      TextAnalysis.gopherRules(s1, "doc_id", "text", PretrainMinWords, 1000L, 2L, 20L, 2L, 0L)
        .filter(col("keep")).select("doc_id"),
      "doc_id")
    val s3 = s2
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("format")).orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("_rk") <= PretrainCapK).drop("_rk")
    val counts = s3
      .select(col("doc_id"),
        explode(filter(words(col("text")), w => length(w) > 0)).as("word"))
      .select(col("doc_id"),
        size(graft.operators.Bpe.segmentExpr(col("word"), merges)).as("n_sym"))
      .groupBy("doc_id").agg(sum("n_sym").as("n_bpe"))
    graft.operators.Packing.packCounts(counts, "doc_id", "n_bpe",
        TokenPackShards, TokenPackBudget)
      .withColumn("format", expr(
        "CASE (doc_id div 3) % 4 WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx' " +
          "WHEN 2 THEN 'pptx' ELSE 'epub' END"))
  }
  val pretrainCorpusSql: String = {
    val segChain = graft.operators.Bpe.segmentSql(
      graft.operators.Bpe.spacedSql("word"), BpeSteps)
    s"""WITH ${graft.operators.Bpe.trainCtes("documents", "text", BpeSteps)},
       |g AS (SELECT doc_id, doc_id // 3 AS grp FROM documents),
       |pdfp AS (
       |  SELECT g.doc_id, p.p,
       |         'Doc ' || (g.grp * 101) || ' page ' || p.p ||
       |           ' line one (escaped)' || chr(10) ||
       |           'kerned words here' || chr(10) || 'café three' AS pt
       |  FROM g, generate_series(0, 1) p(p)
       |  WHERE g.grp % 4 = 0 AND p.p <= (g.grp // 4) % 2),
       |docxp AS (
       |  SELECT g.doc_id, p.p,
       |         'Para ' || p.p || ' of doc ' || (g.grp * 101) ||
       |           ' — café & tab:' || chr(9) || 'end' AS pt
       |  FROM g, generate_series(0, 1) p(p)
       |  WHERE g.grp % 4 = 1 AND p.p <= (g.grp // 4) % 2),
       |pptxp AS (
       |  SELECT g.doc_id, p.p,
       |         'Slide ' || p.p || ' of deck ' || (g.grp * 101) || chr(10) ||
       |           'bullet & point ' || (g.grp * 101) % 100 AS pt
       |  FROM g, generate_series(0, 1) p(p)
       |  WHERE g.grp % 4 = 2 AND p.p <= (g.grp // 4) % 2),
       |epubp AS (
       |  SELECT g.doc_id, p.p,
       |         'Chapter ' || p.p || chr(10) || 'Book ' || (g.grp * 101) ||
       |           ' prose & café line ' || p.p || '.' AS pt
       |  FROM g, generate_series(0, 1) p(p)
       |  WHERE g.grp % 4 = 3 AND p.p <= (g.grp // 4) % 2),
       |allp AS (SELECT * FROM pdfp UNION ALL SELECT * FROM docxp
       |         UNION ALL SELECT * FROM pptxp UNION ALL SELECT * FROM epubp),
       |ext AS (SELECT doc_id, string_agg(pt, chr(10) ORDER BY p) AS text
       |        FROM allp GROUP BY 1),
       |meta AS (SELECT doc_id, text,
       |                CASE (doc_id // 3) % 4 WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
       |                     WHEN 2 THEN 'pptx' ELSE 'epub' END AS format,
       |                length(text) AS n_chars FROM ext),
       |s1 AS (SELECT * FROM (
       |         SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM meta)
       |       WHERE doc_id = keeper),
       |${TextAnalysis.gopherRulesCtes("gq", "s1", "doc_id", "text")},
       |gqkeep AS (SELECT doc_id FROM gqd
       |           WHERE ${TextAnalysis.gopherKeepSql(PretrainMinWords, 1000L, 2L, 20L, 2L, 0L)}),
       |s2 AS (SELECT s1.* FROM s1 JOIN gqkeep USING (doc_id)),
       |s3 AS (SELECT * FROM (
       |         SELECT *, row_number() OVER (PARTITION BY (doc_id // 3) % 4
       |                     ORDER BY n_chars DESC, doc_id) AS rk FROM s2)
       |       WHERE rk <= $PretrainCapK),
       |tw AS (SELECT doc_id, unnest(list_filter(${wordsSql("text")}, x -> length(x) > 0)) AS word FROM s3),
       |seg AS (SELECT doc_id, len(string_split(trim($segChain), '  ')) AS n_sym FROM tw),
       |cnts AS (SELECT doc_id, CAST(sum(n_sym) AS INTEGER) AS n_tokens FROM seg GROUP BY 1),
       |sh1 AS (SELECT doc_id,
       |               ${stableHash60Sql("CAST(doc_id AS VARCHAR)")} % ${TokenPackShards}::BIGINT AS shard,
       |               n_tokens FROM cnts),
       |pk AS (SELECT doc_id, shard, n_tokens,
       |              CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
       |       FROM sh1)
       |SELECT doc_id, shard, n_tokens, cum - n_tokens AS start_tok,
       |       (cum - n_tokens) // $TokenPackBudget AS first_chunk,
       |       ((cum - 1) // $TokenPackBudget) - ((cum - n_tokens) // $TokenPackBudget) + 1 AS n_chunks,
       |       CASE (doc_id // 3) % 4 WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
       |            WHEN 2 THEN 'pptx' ELSE 'epub' END AS format
       |FROM pk""".stripMargin
  }

  /** Tokenizer INFERENCE on a table the model never saw: merges learned
    * on `documents` segment `part.p_name` words (unseen words fall back
    * to finer pieces — the deployment behavior). One codegen'd
    * projection of chained literal replaces; the oracle re-learns the
    * merges and applies the same chain via scalar subqueries.
    */
  val bpeSegment: Q = (s, d) => {
    val (merges, _) = bpeModel(s, d)
    Tables.part(s, d)
      .select(col("p_partkey"),
        explode(filter(words(col("p_name")), w => length(w) > 0)).as("word"))
      .select(col("p_partkey"), col("word"),
        graft.operators.Bpe.segmentExpr(col("word"), merges).as("_toks"))
      .select(col("p_partkey"), col("word"),
        array_join(col("_toks"), "_").as("seg"),
        size(col("_toks")).cast("long").as("n_sym"))
  }
  val bpeSegmentSql: String = {
    val chain = graft.operators.Bpe.segmentSql(graft.operators.Bpe.spacedSql("word"), BpeSteps)
    s"""WITH ${graft.operators.Bpe.trainCtes("documents", "text", BpeSteps)},
       |pw AS (SELECT p_partkey, unnest(list_filter(${wordsSql("p_name")}, x -> length(x) > 0)) AS word FROM part),
       |seg0 AS (SELECT p_partkey, word, string_split(trim($chain), '  ') AS toks FROM pw)
       |SELECT p_partkey, word, array_to_string(toks, '_') AS seg, len(toks) AS n_sym FROM seg0""".stripMargin
  }

  /** The merge table as a PERSISTED artifact: train, save, load, then
    * segment the training corpus from the LOADED model. The oracle
    * recomputes via the training chain (bpeTokenizeSql), so this query
    * simultaneously proves (a) the artifact round-trip is lossless and
    * (b) rank-ordered inference ([[graft.operators.Bpe.segmentExpr]])
    * reproduces the training segmentation exactly on in-corpus words.
    */
  val bpeArtifact: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val (merges, _) = bpeModel(s, d)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toFile.getAbsolutePath
    Artifacts.saveBpeMerges(merges, s, path)
    val loaded = Artifacts.loadBpeMerges(s, path)
    docs.select(col("doc_id"), explode(filter(words(col("text")), w => length(w) > 0)).as("word"))
      .select(col("doc_id"), size(graft.operators.Bpe.segmentExpr(col("word"), loaded)).as("n_sym"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe"))
  }
  val bpeArtifactSql: String = bpeTokenizeSql

  /** Unigram-LM (SentencePiece-style) tokenizer
    * ([[graft.operators.Unigram]]) — the other subword family:
    * q_unigram_vocab is the trained model itself (pieces with
    * integer frequencies and fixed-point-log2 costs after seeding +
    * hard-EM), q_unigram_segment the per-document Viterbi
    * segmentation stats under that model. The oracle re-trains the
    * whole model in SQL — seed substring counts, the repeated-
    * squaring fplog2 chain, and the unrolled per-position DP — so a
    * drift anywhere (seed tie-break, a log bit, an EM count, a
    * Viterbi tie) flips rows on both queries.
    */
  private def unigramModel(s: SparkSession, d: String): Seq[graft.operators.Unigram.Piece] =
    memoized("unigram_model", s, d) {
      graft.operators.Unigram.train(Tables.documents(s, d), "text")
    }
  val unigramVocab: Q = (s, d) => {
    val model = unigramModel(s, d)
    import s.implicits._
    model.map(p => (p.piece, p.freq, p.cost)).toDF("piece", "freq", "cost_u")
  }
  val unigramVocabSql: String =
    s"""WITH ${graft.operators.Unigram.trainCtes("documents", "text")}
       |SELECT piece, CAST(freq AS BIGINT) AS freq, CAST(cost AS BIGINT) AS cost_u
       |FROM uv${graft.operators.Unigram.DefaultRounds}""".stripMargin

  val unigramSegment: Q = (s, d) => {
    val model = unigramModel(s, d)
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(filter(words(col("text")), w => length(w) > 0)).as("word"))
      .select(col("doc_id"),
        graft.operators.Unigram.segmentExpr(col("word"), model).as("seg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("seg.k")).as("n_pieces"),
        sum(col("seg.c")).as("cost_u"))
  }
  val unigramSegmentSql: String =
    s"""WITH ${graft.operators.Unigram.trainCtes("documents", "text")},
       |utok AS (SELECT doc_id, unnest(list_filter(${wordsSql("text")}, x -> length(x) > 0)) AS word FROM documents)
       |SELECT doc_id, count(*) AS n_words,
       |       CAST(sum(sg.dp.k) AS BIGINT) AS n_pieces,
       |       CAST(sum(sg.dp.c) AS BIGINT) AS cost_u
       |FROM utok JOIN useg_final sg USING (word) GROUP BY 1""".stripMargin

  /** Side-by-side tokenizer evaluation — the fertility/compression
    * numbers a team reads when choosing between the two trained
    * subword models: per tokenizer, corpus word/piece/char totals and
    * the integer ratios pieces-per-1000-words (fertility) and
    * chars-per-piece×100 (compression). Both segmenters run over the
    * SAME distinct-word table with occurrence weights, so the compare
    * is one pass over the vocabulary, not the corpus; the oracle
    * replays BOTH training chains and the same integer ratios.
    */
  val tokenizerEval: Q = (s, d) => {
    val (merges, _) = bpeModel(s, d)
    val uni = unigramModel(s, d)
    val base = Tables.documents(s, d)
      .select(explode(filter(words(col("text")), x => length(x) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val bpe = base.select(lit("bpe").as("tokenizer"), col("cnt"),
      length(col("word")).as("len"),
      size(graft.operators.Bpe.segmentExpr(col("word"), merges)).as("k"))
    val ug = base.select(lit("unigram").as("tokenizer"), col("cnt"),
      length(col("word")).as("len"),
      graft.operators.Unigram.segmentExpr(col("word"), uni)
        .getField("k").cast("int").as("k"))
    bpe.unionAll(ug)
      .groupBy("tokenizer")
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("k")).as("n_pieces"),
        sum(col("cnt") * col("len")).as("n_chars"))
      .withColumn("pieces_per_1k_words", expr("n_pieces * 1000 div n_words"))
      .withColumn("chars_per_piece_x100", expr("n_chars * 100 div n_pieces"))
  }
  val tokenizerEvalSql: String =
    s"""WITH ${graft.operators.Bpe.trainCtes("documents", "text", BpeSteps)},
       |${graft.operators.Unigram.trainCtes("documents", "text")},
       |bv AS (SELECT word, len(string_split(trim(sym), '  ')) AS k FROM w$BpeSteps),
       |tstats AS (
       |  SELECT 'bpe' AS tokenizer, CAST(sum(cnt) AS BIGINT) AS n_words,
       |         CAST(sum(cnt * k) AS BIGINT) AS n_pieces,
       |         CAST(sum(cnt * length(word)) AS BIGINT) AS n_chars
       |  FROM wc JOIN bv USING (word)
       |  UNION ALL
       |  SELECT 'unigram', CAST(sum(cnt) AS BIGINT),
       |         CAST(sum(cnt * dp.k) AS BIGINT),
       |         CAST(sum(cnt * length(word)) AS BIGINT)
       |  FROM useg_final)
       |SELECT tokenizer, n_words, n_pieces, n_chars,
       |       n_pieces * 1000 // n_words AS pieces_per_1k_words,
       |       n_chars * 100 // n_pieces AS chars_per_piece_x100
       |FROM tstats""".stripMargin

  /** The unigram model as a PERSISTED artifact: train, save the piece
    * table, load, segment the training corpus from the LOADED model —
    * proving the artifact round trip is lossless exactly as
    * q_bpe_artifact does for merges. The oracle recomputes via the
    * training chain, so a drift in save/load (a dropped piece, a cost
    * bit) flips rows.
    */
  val unigramArtifact: Q = (s, d) => {
    val model = unigramModel(s, d)
    val path = java.nio.file.Files.createTempDirectory("graft_unigram").toFile.getAbsolutePath
    Artifacts.saveUnigramModel(model, s, path)
    val loaded = Artifacts.loadUnigramModel(s, path)
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(filter(words(col("text")), w => length(w) > 0)).as("word"))
      .select(col("doc_id"),
        graft.operators.Unigram.segmentExpr(col("word"), loaded).as("seg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("seg.k")).as("n_pieces"),
        sum(col("seg.c")).as("cost_u"))
  }
  val unigramArtifactSql: String = unigramSegmentSql

  /** Unigram-LM INFERENCE on a table the model never saw: the
    * `documents`-trained pieces Viterbi-segment `part.p_name` words —
    * unseen multi-char pieces never fire, unseen single chars cost
    * [[graft.operators.Unigram.UnkCost]] (the deployment behavior,
    * mirroring q_bpe_segment's role for BPE). The oracle re-trains
    * the model and runs the SAME per-position DP over the part
    * vocabulary via [[graft.operators.Unigram.inferCtes]], so path
    * string, piece count, and integer cost are all engine-exact.
    */
  val unigramInfer: Q = (s, d) => {
    val model = unigramModel(s, d)
    Tables.part(s, d)
      .select(col("p_partkey"),
        explode(filter(words(col("p_name")), w => length(w) > 0)).as("word"))
      .select(col("p_partkey"), col("word"),
        graft.operators.Unigram.segmentExpr(col("word"), model).as("seg"))
      .select(col("p_partkey"), col("word"),
        col("seg.p").as("pieces"),
        col("seg.k").cast("long").as("n_pieces"),
        col("seg.c").cast("long").as("cost_u"))
  }
  val unigramInferSql: String =
    s"""WITH ${graft.operators.Unigram.trainCtes("documents", "text")},
       |pwc AS (SELECT word, count(*) AS cnt FROM (
       |  SELECT unnest(list_filter(${wordsSql("p_name")}, x -> length(x) > 0)) AS word
       |  FROM part) GROUP BY 1),
       |${graft.operators.Unigram.inferCtes("pinf", "pwc")},
       |ptok AS (SELECT p_partkey, unnest(list_filter(${wordsSql("p_name")}, x -> length(x) > 0)) AS word FROM part)
       |SELECT p_partkey, word, i.dp.p AS pieces,
       |       CAST(i.dp.k AS BIGINT) AS n_pieces,
       |       CAST(i.dp.c AS BIGINT) AS cost_u
       |FROM ptok JOIN pinf i USING (word)""".stripMargin

  /** Trained linear quality probe ([[graft.operators.Probe]]): 12 steps
    * of exact-integer full-batch GD separating embeddings with label 0
    * from the rest (measured binned AUC ≈ 0.81 vs the 0.82 float
    * least-squares ceiling at sf0.01). q_linear_probe is the learned
    * weight table (the model); q_probe_auc its ROC eval on the fixed
    * 256-bin score histogram.
    */
  private val ProbePosLabel = 0
  private def probeFeat(s: SparkSession, d: String): DataFrame =
    graft.operators.Probe.features(Tables.embeddings(s, d), "vec_id", "embedding",
      "label", ProbePosLabel).localCheckpoint(true)
  val linearProbe: Q = (s, d) =>
    graft.operators.Probe.train(probeFeat(s, d))
      .select(col("j").as("bucket"), col("w").as("weight"))
  val linearProbeSql: String =
    s"""WITH ${graft.operators.Probe.trainCtes("embeddings", "vec_id", "embedding",
      "label", ProbePosLabel)}
       |SELECT j AS bucket, w AS weight FROM w${graft.operators.Probe.DefaultSteps}""".stripMargin

  /** One (features, trained weights) pair per (snapshot, context) for
    * the EVAL query — q_linear_probe, the build, still trains fresh.
    */
  private def trainedProbe(s: SparkSession, d: String): (DataFrame, DataFrame) =
    memoized("probe_model", s, d) {
      val feat = probeFeat(s, d)
      (feat, graft.operators.Probe.train(feat).localCheckpoint(true))
    }
  val probeAuc: Q = (s, d) => {
    val (feat, weights) = trainedProbe(s, d)
    graft.operators.Probe.binnedAuc(graft.operators.Probe.score(feat, weights))
  }
  val probeAucSql: String =
    s"""WITH ${graft.operators.Probe.trainCtes("embeddings", "vec_id", "embedding",
      "label", ProbePosLabel)},
       |${graft.operators.Probe.aucSql()}""".stripMargin

  /** Incremental probe training through the weight artifact: 8 GD steps
    * on 80% of the data, weights persisted, then 4 warm-start steps over
    * the full set from the LOADED model — the resume-don't-retrain path
    * when labeled data arrives. The oracle replays both phases (two
    * feature sets, continuous step numbering), so the persisted handoff
    * must be bit-lossless for the hashes to agree.
    */
  private val ProbeWarmSteps = 8
  private val ProbeFineSteps = 4
  val probeArtifact: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val featA = graft.operators.Probe.features(
      emb.filter(col("vec_id") % 5 =!= 4), "vec_id", "embedding",
      "label", ProbePosLabel).localCheckpoint(true)
    val w8 = graft.operators.Probe.train(featA, ProbeWarmSteps)
    val path = java.nio.file.Files.createTempDirectory("graft_probe").toFile.getAbsolutePath
    Artifacts.saveProbeWeights(w8, path)
    graft.operators.Probe.train(probeFeat(s, d), ProbeFineSteps,
        init = Some(Artifacts.loadProbeWeights(s, path)))
      .select(col("j").as("bucket"), col("w").as("weight"))
  }
  val probeArtifactSql: String = {
    val Pb = graft.operators.Probe
    s"""WITH ${Pb.embedCte("embeddings", "vec_id", "embedding", "label", ProbePosLabel)},
       |${Pb.featSetCtes("feat_a", "nn_a", "vec_id % 5 != 4")},
       |w0 AS MATERIALIZED (SELECT unnest(range(0, ${Pb.Dim + 1})) AS j, CAST(0 AS BIGINT) AS w),
       |${Pb.gdStepCtes("feat_a", "nn_a", 1, ProbeWarmSteps)},
       |${Pb.featSetCtes("feat", "nn")},
       |${Pb.gdStepCtes("feat", "nn", ProbeWarmSteps + 1, ProbeWarmSteps + ProbeFineSteps)}
       |SELECT j AS bucket, w AS weight FROM w${ProbeWarmSteps + ProbeFineSteps}""".stripMargin
  }

  /** Content-defined passage dedup. Divisor 4 ≈ 4-word expected chunks
    * — at the fixture's ~60-word docs that yields hundreds of shared
    * passages; production corpora use larger divisors (64-128 words).
    */
  private val CdcDivisor = 4
  val cdcDedup: Q = (s, d) =>
    graft.operators.Packing.duplicatePassages(Tables.documents(s, d), "doc_id", "text", CdcDivisor)
  val cdcDedupSql: String =
    graft.operators.Packing.duplicatePassagesSql("documents", "doc_id", "text", CdcDivisor)

  /** MinHash estimate vs exact source overlap — the sketch-accuracy
    * eval (ship K-long signatures at 100 TB, validate the trade here).
    */
  val sourceOverlapEst: Q = (s, d) =>
    Dedup.sourceOverlapEstimate(Tables.documents(s, d), "source", "text", OverlapN)
  val sourceOverlapEstSql: String = {
    val hashedList =
      s"list_transform(${shinglesSql("w", OverlapN)}, s -> ${stableHash60Sql("s")} % ${P}::BIGINT)"
    s"""WITH w AS (SELECT source, ${wordsSql("text")} AS w FROM documents),
       |sh AS (SELECT DISTINCT source, unnest($hashedList) AS sh_h FROM w),
       |hs AS (SELECT source, list(sh_h) AS hs FROM sh GROUP BY 1),
       |sig AS (SELECT source, ${minhashSignatureSql("hs")} AS sig FROM hs),
       |sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
       |i AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.source < b.source
       |      GROUP BY 1, 2),
       |ex AS (SELECT src_a, src_b,
       |              inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
       |       FROM i JOIN sizes sa ON src_a = sa.source
       |              JOIN sizes sb ON src_b = sb.source),
       |m AS (SELECT src_a, src_b, jaccard,
       |             CAST(list_sum(list_transform(generate_series(1, ${Hashing.MinhashK}),
       |               k -> CASE WHEN x.sig[k] = y.sig[k] THEN 1 ELSE 0 END)) AS BIGINT) AS sig_matches
       |      FROM ex JOIN sig x ON src_a = x.source JOIN sig y ON src_b = y.source)
       |SELECT src_a, src_b, jaccard, sig_matches,
       |       sig_matches / ${Hashing.MinhashK} AS est,
       |       abs(sig_matches / ${Hashing.MinhashK} - jaccard) AS err
       |FROM m""".stripMargin
  }

  /** The staged curation funnel report (raw → exact dedup → quality →
    * domain cap), docs and tokens per stage.
    */
  val curationFunnel: Q = (s, d) =>
    Curation.curationFunnel(Tables.documents(s, d), "doc_id", "text",
      "lang", "source", "n_chars", DomainCapK)
  val curationFunnelSql: String =
    Curation.curationFunnelSql("documents", "doc_id", "text",
      "lang", "source", "n_chars", DomainCapK)

  /** Exact-15 uniform eval sample per language. */
  private val ReservoirK = 15
  val reservoir: Q = (s, d) =>
    Sampling.reservoirPerStratum(Tables.documents(s, d), col("doc_id"), col("lang"), ReservoirK)
      .select("doc_id", "lang", "rk")
  val reservoirSql: String =
    s"""SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk FROM (
       |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
       |           ORDER BY ${stableHash60Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
       |  FROM documents) WHERE rk <= $ReservoirK""".stripMargin

  /** Token-budget mixture plan at a 100k-token budget (≈3× the sf0.01
    * corpus, so the epochs>1 repeat dial is visible).
    */
  private val MixBudget = 100000L
  val mixPlan: Q = (s, d) =>
    Sampling.mixTokenPlan(Tables.documents(s, d), col("source"), col("text"), MixBudget)
  val mixPlanSql: String =
    s"""WITH t AS (SELECT source, count(*) AS n_docs,
       |                  CAST(sum(len(list_filter(${wordsSql("text")}, x -> length(x) > 0))) AS BIGINT) AS n_tokens
       |           FROM documents GROUP BY 1),
       |w AS (SELECT *, CAST(round(sqrt(n_tokens) * 1000000.0) AS BIGINT) AS w_u FROM t),
       |tot AS (SELECT CAST(sum(w_u) AS BIGINT) AS tw FROM w),
       |p AS (SELECT source, n_docs, n_tokens,
       |             CAST(w_u AS DOUBLE) / tw AS weight,
       |             CAST(round($MixBudget * (CAST(w_u AS DOUBLE) / tw)) AS BIGINT) AS alloc_tokens
       |      FROM w, tot)
       |SELECT source, n_docs, n_tokens, weight, alloc_tokens,
       |       CASE WHEN n_tokens = 0 THEN 0
       |            ELSE least(10000, alloc_tokens * 10000 // n_tokens) END AS keep_frac_bp,
       |       CASE WHEN n_tokens = 0 THEN 0.0
       |            ELSE CAST(alloc_tokens AS DOUBLE) / n_tokens END AS epochs
       |FROM p""".stripMargin

  /** Per-domain quality profile: which sources are garbage — doc count,
    * integer-mean LM score, and the share of docs in the per-language
    * tail bucket.
    */
  val sourceQuality: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    docs.select(col("doc_id"), col("source"))
      .join(Curation.ccnetBuckets(docs, "doc_id", "text", "lang"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(score_ppb) div count(1)").as("mean_score_ppb"),
        sum(when(col("bucket") === "tail", 1L).otherwise(0L)).as("n_tail"))
      .withColumn("tail_share", col("n_tail").cast("double") / col("n_docs"))
  }
  val sourceQualitySql: String =
    s"""WITH ${graft.operators.Curation.ccnetBucketCtes("documents", "doc_id", "text", "lang")}
       |SELECT d.source, count(*) AS n_docs,
       |       CAST(sum(score_ppb) // count(*) AS BIGINT) AS mean_score_ppb,
       |       CAST(sum(CASE WHEN bucket = 'tail' THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
       |       CAST(sum(CASE WHEN bucket = 'tail' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS tail_share
       |FROM documents d JOIN bucketed USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** IVF index-health report: per inverted list, population and the
    * integer-micro-unit mean/min cosine to the assigned centroid —
    * the retrain/rebalance signal an ANN index operator watches (a
    * sparse or loose list means the coarse quantizer no longer fits
    * the data). Sims quantize to micro-units BEFORE the reassociating
    * sum, same discipline as the k-means update.
    */
  val ivfHealth: Q = (s, d) =>
    Similarity.withIvfAssignment(Tables.embeddings(s, d), "embedding", Dim, IvfCentroids)
      .withColumn("_u", round(col("ivf_sim") * 1e6).cast("long"))
      .groupBy(col("ivf_list"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(_u) div count(1)").as("mean_sim_u"),
        min("_u").as("min_sim_u"))
  val ivfHealthSql: String = {
    def lit64(c: Seq[Double]): String = c.mkString("[", ", ", "]")
    val c0Rows = IvfCentroids.zipWithIndex
      .map { case (c, i) => s"($i, ${lit64(c)})" }.mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${dotFoldSql("v", "v", Dim)}) AS nrm FROM e),
       |c0(list_id, cv) AS (VALUES
       |  $c0Rows),
       |a0 AS (SELECT n.vec_id, c0.list_id,
       |              ${dotFoldSql("n.v", "c0.cv", Dim)} / (n.nrm * sqrt(${dotFoldSql("c0.cv", "c0.cv", Dim)})) AS sim
       |       FROM n CROSS JOIN c0),
       |l0 AS (SELECT vec_id, list_id, sim
       |       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn FROM a0)
       |       WHERE rn = 1),
       |u AS (SELECT list_id, CAST(round(sim * 1000000.0) AS BIGINT) AS su FROM l0)
       |SELECT list_id AS ivf_list, count(*) AS n_vecs,
       |       CAST(sum(su) // count(*) AS BIGINT) AS mean_sim_u,
       |       min(su) AS min_sim_u
       |FROM u GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------ URL layer
  /** Synthetic messy-URL column, every component closed-form in
    * doc_id so the oracle rebuilds the identical input: `variant`
    * cycles the real-world noise shapes (case/www/default-port/
    * trailing-slash/fragment, tracking-only query, userinfo +
    * non-default port + mixed query) around one logical target per
    * `base`. `mod` controls the variant cycle length.
    */
  private def messyUrl(base: Column, variant: Column): Column = {
    val b = base.cast("string")
    val suf = when(pmod(base, lit(5)) < 2, lit(".co.uk"))
      .when(pmod(base, lit(5)) === 2, lit(".or.jp"))
      .when(pmod(base, lit(5)) === 3, lit(".github.io"))
      .otherwise(lit(".com"))
    val host = concat(lit("site"), b, suf)
    when(variant === 0, concat(lit("https://"), host, lit("/doc/"), b))
      .when(variant === 1,
        concat(lit("HTTPS://WWW."), upper(host), lit(":443/doc/"), b, lit("/#frag")))
      .when(variant === 2,
        concat(lit("https://"), host, lit("/doc/"), b, lit("?utm_source=feed&fbclid=x&gclid=1")))
      .otherwise(
        concat(lit("https://u:p@"), host, lit(":8080/doc/"), b, lit("?ref=1&utm_medium=m")))
  }
  private def messyUrlSqlCte(baseExpr: String, variantExpr: String): String =
    s"""b AS (SELECT doc_id, $baseExpr AS base, $variantExpr AS variant FROM documents),
       |h AS (SELECT doc_id, base, variant,
       |             'site' || base || (CASE WHEN base % 5 < 2 THEN '.co.uk'
       |                                     WHEN base % 5 = 2 THEN '.or.jp'
       |                                     WHEN base % 5 = 3 THEN '.github.io'
       |                                     ELSE '.com' END) AS host
       |      FROM b),
       |u AS (SELECT doc_id,
       |  CASE variant
       |    WHEN 0 THEN 'https://' || host || '/doc/' || base
       |    WHEN 1 THEN 'HTTPS://WWW.' || upper(host) || ':443/doc/' || base || '/#frag'
       |    WHEN 2 THEN 'https://' || host || '/doc/' || base || '?utm_source=feed&fbclid=x&gclid=1'
       |    ELSE 'https://u:p@' || host || ':8080/doc/' || base || '?ref=1&utm_medium=m'
       |  END AS url FROM h)""".stripMargin

  /** Row-level gate of the whole [[graft.functions.UrlOps]] spec:
    * canonical form, host and registered domain of four noise
    * variants, hashed cross-engine on every row. Pure projection —
    * no shuffle; at crawl scale this is the map stage every URL-keyed
    * operator shares.
    */
  val urlCanon: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        messyUrl(col("doc_id"), pmod(col("doc_id"), lit(4))).as("url"))
      .select(col("doc_id"), col("url"),
        graft.functions.UrlOps.urlCanon(col("url")).as("canon_url"),
        graft.functions.UrlOps.urlHost(col("url")).as("host"),
        graft.functions.UrlOps.urlDomain(col("url")).as("domain"))
  val urlCanonSql: String =
    s"""WITH ${messyUrlSqlCte("doc_id", "doc_id % 4")}
       |SELECT doc_id, url,
       |       ${graft.functions.UrlOps.canonSql("url")} AS canon_url,
       |       ${graft.functions.UrlOps.hostSql("url")} AS host,
       |       ${graft.functions.UrlOps.domainSql("url")} AS domain
       |FROM u""".stripMargin

  // ----------------------------------------------------------- q_cdx_index
  /** CDXJ crawl-index parsing — the OTHER artifact every Common-Crawl
    * user touches: before fetching a single WARC byte, jobs select
    * records from the cdx-*.gz indexes (`SURT-urlkey timestamp
    * {json}` lines). The query builds deterministic CDXJ lines (the
    * urlkey via the new [[graft.functions.UrlOps.surtKey]], mirrored
    * in the oracle by `surtSql` — the paired-SQL-generator discipline
    * of the URL family) and parses them back with BUILT-INS only:
    * first two space-delimited tokens, then `from_json` from the
    * first `{` (the JSON blob itself contains spaces, so a naive
    * split would shear it). Pure projection, no shuffle.
    */
  private def cdxUrl(docId: Column): Column =
    concat(lit("https://sub"), pmod(docId, lit(3)).cast("string"),
      lit(".crawl"), pmod(docId, lit(7)).cast("string"),
      lit(".example.org/Path/"), docId.cast("string"),
      when(pmod(docId, lit(4)) === 0, lit("?a=1&b=2")).otherwise(lit("")))
  private val cdxUrlSql: String =
    """'https://sub' || (doc_id % 3) || '.crawl' || (doc_id % 7) ||
      |      '.example.org/Path/' || doc_id ||
      |      CASE WHEN doc_id % 4 = 0 THEN '?a=1&b=2' ELSE '' END""".stripMargin
  private def cdxLine(docId: Column): Column = {
    val url = cdxUrl(docId)
    concat(graft.functions.UrlOps.surtKey(url), lit(" "),
      lit("2026010"), (pmod(docId, lit(9)) + 1).cast("string"), lit("000000 "),
      lit("{\"url\": \""), url,
      lit("\", \"mime\": \"text/html\", \"status\": \"200\", \"length\": \""),
      (lit(100) + pmod(docId, lit(900))).cast("string"),
      lit("\", \"offset\": \""), pmod(docId * 1024, lit(100000)).cast("string"),
      lit("\", \"filename\": \"segment-"), pmod(docId, lit(20)).cast("string"),
      lit(".warc.gz\"}"))
  }
  private def cdxParsed(s: SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), cdxLine(col("doc_id")).as("line"))
      .select(col("doc_id"),
        substring_index(col("line"), " ", 1).as("urlkey"),
        element_at(split(col("line"), " "), 3 - 1).as("ts"),
        from_json(col("line").substr(locate("{", col("line")), length(col("line"))),
          lit("struct<url:string, mime:string, status:string, length:string, offset:string, filename:string>")).as("j"))
      .select(col("doc_id"), col("urlkey"), col("ts"),
        col("j.url").as("url"), col("j.mime").as("mime"),
        col("j.status").cast("int").as("status"),
        col("j.length").cast("long").as("n_bytes"),
        col("j.offset").cast("long").as("offset"),
        col("j.filename").as("filename"))
  private val cdxParsedSql: String =
    s"""SELECT doc_id,
       |       ${graft.functions.UrlOps.surtSql(s"($cdxUrlSql)")} AS urlkey,
       |       '2026010' || (doc_id % 9 + 1) || '000000' AS ts,
       |       ($cdxUrlSql) AS url,
       |       'text/html' AS mime, 200 AS status,
       |       CAST(100 + doc_id % 900 AS BIGINT) AS n_bytes,
       |       CAST(doc_id * 1024 % 100000 AS BIGINT) AS offset,
       |       'segment-' || (doc_id % 20) || '.warc.gz' AS filename
       |FROM documents""".stripMargin
  val cdxIndex: Q = (s, d) => cdxParsed(s, d)
  val cdxIndexSql: String = cdxParsedSql

  // ------------------------------------------------------- q_cdx_fetch_plan
  /** The point of a CDX index: the FETCH PLAN — group selected records
    * by segment file, so a WARC-range job knows how many records and
    * bytes each segment contributes and where its earliest byte sits.
    * One exchange keyed on filename (20 segments here; thousands at
    * crawl scale — still the cheap side of fetching the WARCs).
    */
  val cdxFetchPlan: Q = (s, d) =>
    cdxParsed(s, d)
      .where(col("status") === 200 && col("mime") === "text/html")
      .groupBy("filename")
      .agg(count(lit(1)).as("n_records"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("offset")).as("first_offset"))
  val cdxFetchPlanSql: String =
    s"""WITH recs AS ($cdxParsedSql)
       |SELECT filename, CAST(count(*) AS BIGINT) AS n_records,
       |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |       CAST(min("offset") AS BIGINT) AS first_offset
       |FROM recs WHERE status = 200 AND mime = 'text/html'
       |GROUP BY 1""".stripMargin

  /** Canonical-URL dedup — the first stage of every crawl pipeline:
    * recrawls and share-link variants of one target collapse onto the
    * canonical form, oldest doc wins. Three noise variants of each
    * target collapse to n_dups = 3 groups here. Shape at scale: one
    * map-side canonicalization + ONE exchange keyed on canon_url —
    * the same partitioning every later URL-keyed stage (domain cap,
    * blocklist join) reuses.
    */
  val urlDedup: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.UrlOps.urlCanon(
          messyUrl(expr("doc_id div 3"), pmod(col("doc_id"), lit(3)))).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("canonical_doc"))
  val urlDedupSql: String =
    s"""WITH ${messyUrlSqlCte("doc_id // 3", "doc_id % 3")}
       |SELECT ${graft.functions.UrlOps.canonSql("url")} AS canon_url,
       |       count(*) AS n_dups, min(doc_id) AS canonical_doc
       |FROM u GROUP BY 1""".stripMargin

  /** Domain blocklist filtering — the UT1-blocklist-style gate every
    * crawl pipeline applies before anything content-based runs: extract
    * the registered domain, anti-join a (small, broadcast) deny list.
    * The list here is a closed-form external relation so the oracle
    * rebuilds it; production swaps in the real list file with no plan
    * change. Shape at scale: map-side domain extraction + one broadcast
    * anti-join — no shuffle of the corpus.
    */
  val urlBlocklist: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.UrlOps.urlDomain(
          messyUrl(col("doc_id"), pmod(col("doc_id"), lit(4)))).as("domain"))
    val suffixes = Seq(".com", ".co.uk", ".or.jp", ".github.io")
    val bl = suffixes.map(suf =>
        s.range(0, 200).filter(col("id") % 10 === 3)
          .select(concat(lit("site"), col("id").cast("string"), lit(suf)).as("domain")))
      .reduce(_ union _)
    docs.join(broadcast(bl), Seq("domain"), "left_anti")
      .select(col("doc_id"), col("domain"))
  }
  val urlBlocklistSql: String =
    s"""WITH ${messyUrlSqlCte("doc_id", "doc_id % 4")},
       |dom AS (SELECT doc_id, ${graft.functions.UrlOps.domainSql("url")} AS domain FROM u),
       |bl AS (SELECT 'site' || r || suf AS domain
       |       FROM range(0, 200) t(r)
       |       CROSS JOIN (SELECT unnest(['.com', '.co.uk', '.or.jp', '.github.io']) AS suf)
       |       WHERE r % 10 = 3)
       |SELECT doc_id, domain FROM dom
       |WHERE domain IS NULL OR domain NOT IN (SELECT domain FROM bl)""".stripMargin

  /** Row-level gate of the PSL registered-domain algorithm on the
    * paths the heuristic got wrong: multi-part ICANN suffixes
    * (`or.jp`), private suffixes (`github.io`), wildcard rules
    * (`*.kawasaki.jp`, `*.ck`) with their exceptions
    * (`!city.kawasaki.jp`, `!www.ck`), bare ccTLD hosts, IP hosts.
    * Hosts are a closed-form battery in doc_id so the oracle rebuilds
    * the identical input and replays the identical rules.
    */
  private val PslHostBattery = Seq(
    "www.news.bbc.co.uk", // multi-part ICANN suffix (www. strips in canon)
    "foo.or.jp", // the or.jp case the heuristic mis-bucketed
    "city.kawasaki.jp", // exception rule: registrable itself
    "x.sub.kawasaki.jp", // wildcard rule: ps = sub.kawasaki.jp
    "alice.github.io", // private suffix
    "deep.alice.github.io", // private suffix, deeper host
    "shop.www.ck", // exception under a wildcard ccTLD: ps = ck
    "shop.foo.ck", // wildcard ccTLD: ps = foo.ck
    "example.com", // default rule
    "uk", // bare ccTLD host
    "192.168.0.1", // IP carve-out
    "b.example.co") // com.co listed, example.co is not a suffix

  /** IDN (punycode) rows appended to the PSL battery: (unicode host,
    * expected ACE host, expected registered domain). The ACE forms and
    * domains are HAND-VERIFIED constants (JDK `IDN.toASCII` + the PSL
    * algorithm on the ACE form) — DuckDB cannot compute punycode, so
    * the oracle pins these rows instead of replaying the mapping (the
    * robotsPolicy pinned-battery pattern; the ASCII battery above
    * keeps the full in-SQL rule replay). UrlOpsSpec asserts the same
    * constants against [[graft.functions.UrlOps.idnAscii]] directly.
    */
  private val IdnHostBattery: Seq[(String, String, String)] = Seq(
    ("münchen.de", "xn--mnchen-3ya.de", "xn--mnchen-3ya.de"), // default rule TLD
    ("日本語.jp", "xn--wgv71a119e.jp", "xn--wgv71a119e.jp"), // CJK label
    ("テスト.co.uk", "xn--zckzah.co.uk", "xn--zckzah.co.uk"), // PSL match POST-IDN
    ("sub.テスト.co.uk", "sub.xn--zckzah.co.uk", "xn--zckzah.co.uk"), // deeper host
    ("bücher.example.com", "xn--bcher-kva.example.com", "example.com"), // ASCII suffix
    ("xn--mnchen-3ya.de", "xn--mnchen-3ya.de", "xn--mnchen-3ya.de")) // already-ACE: identity

  val urlPsl: Q = (s, d) => {
    val hosts = PslHostBattery ++ IdnHostBattery.map(_._1)
    val idx = (pmod(col("doc_id"), lit(hosts.size)) + 1).cast("int")
    val url = concat(lit("https://"),
      element_at(array(hosts.map(lit): _*), idx), lit("/p"))
    Tables.documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        graft.functions.UrlOps.urlHost(col("url")).as("host"),
        graft.functions.UrlOps.urlDomain(col("url")).as("domain"))
  }
  val urlPslSql: String = {
    val hosts = PslHostBattery ++ IdnHostBattery.map(_._1)
    val list = hosts.map("'" + _ + "'").mkString("[", ", ", "]")
    val nAscii = PslHostBattery.size
    val pinHost = IdnHostBattery.map("'" + _._2 + "'").mkString("[", ", ", "]")
    val pinDom = IdnHostBattery.map("'" + _._3 + "'").mkString("[", ", ", "]")
    s"""WITH u AS (SELECT doc_id,
       |  CAST(doc_id % ${hosts.size} AS INTEGER) + 1 AS idx,
       |  'https://' || ($list)[CAST(doc_id % ${hosts.size} AS INTEGER) + 1] || '/p' AS url
       |  FROM documents)
       |SELECT doc_id,
       |       CASE WHEN idx <= $nAscii THEN ${graft.functions.UrlOps.hostSql("url")}
       |            ELSE ($pinHost)[idx - $nAscii] END AS host,
       |       CASE WHEN idx <= $nAscii THEN ${graft.functions.UrlOps.domainSql("url")}
       |            ELSE ($pinDom)[idx - $nAscii] END AS domain
       |FROM u""".stripMargin
  }

  /** The batch twin of [[graft.streaming.EventPipeline.streamingFrontier]]
    * under the hash gate: canonical dedup (min doc per canon target) →
    * registered-domain blocklist anti-join → rank-aware per-domain
    * admission (effective cap = base 2 + rank_ppm/1000, lowest doc ids
    * win — hindsight's deterministic analog of the streaming first-k).
    * Every relation is closed-form so the oracle rebuilds the identical
    * chain; the rank table stands in for the persisted PageRank
    * artifact (same shape, closed-form values). Shape at scale: one
    * canon-keyed exchange + two broadcast joins + one window over the
    * domain partitioning the earlier exchange already established.
    */
  val frontierAdmission: Q = (s, d) => {
    val url = messyUrl(expr("doc_id div 3"), pmod(col("doc_id"), lit(3)))
    val canon = Tables.documents(s, d).select(
      col("doc_id"),
      graft.functions.UrlOps.urlCanon(url).as("canon_url"),
      graft.functions.UrlOps.urlDomain(url).as("domain"))
    val dedup = canon.groupBy("canon_url")
      .agg(min("doc_id").as("doc_id"), min("domain").as("domain"))
    val bl = Seq(".com", ".co.uk", ".or.jp", ".github.io").map(suf =>
        s.range(0, 200).filter(col("id") % 10 === 3)
          .select(concat(lit("site"), col("id").cast("string"), lit(suf)).as("domain")))
      .reduce(_ union _)
    val ranks = s.range(0, 200).filter(col("id") % 7 === 0)
      .select(concat(lit("site"), col("id").cast("string"), lit(".com")).as("domain"),
        (col("id") * 100).as("rank_ppm"))
    val ranked = dedup.join(broadcast(bl), Seq("domain"), "left_anti")
      .join(broadcast(ranks), Seq("domain"), "left_outer")
      .na.fill(0L, Seq("rank_ppm"))
      .withColumn("eff_cap", lit(2L) + expr("rank_ppm div 1000"))
    ranked
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("domain").orderBy("doc_id")))
      .filter(col("rn") <= col("eff_cap"))
      .select(col("doc_id"), col("domain"), col("eff_cap"))
  }
  val frontierAdmissionSql: String =
    s"""WITH ${messyUrlSqlCte("doc_id // 3", "doc_id % 3")},
       |c AS (SELECT doc_id,
       |             ${graft.functions.UrlOps.canonSql("url")} AS canon_url,
       |             ${graft.functions.UrlOps.domainSql("url")} AS domain
       |      FROM u),
       |dd AS (SELECT min(doc_id) AS doc_id, min(domain) AS domain
       |       FROM c GROUP BY canon_url),
       |bl AS (SELECT 'site' || r || suf AS domain
       |       FROM range(0, 200) t(r)
       |       CROSS JOIN (SELECT unnest(['.com', '.co.uk', '.or.jp', '.github.io']) AS suf)
       |       WHERE r % 10 = 3),
       |rk AS (SELECT 'site' || r || '.com' AS domain, r * 100 AS rank_ppm
       |       FROM range(0, 200) t(r) WHERE r % 7 = 0),
       |adm AS (SELECT dd.doc_id, dd.domain,
       |               2 + coalesce(rk.rank_ppm, 0) // 1000 AS eff_cap,
       |               row_number() OVER (PARTITION BY dd.domain ORDER BY dd.doc_id) AS rn
       |        FROM dd LEFT JOIN rk USING (domain)
       |        WHERE dd.domain IS NULL OR dd.domain NOT IN (SELECT domain FROM bl))
       |SELECT doc_id, domain, CAST(eff_cap AS BIGINT) AS eff_cap
       |FROM adm WHERE rn <= eff_cap""".stripMargin

  /** robots.txt policy under the hash gate: a fixed policy document
    * evaluated for a battery of (agent, path) cases covering every
    * RFC 9309 decision family — default-group rules, longest-match
    * precedence, wildcard + `$`-anchored patterns, agent-specific
    * group replacement, multi-agent blocks, longest-token selection,
    * case-insensitive matching. The oracle pins the hand-computed RFC
    * truth per battery index, so engine and spec cannot drift apart
    * silently. Pure projection — the policy document broadcasts as a
    * literal; at scale it arrives via a per-domain join upstream.
    */
  private val RobotsFixture =
    "Sitemap: https://example.org/sitemap.xml\n" +
      "User-agent: *\nDisallow: /private/\nAllow: /private/ok\nDisallow: /*.pdf$\n" +
      "Disallow: /caf%C3%A9/\nDisallow: /%7Edocs/\n" +
      "Crawl-delay: 0.5\n\n" +
      "User-agent: graftbot\nUser-agent: otherbot\nDisallow: /only-graft/\nAllow: /\n" +
      "Crawl-delay: 2\n\n" +
      "User-agent: graftbot-images\nDisallow: /\n" +
      "Sitemap: https://example.org/sitemap-news.xml\n"
  // (agent, path, allowed, crawlDelayMs — -1 encodes "none declared")
  private val RobotsBattery = Seq(
    ("randombot", "/private/x", false, 500L), // default group Disallow
    ("randombot", "/private/ok-file", true, 500L), // longer Allow beats it
    ("randombot", "/doc/file.pdf", false, 500L), // wildcard + $ anchor
    ("randombot", "/doc/file.pdf?x=1", true, 500L), // anchor fails past the extension
    ("graftbot", "/private/x", true, 2000L), // own group replaces default
    ("graftbot", "/only-graft/x", false, 2000L),
    ("otherbot", "/only-graft/x", false, 2000L), // multi-agent block shares rules
    ("graftbot-images", "/anything", false, -1L), // longest token; NO delay fallback
    ("GraftBot/2.1", "/only-graft/x", false, 2000L), // case-insensitive token
    ("randombot", "/elsewhere", true, 500L), // no matching rule → allowed
    ("randombot", "/caf%c3%a9/menu", false, 500L), // octet-normalized hex case
    ("randombot", "/~docs/x", false, 500L), // rule's %7E decodes (unreserved)
    ("randombot", "/%7Edocs/y", false, 500L), // path's escape decodes too
    ("randombot", "/cafe/x", true, 500L)) // near-miss stays allowed
  val robotsPolicy: Q = (s, d) => {
    val idx = (pmod(col("doc_id"), lit(RobotsBattery.size)) + 1).cast("int")
    Tables.documents(s, d).select(
      col("doc_id"),
      element_at(array(RobotsBattery.map(b => lit(b._1)): _*), idx).as("agent"),
      element_at(array(RobotsBattery.map(b => lit(b._2)): _*), idx).as("path"))
      .withColumn("allowed",
        graft.functions.RobotsOps.robotsAllowed(lit(RobotsFixture), col("agent"), col("path")))
      .withColumn("crawl_delay_ms",
        graft.functions.RobotsOps.robotsCrawlDelay(lit(RobotsFixture), col("agent")))
      .withColumn("n_sitemaps",
        size(graft.functions.RobotsOps.robotsSitemaps(lit(RobotsFixture))).cast("long"))
  }
  val robotsPolicySql: String = {
    def list(f: ((String, String, Boolean, Long)) => String) =
      RobotsBattery.map(f).mkString("[", ", ", "]")
    val agents = list(b => "'" + b._1 + "'")
    val paths = list(b => "'" + b._2 + "'")
    val expected = list(b => b._3.toString)
    val delays = list(b => if (b._4 < 0) "NULL" else b._4.toString)
    s"""SELECT doc_id,
       |       ($agents)[CAST(doc_id % ${RobotsBattery.size} AS INTEGER) + 1] AS agent,
       |       ($paths)[CAST(doc_id % ${RobotsBattery.size} AS INTEGER) + 1] AS path,
       |       ($expected)[CAST(doc_id % ${RobotsBattery.size} AS INTEGER) + 1] AS allowed,
       |       CAST(($delays)[CAST(doc_id % ${RobotsBattery.size} AS INTEGER) + 1] AS BIGINT)
       |         AS crawl_delay_ms,
       |       CAST(2 AS BIGINT) AS n_sitemaps
       |FROM documents""".stripMargin
  }

  /** HTML extraction under the hash gate: closed-form synthetic pages
    * (title, script junk to skip, entity-bearing block text, one
    * relative + one absolute link) flow through the full content
    * chain — `html_extract` → `url_resolve` against the page URL →
    * `url_canon` — and every output is a closed-form string function
    * of doc_id the oracle rebuilds. One parse per row (struct
    * expression), pure projection.
    */
  val htmlExtract: Q = (s, d) => {
    val id = col("doc_id").cast("string")
    val html = concat(
      lit("<html><head><title>Doc "), id,
      lit("</title><script>var x = "), id, lit(" < 9;</script></head><body>"),
      lit("<h1>Head "), id, lit("</h1><p>Para &amp; text "), id, lit("</p>"),
      lit("<a href=\"/p/"), id, lit("\">x</a>"),
      lit("<a href='https://ext"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".com/q?utm_source=z'>y</a></body></html>"))
    val base = concat(lit("https://site"), pmod(col("doc_id"), lit(5)).cast("string"),
      lit(".com/dir/page.html"))
    Tables.documents(s, d)
      .select(col("doc_id"), html.as("html"), base.as("base"))
      .withColumn("e", graft.functions.HtmlOps.htmlExtract(col("html")))
      .select(col("doc_id"),
        col("e.title").as("title"),
        col("e.text").as("text"),
        size(col("e.links")).cast("long").as("n_links"),
        graft.functions.UrlOps.urlResolve(col("base"), element_at(col("e.links"), 1))
          .as("resolved0"),
        graft.functions.UrlOps.urlCanon(element_at(col("e.links"), 2)).as("canon1"))
  }
  val htmlExtractSql: String =
    """SELECT doc_id,
      |       'Doc ' || doc_id AS title,
      |       'Head ' || doc_id || chr(10) || 'Para & text ' || doc_id || chr(10) || 'xy' AS text,
      |       CAST(2 AS BIGINT) AS n_links,
      |       'https://site' || (doc_id % 5) || '.com/p/' || doc_id AS resolved0,
      |       'https://ext' || (doc_id % 7) || '.com/q' AS canon1
      |FROM documents""".stripMargin

  /** Indexability metadata battery: robots meta directives (`noindex`,
    * `nofollow`, `none` = both) across attribute order, quote style and
    * case; the first `rel=canonical` link (quoted and BARE attribute
    * values); a commented-out directive that must NOT leak; and a
    * non-robots meta that must not match.
    */
  val htmlMetaQ: Q = (s, d) => {
    val idx = pmod(col("doc_id"), lit(6))
    val id50 = (col("doc_id") % 50).cast("string")
    val id7 = (col("doc_id") % 7).cast("string")
    val html = when(idx === 0, concat(
        lit("<html><head><meta name=\"robots\" content=\"noindex, nofollow\">" +
          "<link rel=\"canonical\" href=\"https://ex.com/p/"), id50,
        lit("\"></head><body>x</body></html>")))
      .when(idx === 1, lit("<meta name='robots' content='NOINDEX'><p>b</p>"))
      .when(idx === 2, lit("<META NAME=\"ROBOTS\" CONTENT=\"none\">"))
      .when(idx === 3, concat(lit("<link rel=canonical href=/canon/"), id7, lit("><p>c</p>")))
      .when(idx === 4, lit("<!-- <meta name=\"robots\" content=\"noindex\"> --><p>ok</p>"))
      .otherwise(lit("<meta name=\"description\" content=\"noindex nothing\">"))
    Tables.documents(s, d).select("doc_id")
      .withColumn("m", graft.functions.HtmlOps.htmlMetaCol(html))
      .select(col("doc_id"), col("m.noindex").as("noindex"),
        col("m.nofollow").as("nofollow"), col("m.canonical").as("canonical"))
  }
  val htmlMetaSql: String =
    """SELECT doc_id,
      |       (doc_id % 6) IN (0, 1, 2) AS noindex,
      |       (doc_id % 6) IN (0, 2) AS nofollow,
      |       CASE doc_id % 6
      |         WHEN 0 THEN 'https://ex.com/p/' || (doc_id % 50)
      |         WHEN 3 THEN '/canon/' || (doc_id % 7)
      |         ELSE NULL END AS canonical
      |FROM documents""".stripMargin

  /** Canonical-aware page dedup — the crawl stage `rel=canonical`
    * exists FOR: three fetch variants of one logical page (tracking
    * query param, a different path entirely, a relative `../` hop)
    * each declare the same canonical target; `html_meta` →
    * `url_resolve` against the fetch URL → one exchange on the
    * canonical key clusters them. The oracle rebuilds the resolved key
    * closed-form, so a slip in meta extraction OR RFC 3986 resolution
    * (dot segments!) flips the hash.
    */
  val canonicalDedup: Q = (s, d) => {
    val k = expr("doc_id DIV 3")
    val h = pmod(k, lit(50)).cast("string")
    val ks = k.cast("string")
    val v = pmod(col("doc_id"), lit(3))
    val page = when(v === 0, concat(lit("https://s"), h, lit(".example.com/item/"), ks, lit("?ref=0")))
      .when(v === 1, concat(lit("https://s"), h, lit(".example.com/other")))
      .otherwise(concat(lit("https://s"), h, lit(".example.com/sub/page")))
    val canon = when(v === 0, concat(lit("/item/"), ks))
      .when(v === 1, concat(lit("https://s"), h, lit(".example.com/item/"), ks))
      .otherwise(concat(lit("../item/"), ks))
    val html = concat(lit("<html><head><link rel=\"canonical\" href=\""), canon,
      lit("\"></head><body>p</body></html>"))
    Tables.documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), page.as("page"), html.as("html"))
      .withColumn("m", graft.functions.HtmlOps.htmlMetaCol(col("html")))
      .withColumn("key", graft.functions.UrlOps.urlResolve(col("page"), col("m.canonical")))
      .groupBy("key")
      .agg(count(lit(1)).as("n_pages"), min("doc_id").as("keeper"))
  }
  val canonicalDedupSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         'https://s' || ((doc_id // 3) % 50) || '.example.com/item/' || (doc_id // 3) AS key
      |  FROM documents)
      |SELECT key, CAST(count(*) AS BIGINT) AS n_pages,
      |       CAST(min(doc_id) AS BIGINT) AS keeper
      |FROM t GROUP BY key""".stripMargin

  /** Table extraction at cell grain (the WebTables modality): a page
    * with a 2×2 headed table (entity in a header, whitespace slop in a
    * body cell) and a second one-cell table; every cell lands addressed
    * (table, row, col) with its header flag, and surrounding prose does
    * NOT leak into cells.
    */
  val htmlTablesQ: Q = (s, d) => {
    val id = col("doc_id").cast("string")
    val html = concat(
      lit("<h1>Prose "), id,
      lit("</h1><table><tr><th>name</th><th>qty &amp; price</th></tr><tr><td>item "),
      pmod(col("doc_id"), lit(7)).cast("string"),
      lit("</td><td>  "), pmod(col("doc_id"), lit(13)).cast("string"),
      lit(" </td></tr></table><p>between</p><table><tr><td>x"),
      pmod(col("doc_id"), lit(3)).cast("string"),
      lit("</td></tr></table>"))
    Tables.documents(s, d).select("doc_id")
      .select(col("doc_id"),
        explode(graft.functions.HtmlOps.htmlTablesCol(html)).as("c"))
      .select(col("doc_id"), col("c.table").as("tbl"), col("c.row").as("row"),
        col("c.col").as("col"), col("c.header").as("header"), col("c.text").as("text"))
  }
  val htmlTablesSql: String =
    """SELECT d.doc_id,
      |       CAST(CASE WHEN g.g <= 3 THEN 0 ELSE 1 END AS INTEGER) AS tbl,
      |       CAST(CASE WHEN g.g <= 1 OR g.g = 4 THEN 0 ELSE 1 END AS INTEGER) AS row,
      |       CAST(CASE WHEN g.g IN (0, 2, 4) THEN 0 ELSE 1 END AS INTEGER) AS col,
      |       g.g <= 1 AS header,
      |       CASE g.g WHEN 0 THEN 'name' WHEN 1 THEN 'qty & price'
      |                WHEN 2 THEN 'item ' || (d.doc_id % 7)
      |                WHEN 3 THEN CAST(d.doc_id % 13 AS VARCHAR)
      |                ELSE 'x' || (d.doc_id % 3) END AS text
      |FROM documents d, generate_series(0, 4) g(g)""".stripMargin

  /** The crawl-to-rank feed: raw HTML → outlinks → absolute canonical
    * URLs → registered-domain edge list `(src_domain, dst_domain,
    * n_links)` — exactly what the PageRank operator consumes as its
    * graph. Map-side extract/resolve/canon/domain, ONE exchange on the
    * edge key. Same closed-form pages as q_html_extract, so the oracle
    * regenerates the edges and aggregates them itself.
    */
  val linkGraph: Q = (s, d) => {
    val id = col("doc_id").cast("string")
    val html = concat(
      lit("<html><head><title>Doc "), id,
      lit("</title><script>var x = "), id, lit(" < 9;</script></head><body>"),
      lit("<h1>Head "), id, lit("</h1><p>Para &amp; text "), id, lit("</p>"),
      lit("<a href=\"/p/"), id, lit("\">x</a>"),
      lit("<a href='https://ext"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".com/q?utm_source=z'>y</a></body></html>"))
    val base = concat(lit("https://site"), pmod(col("doc_id"), lit(5)).cast("string"),
      lit(".com/dir/page.html"))
    Tables.documents(s, d)
      .select(col("doc_id"), html.as("html"), base.as("base"))
      .withColumn("e", graft.functions.HtmlOps.htmlExtract(col("html")))
      .select(col("base"),
        explode(col("e.links")).as("href"),
        graft.functions.UrlOps.urlDomain(col("base")).as("src_domain"))
      .withColumn("dst_domain", graft.functions.UrlOps.urlDomain(
        graft.functions.UrlOps.urlResolve(col("base"), col("href"))))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))
  }
  val linkGraphSql: String =
    """WITH l AS (
      |  SELECT 'site' || (doc_id % 5) || '.com' AS src_domain,
      |         'site' || (doc_id % 5) || '.com' AS dst_domain
      |  FROM documents
      |  UNION ALL
      |  SELECT 'site' || (doc_id % 5) || '.com',
      |         'ext' || (doc_id % 7) || '.com'
      |  FROM documents)
      |SELECT src_domain, dst_domain, CAST(count(*) AS BIGINT) AS n_links
      |FROM l GROUP BY 1, 2""".stripMargin

  /** Sitemap discovery under the hash gate: even docs carry a 3-entry
    * urlset (one entry lastmod-less), odd docs a 2-entry sitemapindex —
    * closed-form XML whose parse (kind flag, loc list, lastmods) the
    * oracle rebuilds per row. Pure projection; at scale these payloads
    * arrive from the fetch stage and fan out via explode into the
    * frontier.
    */
  val sitemapParse: Q = (s, d) => {
    val id = col("doc_id").cast("string")
    val urlset = concat(
      lit("<?xml version=\"1.0\"?><urlset><url><loc>https://s"), id,
      lit(".com/a</loc><lastmod>2026-01-0"), (pmod(col("doc_id"), lit(9)) + 1).cast("string"),
      lit("</lastmod></url><url><loc>https://s"), id,
      lit(".com/b</loc></url><url><loc>https://s"), id,
      lit(".com/c</loc></url></urlset>"))
    val index = concat(
      lit("<sitemapindex><sitemap><loc>https://s"), id,
      lit(".com/s1.xml</loc></sitemap><sitemap><loc>https://s"), id,
      lit(".com/s2.xml</loc></sitemap></sitemapindex>"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, urlset).otherwise(index).as("xml"))
      .withColumn("p", graft.functions.SitemapOps.sitemapParse(col("xml")))
      .select(col("doc_id"),
        col("p.is_index").as("is_index"),
        size(col("p.locs")).cast("long").as("n_locs"),
        element_at(col("p.locs"), 1).as("loc0"),
        element_at(col("p.lastmods"), 1).as("lastmod0"),
        element_at(col("p.lastmods"), 2).as("lastmod1"))
  }
  val sitemapParseSql: String =
    """SELECT doc_id,
      |       doc_id % 2 = 1 AS is_index,
      |       CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END AS BIGINT) AS n_locs,
      |       CASE WHEN doc_id % 2 = 0 THEN 'https://s' || doc_id || '.com/a'
      |            ELSE 'https://s' || doc_id || '.com/s1.xml' END AS loc0,
      |       CASE WHEN doc_id % 2 = 0 THEN '2026-01-0' || (doc_id % 9 + 1) END AS lastmod0,
      |       CAST(NULL AS VARCHAR) AS lastmod1
      |FROM documents""".stripMargin

  /** Charset resolution under the hash gate: hex-literal payloads
    * covering each rung of the [[graft.functions.HtmlOps.decodeBytes]]
    * ladder (UTF-8/UTF-16 BOMs, meta charset over Latin-1 bytes, bare
    * valid UTF-8, invalid UTF-8 → Latin-1 fallback) decode per row and
    * the oracle pins the expected strings per battery index — the
    * WARC-payload → text glue proven byte-exact cross-engine.
    */
  private val CharsetBattery: Seq[(String, String)] = Seq(
    ("efbbbfc3a9", "é"), // UTF-8 BOM
    ("3c6d65746120636861727365743d69736f2d383835392d313e636166e9",
      "<meta charset=iso-8859-1>café"), // meta-driven Latin-1
    ("e4b8ade69687", "中文"), // bare valid UTF-8
    ("3c703ee9ff", "<p>éÿ"), // invalid UTF-8 → Latin-1 fallback
    ("feff00680069", "hi"), // UTF-16BE BOM
    ("fffe68006900", "hi")) // UTF-16LE BOM
  val htmlCharset: Q = (s, d) => {
    val idx = (pmod(col("doc_id"), lit(CharsetBattery.size)) + 1).cast("int")
    Tables.documents(s, d).select(
      col("doc_id"),
      graft.functions.HtmlOps.htmlDecode(
        unhex(element_at(array(CharsetBattery.map(b => lit(b._1)): _*), idx)))
        .as("decoded"))
  }
  val htmlCharsetSql: String = {
    val expected = CharsetBattery.map(b => "'" + b._2 + "'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |       ($expected)[CAST(doc_id % ${CharsetBattery.size} AS INTEGER) + 1] AS decoded
       |FROM documents""".stripMargin
  }

  /** Mojibake repair under the hash gate: damaged/clean text pairs
    * covering single damage, cp1252 punctuation damage, double damage,
    * and the must-not-touch cases (genuine accents, CJK, ASCII) —
    * expected outputs pinned per battery index, so the repair's
    * precision AND its identity on clean text both gate cross-engine.
    */
  private val MojibakeBattery: Seq[(String, String)] = Seq(
    ("cafÃ©", "café"),
    ("â€™tis â€” so", "’tis — so"),
    ("naÃ¯ve rÃ©sumÃ©", "naïve résumé"),
    ("cafÃƒÂ©", "café"), // double-encoded: two repair passes
    ("café", "café"), // genuine accent: untouched
    ("中文テキスト", "中文テキスト"), // CJK: untouched
    ("plain ascii", "plain ascii"),
    ("€100 fine", "€100 fine")) // genuine cp1252-encodable char: untouched
  val mojibake: Q = (s, d) => {
    val idx = (pmod(col("doc_id"), lit(MojibakeBattery.size)) + 1).cast("int")
    Tables.documents(s, d).select(
      col("doc_id"),
      graft.functions.Mojibake.fixMojibake(
        element_at(array(MojibakeBattery.map(b => lit(b._1)): _*), idx)).as("fixed"))
  }
  val mojibakeSql: String = {
    val expected = MojibakeBattery.map(b => "'" + b._2 + "'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |       ($expected)[CAST(doc_id % ${MojibakeBattery.size} AS INTEGER) + 1] AS fixed
       |FROM documents""".stripMargin
  }

  /** The crawl-family capstone: the WHOLE round-10 content layer
    * composed as one gated batch flow, so the COMPOSITION — not just
    * each stage — sits under the cross-engine hash (the
    * q_scan_pipeline / q_sign_pipeline treatment for crawling).
    *
    *   WARC segment (binary bodies, every 5th record a non-content
    *   `request`) → `warc_records` + type filter → `html_decode`
    *   (UTF-8-BOM vs meta-charset Latin-1, alternating) →
    *   `fix_mojibake` (the page text carries real cp1252 damage) →
    *   `html_extract` (title/text/links, one parse) → `url_resolve` +
    *   `url_canon` (tracking params stripped) → PSL `url_domain` →
    *   RFC 9309 robots gate on `url_path` → frontier admission
    *   (canonical dedup, min-doc wins → per-domain cap 3, lowest doc
    *   ids win) → the admitted frontier with its provenance.
    *
    * Every stage is closed-form in doc_id, so the oracle rebuilds the
    * admitted rows exactly: one wrong byte in ANY stage — a charset
    * rung misfire, an unrepaired Ã©, a link the tokenizer drops, a
    * canon slip, a robots decision, an admission ordering — changes
    * rows or values and trips the hash.
    *
    * Scale shape: framing/decode/repair/extract/resolve are map-side
    * projections; ONE exchange keys the canonical dedup; the
    * per-domain window rides the admission cap (WindowGroupLimit, no
    * global window). The robots policy is a literal here; at scale it
    * arrives via the same per-domain broadcast the streaming frontier
    * uses.
    */
  private val CrawlRobotsFixture = "User-agent: *\nDisallow: /x\n"
  val crawlPipeline: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val id = col("doc_id").cast("string")
    val html = concat(
      lit("<html><head>"),
      when(pmod(col("doc_id"), lit(2)) === 1, lit("<meta charset=iso-8859-1>"))
        .otherwise(lit("")),
      lit("<title>Doc "), id, lit("</title></head><body>"),
      lit("<p>cafÃ© "), id, lit("</p>"),
      lit("<a href=\"/p/"), id, lit("\">a</a>"),
      lit("<a href='https://ext"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".com/q?utm_source=z'>b</a>"),
      lit("<a href=\"https://wide"), pmod(col("doc_id"), lit(97)).cast("string"),
      lit(".com/w/"), id, lit("\">c</a>"),
      lit("<a href=\"https://ext"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".com/x\">d</a>"),
      lit("</body></html>"))
    val payload = when(pmod(col("doc_id"), lit(2)) === 0,
        concat(unhex(lit("EFBBBF")), encode(html, "UTF-8")))
      .otherwise(encode(html, "ISO-8859-1"))
    val pages = Tables.documents(s, d)
      .select(col("source"), struct(
        when(col("doc_id") % 5 === 0, lit("request")).otherwise(lit("response")).as("rec_type"),
        concat(lit("https://site"), pmod(col("doc_id"), lit(5)).cast("string"),
          lit(".com/dir/"), id, lit("/page.html")).as("url"),
        lit("2026-01-01T00:00:00Z").as("date"),
        payload.as("body")).as("rec"))
      .groupBy("source").agg(collect_list(col("rec")).as("recs"))
      .select(explode(graft.functions.WarcOps.warcRecords(
        graft.functions.WarcOps.synthWarcGzBin(col("recs")))).as("r"))
      .filter(col("r.rec_type") === "response")
      .select(col("r.url").as("base"),
        graft.functions.Mojibake.fixMojibake(
          graft.functions.HtmlOps.htmlDecode(col("r.body"))).as("html"))
      .withColumn("doc_id", regexp_extract(col("base"), "/dir/(\\d+)/", 1).cast("long"))
      .withColumn("e", graft.functions.HtmlOps.htmlExtract(col("html")))
    val cands = pages
      .select(col("doc_id"),
        graft.functions.UrlOps.urlDomain(col("base")).as("src_domain"),
        col("e.title").as("title"), col("e.text").as("page_text"),
        explode(col("e.links")).as("href"), col("base"))
      // materialize the resolved URL as an attribute so canon/domain/
      // path don't each re-expand the resolve tree (the Dedup/
      // RuleCascade pre-projection discipline)
      .withColumn("resolved", graft.functions.UrlOps.urlResolve(col("base"), col("href")))
      .withColumn("url", graft.functions.UrlOps.urlCanon(col("resolved")))
      .withColumn("dst_domain", graft.functions.UrlOps.urlDomain(col("url")))
      .filter(graft.functions.RobotsOps.robotsAllowed(lit(CrawlRobotsFixture),
        lit("graftbot"), graft.functions.UrlOps.urlPath(col("url"))))
    cands
      .groupBy("url")
      .agg(min(struct(col("doc_id"), col("dst_domain"), col("src_domain"),
        col("title"), col("page_text"))).as("m"))
      .select(col("url"), col("m.doc_id").as("doc_id"),
        col("m.dst_domain").as("dst_domain"), col("m.src_domain").as("src_domain"),
        col("m.title").as("title"), col("m.page_text").as("page_text"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("dst_domain").orderBy("doc_id", "url")))
      .filter(col("rn") <= 3)
      .select("doc_id", "url", "dst_domain", "src_domain", "title", "page_text")
  }
  val crawlPipelineSql: String =
    """WITH resp AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0),
      |cand AS (
      |  SELECT doc_id,
      |         'https://site' || (doc_id % 5) || '.com/p/' || doc_id AS url,
      |         'site' || (doc_id % 5) || '.com' AS dst_domain
      |  FROM resp
      |  UNION ALL
      |  SELECT doc_id, 'https://ext' || (doc_id % 7) || '.com/q',
      |         'ext' || (doc_id % 7) || '.com'
      |  FROM resp
      |  UNION ALL
      |  SELECT doc_id,
      |         'https://wide' || (doc_id % 97) || '.com/w/' || doc_id,
      |         'wide' || (doc_id % 97) || '.com'
      |  FROM resp),
      |dd AS (SELECT url, min(doc_id) AS doc_id, min(dst_domain) AS dst_domain
      |       FROM cand GROUP BY url),
      |adm AS (SELECT dd.*, row_number() OVER
      |          (PARTITION BY dst_domain ORDER BY doc_id, url) AS rn
      |        FROM dd)
      |SELECT doc_id, url, dst_domain,
      |       'site' || (doc_id % 5) || '.com' AS src_domain,
      |       'Doc ' || doc_id AS title,
      |       'café ' || doc_id || chr(10) || 'abcd' AS page_text
      |FROM adm WHERE rn <= 3""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_crawl_pipeline" -> crawlPipeline,
    "q_mojibake" -> mojibake,
    "q_html_charset" -> htmlCharset,
    "q_sitemap_parse" -> sitemapParse,
    "q_link_graph" -> linkGraph,
    "q_html_extract" -> htmlExtract,
    "q_html_meta" -> htmlMetaQ,
    "q_html_tables" -> htmlTablesQ,
    "q_canonical_dedup" -> canonicalDedup,
    "q_robots_policy" -> robotsPolicy,
    "q_url_canon" -> urlCanon,
    "q_cdx_index" -> cdxIndex,
    "q_cdx_fetch_plan" -> cdxFetchPlan,
    "q_url_dedup" -> urlDedup,
    "q_url_blocklist" -> urlBlocklist,
    "q_url_psl" -> urlPsl,
    "q_frontier_admission" -> frontierAdmission,
    "q_source_quality" -> sourceQuality,
    "q_ivf_health" -> ivfHealth,
    "q_reservoir" -> reservoir,
    "q_mix_plan" -> mixPlan,
    "q_curation_funnel" -> curationFunnel,
    "q_source_overlap_est" -> sourceOverlapEst,
    "q_cdc_dedup" -> cdcDedup,
    "q_lm_bigram" -> lmBigram,
    "q_classify" -> classify,
    "q_span_scrub" -> spanScrub,
    "q_scrub_delta" -> scrubDelta,
    "q_boilerplate_strip" -> boilerplateStrip,
    "q_classify_artifact" -> classifyArtifact,
    "q_classify_features" -> classifyFeatures,
    "q_classify_eval" -> classifyEval,
    "q_source_overlap" -> sourceOverlap,
    "q_pagerank" -> pageRank,
    "q_bpe_merges" -> bpeMerges,
    "q_bpe_tokenize" -> bpeTokenize,
    "q_bpe_vocab" -> bpeVocab,
    "q_linear_probe" -> linearProbe,
    "q_probe_auc" -> probeAuc,
    "q_probe_artifact" -> probeArtifact,
    "q_bpe_segment" -> bpeSegment,
    "q_unigram_vocab" -> unigramVocab,
    "q_unigram_segment" -> unigramSegment,
    "q_unigram_infer" -> unigramInfer,
    "q_unigram_artifact" -> unigramArtifact,
    "q_tokenizer_eval" -> tokenizerEval,
    "q_bpe_artifact" -> bpeArtifact,
    "q_authority_sample" -> authoritySample,
    "q_triangles" -> triangles,
    "q_lm_quality" -> lmQuality,
    "q_lm_artifact" -> lmArtifact,
    "q_ccnet_bucket" -> ccnetBucket,
    "q_domain_cap" -> domainCap,
    "q_weighted_sample" -> weightedSample,
    "q_dsir_resample" -> dsirResample,
    "q_sample_stratified" -> sampleStratified,
    "q_train_split" -> trainSplit,
    "q_mix_balance" -> mixBalance,
    "q_dedup_exact" -> dedupExact,
    "q_dedup_norm_exact" -> dedupNormExact,
    "q_dedup_ngram" -> dedupNgram,
    "q_dedup_minhash" -> dedupMinhash,
    "q_dedup_recall" -> dedupRecall,
    "q_dedup_simhash" -> dedupSimhash,
    "q_simhash_selectivity" -> simhashSelectivity,
    "q_dup_clusters" -> dupClusters,
    "q_split_by_cluster" -> splitByCluster,
    "q_contam_span" -> contamSpan,
    "q_repeated_span" -> repeatedSpan,
    "q_token_count" -> tokenCount,
    "q_quality_score" -> qualityScore,
    "q_gopher_rules" -> gopherRules,
    "q_lang_id" -> langId,
    "q_script_id" -> scriptId,
    "q_edit_distance" -> editDistance,
    "q_repetition" -> repetition,
    "q_decontaminate" -> decontaminate,
    "q_redact" -> redact,
    "q_vocab_topk" -> vocabTopK,
    "q_doc_fingerprint" -> docFingerprint,
    "q_ann_topk" -> annTopK,
    "q_ann_lsh" -> annLsh,
    "q_ann_ivf" -> annIvf,
    "q_ivf_assign" -> ivfAssign,
    "q_diverse_sample" -> diverseSample,
    "q_tfidf_topk" -> tfdfTopk,
    "q_collocations" -> collocations,
    "q_seq_pack" -> seqPack,
    "q_token_pipeline" -> tokenPipeline,
    "q_pretrain_corpus" -> pretrainCorpus,
    "q_chunk_spans" -> chunkSpans,
    "q_fuzzy_keyword" -> fuzzyKeyword,
    "q_ann_topk_agg" -> annTopKAgg,
    "q_embed_neardup" -> embedNearDup,
    "q_embed_neardup_lsh" -> embedNearDupLsh,
    "q_bm25_topk" -> bm25Retrieve,
    "q_pair_mining" -> pairMining,
    "q_bm25_artifact" -> bm25Artifact,
    "q_rrf_fusion" -> rrfFusion,
    "q_pq_codes" -> pqCodes,
    "q_sq_codes" -> sqCodes,
    "q_ann_sq" -> annSq,
    "q_pq_adc" -> pqAdc,
    "q_ivfadc" -> ivfAdc,
    "q_pq_rerank" -> pqRerank,
    "q_containment" -> containment,
    "q_freq_spectrum" -> freqSpectrum,
    "q_langid_eval" -> langIdEval,
    "q_cm_sketch" -> cmSketchEst,
    "q_heavy_hitters" -> heavyHittersQ,
    "q_bloom_contam" -> bloomContam,
    "q_hll" -> hllSketch,
    "q_novelty" -> novelty,
    "q_incremental_dedup" -> incrementalDedup,
    "q_vocab_coverage" -> vocabCover,
    "q_dedup_yield" -> dedupYield,
    "q_semdedup" -> semDedup,
    "q_ann_recall" -> annRecall,
    "q_mix_temperature" -> mixTemperature,
    "q_rule_fallback" -> ruleFallback)

  val oracleSql: Map[String, String] = Map(
    "q_crawl_pipeline" -> crawlPipelineSql,
    "q_mojibake" -> mojibakeSql,
    "q_html_charset" -> htmlCharsetSql,
    "q_sitemap_parse" -> sitemapParseSql,
    "q_link_graph" -> linkGraphSql,
    "q_html_extract" -> htmlExtractSql,
    "q_html_meta" -> htmlMetaSql,
    "q_html_tables" -> htmlTablesSql,
    "q_canonical_dedup" -> canonicalDedupSql,
    "q_robots_policy" -> robotsPolicySql,
    "q_url_canon" -> urlCanonSql,
    "q_cdx_index" -> cdxIndexSql,
    "q_cdx_fetch_plan" -> cdxFetchPlanSql,
    "q_url_dedup" -> urlDedupSql,
    "q_url_blocklist" -> urlBlocklistSql,
    "q_url_psl" -> urlPslSql,
    "q_frontier_admission" -> frontierAdmissionSql,
    "q_source_quality" -> sourceQualitySql,
    "q_ivf_health" -> ivfHealthSql,
    "q_reservoir" -> reservoirSql,
    "q_mix_plan" -> mixPlanSql,
    "q_curation_funnel" -> curationFunnelSql,
    "q_source_overlap_est" -> sourceOverlapEstSql,
    "q_cdc_dedup" -> cdcDedupSql,
    "q_lm_bigram" -> lmBigramSql,
    "q_classify" -> classifySql,
    "q_span_scrub" -> spanScrubSql,
    "q_scrub_delta" -> scrubDeltaSql,
    "q_boilerplate_strip" -> boilerplateStripSql,
    "q_classify_artifact" -> classifyArtifactSql,
    "q_classify_features" -> classifyFeaturesSql,
    "q_classify_eval" -> classifyEvalSql,
    "q_source_overlap" -> sourceOverlapSql,
    "q_pagerank" -> pageRankSql,
    "q_bpe_merges" -> bpeMergesSql,
    "q_bpe_tokenize" -> bpeTokenizeSql,
    "q_bpe_vocab" -> bpeVocabSql,
    "q_linear_probe" -> linearProbeSql,
    "q_probe_auc" -> probeAucSql,
    "q_probe_artifact" -> probeArtifactSql,
    "q_bpe_segment" -> bpeSegmentSql,
    "q_unigram_vocab" -> unigramVocabSql,
    "q_unigram_segment" -> unigramSegmentSql,
    "q_unigram_infer" -> unigramInferSql,
    "q_unigram_artifact" -> unigramArtifactSql,
    "q_tokenizer_eval" -> tokenizerEvalSql,
    "q_bpe_artifact" -> bpeArtifactSql,
    "q_authority_sample" -> authoritySampleSql,
    "q_triangles" -> trianglesSql,
    "q_lm_quality" -> lmQualitySql,
    "q_lm_artifact" -> lmArtifactSql,
    "q_ccnet_bucket" -> ccnetBucketSql,
    "q_domain_cap" -> domainCapSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_dsir_resample" -> dsirResampleSql,
    "q_sample_stratified" -> sampleStratifiedSql,
    "q_train_split" -> trainSplitSql,
    "q_mix_balance" -> mixBalanceSql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_norm_exact" -> dedupNormExactSql,
    "q_dedup_ngram" -> dedupNgramSql,
    "q_dedup_minhash" -> dedupMinhashSql,
    "q_dedup_recall" -> dedupRecallSql,
    "q_dedup_simhash" -> dedupSimhashSql,
    "q_simhash_selectivity" -> simhashSelectivitySql,
    "q_dup_clusters" -> dupClustersSql,
    "q_split_by_cluster" -> splitByClusterSql,
    "q_contam_span" -> contamSpanSql,
    "q_repeated_span" -> repeatedSpanSql,
    "q_token_count" -> tokenCountSql,
    "q_quality_score" -> qualityScoreSql,
    "q_gopher_rules" -> gopherRulesSql,
    "q_lang_id" -> langIdSql,
    "q_script_id" -> scriptIdSql,
    "q_edit_distance" -> editDistanceSql,
    "q_repetition" -> repetitionSql,
    "q_decontaminate" -> decontaminateSql,
    "q_redact" -> redactSql,
    "q_vocab_topk" -> vocabTopKSql,
    "q_doc_fingerprint" -> docFingerprintSql,
    "q_ann_topk" -> annTopKSql,
    "q_ann_lsh" -> annLshSql,
    "q_ann_ivf" -> annIvfSql,
    "q_ivf_assign" -> ivfAssignSql,
    "q_diverse_sample" -> diverseSampleSql,
    "q_tfidf_topk" -> tfdfTopkSql,
    "q_collocations" -> collocationsSql,
    "q_seq_pack" -> seqPackSql,
    "q_token_pipeline" -> tokenPipelineSql,
    "q_pretrain_corpus" -> pretrainCorpusSql,
    "q_chunk_spans" -> chunkSpansSql,
    "q_fuzzy_keyword" -> fuzzyKeywordSql,
    "q_ann_topk_agg" -> annTopKSql,
    "q_embed_neardup" -> embedNearDupSql,
    "q_embed_neardup_lsh" -> embedNearDupLshSql,
    "q_bm25_topk" -> bm25RetrieveSql,
    "q_pair_mining" -> pairMiningSql,
    "q_bm25_artifact" -> bm25ArtifactSql,
    "q_rrf_fusion" -> rrfFusionSql,
    "q_pq_codes" -> pqCodesSql,
    "q_sq_codes" -> sqCodesSql,
    "q_ann_sq" -> annSqSql,
    "q_pq_adc" -> pqAdcSql,
    "q_ivfadc" -> ivfAdcSql,
    "q_pq_rerank" -> pqRerankSql,
    "q_containment" -> containmentSql,
    "q_freq_spectrum" -> freqSpectrumSql,
    "q_langid_eval" -> langIdEvalSql,
    "q_cm_sketch" -> cmSketchEstSql,
    "q_heavy_hitters" -> heavyHittersSqlQ,
    "q_bloom_contam" -> bloomContamSql,
    "q_hll" -> hllSketchSql,
    "q_novelty" -> noveltySql,
    "q_incremental_dedup" -> incrementalDedupSql,
    "q_vocab_coverage" -> vocabCoverSql,
    "q_dedup_yield" -> dedupYieldSql,
    "q_semdedup" -> semDedupSql,
    "q_ann_recall" -> annRecallSql,
    "q_mix_temperature" -> mixTemperatureSql,
    "q_rule_fallback" -> ruleFallbackSql)
}
