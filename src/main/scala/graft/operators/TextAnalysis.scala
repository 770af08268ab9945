package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristics, document fingerprinting.
  * All pure column expressions (no UDFs) — they run inside whole-stage
  * codegen and cost one map pass over the corpus.
  */
object TextAnalysis {
  import Hashing._

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: the operator shape (N parallel
    * marker-set scores + argmax) is what matters; real pipelines swap in
    * bigger tables via the same structure.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "ein"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "you3", "he2"))

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it", "on", "for")

  /** Count of words (with multiplicity) that appear in `set`. */
  def markerCount(wordsCol: Column, set: Seq[String]): Column =
    size(filter(wordsCol, w => w.isin(set.map(lit): _*)))

  def markerCountSql(wordsExpr: String, set: Seq[String]): String = {
    val lst = set.map(s => s"'$s'").mkString("[", ", ", "]")
    s"len(list_filter($wordsExpr, w -> list_contains($lst, w)))"
  }

  /** Whitespace token count, BPE-ish regex token count, char count. */
  def withTokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      size(w).as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
        .as("n_re_tokens"),
      length(col(textCol)).as("n_chars"))
  }

  /** Quality heuristics: word count, distinct-word ratio, mean word
    * length, stopword ratio, and a blended score. All ratios are a single
    * int/int division (bit-deterministic cross-engine).
    */
  def withQualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Words array is projected once: `split` is expensive and every
    // ratio below references it (CollapseProject keeps the boundary).
    val w = col("_w")
    val nWords = size(w)
    val nDistinct = size(array_distinct(w))
    val nStop = markerCount(w, EnStopwords)
    val meanLen = (length(col("_t")) - (nWords - 1)).cast("double") / nWords
    docs.select(col(idCol).as("doc_id"), col(textCol).as("_t"), words(col(textCol)).as("_w"))
      .select(col("doc_id"),
        nWords.as("n_words"),
        (nDistinct.cast("double") / nWords).as("distinct_ratio"),
        meanLen.as("mean_word_len"),
        (nStop.cast("double") / nWords).as("stop_ratio"))
      .withColumn("quality_score",
        col("distinct_ratio") * 0.5 + col("stop_ratio") * 0.25
          + when(col("mean_word_len") >= 3.0 && col("mean_word_len") <= 8.0, 0.25).otherwise(0.0))
  }

  /** Language-ID: argmax of marker counts; ties resolve to the first
    * language in LangMarkers order, no markers at all → "und".
    */
  def withLangId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Project words once, then score each marker set off the attribute.
    val scores = LangMarkers.map { case (lang, set) => lang -> markerCount(col("_w"), set) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // when-chain in LangMarkers order = first-match-wins on ties.
    val pred = LangMarkers.map(_._1).foldRight(lit("und"): Column) { case (lang, acc) =>
      when(col(s"_s_$lang") === col("_best") && col("_best") > 0, lit(lang)).otherwise(acc)
    }
    docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("_w"))
      .select(col("doc_id") +: scores.map { case (lang, s) => s.as(s"_s_$lang") }: _*)
      .withColumn("_best", LangMarkers.map(m => col(s"_s_${m._1}")).reduce((a, b) => greatest(a, b)))
      .select(col("doc_id"), pred.as("pred_lang"))
  }

  /** Corpus vocabulary top-k: the k most frequent words with counts.
    * One map-side-combined hash agg keyed by word, then orderBy+limit —
    * Spark plans TakeOrderedAndProject (per-partition bounded top-k
    * merged at the driver, O(k) memory), NOT a global window sort, so
    * this is the safe global-top-k shape at any corpus size.
    */
  def topWords(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(k)

  /** Per-document characteristic terms by tf/df — tf-idf with the
    * log-free inverse-frequency weight `1/df`. Deliberately log-free:
    * `ln` is not correctly-rounded by IEEE, so Java's `Math.log` and an
    * oracle engine's `std::log` can disagree in the last ulp, which a
    * hash gate cannot tolerate; `tf/df` is a single exact double
    * division with the identical ranking direction (rarer term → bigger
    * weight).
    *
    * Shape for scale: ONE explode pass; tf is a map-side-combined hash
    * agg keyed (doc, word); df REUSES the tf aggregate (count of
    * doc-word rows per word — no second corpus pass); the join back is
    * keyed by word (vocabulary-sized right side, Zipf-skew absorbed by
    * AQE); per-doc top-k is a row_number window that WindowGroupLimit
    * cuts map-side.
    */
  def topTermsByTfDf(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
    val tf = docs.select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("word"))
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "word", "tf", "df", "score", "rk")
  }

  def topTermsByTfDfSql(k: Int): String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY doc_id, word),
       |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
       |s AS (SELECT tf.doc_id, tf.word, tf.tf, df.df, CAST(tf.tf AS DOUBLE) / df.df AS score
       |      FROM tf JOIN df USING (word))
       |SELECT doc_id, word, tf, df, score, CAST(rk AS INTEGER) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rk FROM s)
       |WHERE rk <= $k""".stripMargin

  /** Word frequency-of-frequencies (the Zipf spectrum): how many
    * distinct words occur exactly `occ` times. The standard vocabulary
    * diagnostic — hapax count (occ=1) drives Good-Turing smoothing and
    * tokenizer-vocab sizing, and the spectrum's slope is the corpus's
    * Zipf exponent. Two map-side-combined hash aggs (word counts, then
    * count-of-counts over the vocabulary-sized result); the second agg
    * keys on `occ`, whose skew (most words are rare) is exactly what
    * partial aggregation flattens.
    */
  def freqSpectrum(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("occ"))
      .groupBy("occ").agg(count(lit(1)).as("n_words"))

  def freqSpectrumSql(table: String, textCol: String): String =
    s"""SELECT occ, count(*) AS n_words
       |FROM (SELECT word, count(*) AS occ
       |      FROM (SELECT unnest(${wordsSql(textCol)}) AS word FROM $table)
       |      GROUP BY word)
       |GROUP BY occ""".stripMargin

  /** Top-V vocabulary coverage: per document, total tokens, tokens
    * OUTSIDE the corpus's `vocabSize` most frequent words, and the unk
    * rate — the tokenizer-sizing loop's core number (what OOV rate
    * does a V-word vocab buy on this corpus?). Join-shaped on purpose:
    * the vocab is a DataFrame met with a word-keyed left join, so V
    * can be 100k without touching a driver list or an isin literal;
    * vocab selection itself is the bounded TakeOrderedAndProject
    * top-k. Ties at the V boundary break (count desc, word) —
    * deterministic on both engines.
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("word"))
    val vocab = tok.groupBy("word").agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("word")).limit(vocabSize)
      .select(col("word"), lit(1).as("_in"))
    tok.join(vocab, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_unk"))
      .withColumn("unk_rate", col("n_unk") / col("n_tokens"))
  }

  def vocabCoverageSql(table: String, textCol: String, vocabSize: Int): String =
    s"""WITH tok AS (SELECT doc_id, unnest(${wordsSql(textCol)}) AS word FROM $table),
       |v AS (SELECT word, 1 AS v_in FROM (
       |        SELECT word, count(*) AS n FROM tok GROUP BY 1
       |        ORDER BY n DESC, word LIMIT $vocabSize))
       |SELECT doc_id, count(*) AS n_tokens,
       |       CAST(sum(CASE WHEN v_in IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
       |       CAST(sum(CASE WHEN v_in IS NULL THEN 1 ELSE 0 END) AS BIGINT) / count(*) AS unk_rate
       |FROM tok LEFT JOIN v USING (word) GROUP BY doc_id""".stripMargin

  /** Language-ID confusion matrix: predicted language (from
    * [[withLangId]]) against the labeled `langCol`, with counts — the
    * eval-loop query every heuristic classifier needs before it gates
    * a corpus. One extra doc-id-keyed join over the label column and a
    * tiny (|langs|²-bounded) aggregate.
    */
  def langIdEval(docs: DataFrame, idCol: String, textCol: String,
                 langCol: String): DataFrame =
    withLangId(docs, idCol, textCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")), Seq("doc_id"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))

  /** Typo-tolerant keyword matching: corpus words within edit distance
    * `maxDist` of a dictionary term (the OCR-cleanup / fuzzy-keyword
    * shape — the reference's scanned-document domain produces exactly
    * this noise). Scale shape: match against the DISTINCT vocabulary
    * (one hash agg; Heaps' law keeps it tiny vs the corpus), then
    * cross the vocab with the broadcast dictionary — `levenshtein` is
    * integer DP, identical on any engine, so the oracle hash-gates it.
    * Output per dictionary term: match count and total corpus
    * occurrences absorbed.
    */
  def fuzzyKeywordMatches(docs: DataFrame, textCol: String,
                          dictionary: Seq[String], maxDist: Int): DataFrame = {
    require(dictionary.nonEmpty && maxDist >= 0, "need a dictionary and maxDist >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("occ"))
    // Length band first: |len(a) − len(b)| is a lower bound on edit
    // distance, and two length() calls + abs compare are ~free next to
    // the O(|a|·|b|) levenshtein DP — the band prunes most vocab×dict
    // pairs before the DP runs (condition order is load-bearing; a
    // conjunction evaluates left-to-right and short-circuits).
    vocab.join(broadcast(dictionary.toDF("dict_word")),
        abs(length(col("word")) - length(col("dict_word"))) <= maxDist &&
          levenshtein(col("word"), col("dict_word")) <= maxDist)
      .groupBy("dict_word")
      .agg(count(lit(1)).as("n_variants"), sum(col("occ")).as("n_occurrences"),
        min(col("word")).as("first_variant"))
  }

  // ------------------------------------------------------------------ collocations
  /** Top-k bigram collocations by LIFT — phrase mining for tokenizer /
    * vocabulary work: `lift = P(ab) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)`
    * ranks word pairs that co-occur far above chance ("new york"-shaped
    * units a whitespace tokenizer splits). PMI is `ln(lift)` — the ln
    * is MONOTONE, so ranking by lift IS ranking by PMI while keeping
    * the gated column inside correctly-rounded IEEE arithmetic (the
    * integer products stay well under 2^53, so the double division is
    * the only rounding step and both engines round it identically; the
    * ln stays out per the no-ln-in-oracle-columns rule).
    *
    * Scale shape: one pass for unigram counts, one for bigram counts
    * (map-side combined), a minCount pre-filter BEFORE the two
    * vocab-sized count joins, then a global top-k that plans as
    * TakeOrderedAndProject (per-partition k, never a full sort). The
    * total-token count N is a driver scalar (model state, same class
    * as balanceToMix's per-source counts). Ties at the k boundary are
    * impossible to mis-order: (lift, w1, w2) is a total order because
    * (w1, w2) is unique.
    */
  def collocations(docs: DataFrame, textCol: String, minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, "need minCount >= 1 and k >= 1")
    val w = docs.select(words(col(textCol)).as("w"))
    val toks = w.select(explode(col("w")).as("word"))
    val nTot = toks.count()
    val uni = toks.groupBy("word").agg(count(lit(1)).as("n_w"))
    val bi = w.select(explode(ngramsFromWords(col("w"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .select(split(col("bigram"), " ").getItem(0).as("w1"),
        split(col("bigram"), " ").getItem(1).as("w2"), col("n_ab"))
    bi.join(uni.select(col("word").as("w1"), col("n_w").as("n_a")), Seq("w1"))
      .join(uni.select(col("word").as("w2"), col("n_w").as("n_b")), Seq("w2"))
      .withColumn("lift",
        (col("n_ab") * lit(nTot)).cast("double") / (col("n_a") * col("n_b")).cast("double"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
      .select("w1", "w2", "n_ab", "n_a", "n_b", "lift")
  }

  /** DuckDB twin generated from the same constants. */
  def collocationsSql(table: String, textCol: String, minCount: Long, k: Int): String =
    s"""WITH w AS (SELECT ${wordsSql(textCol)} AS ws FROM $table),
       |tok AS (SELECT unnest(ws) AS word FROM w),
       |tot AS (SELECT count(*) AS n_tot FROM tok),
       |uni AS (SELECT word, count(*) AS n_w FROM tok GROUP BY 1),
       |bi AS (SELECT unnest(${ngramsSql("ws", 2)}) AS bigram FROM w),
       |bc AS (SELECT bigram, count(*) AS n_ab FROM bi GROUP BY 1 HAVING count(*) >= $minCount),
       |sp AS (SELECT n_ab, string_split(bigram, ' ')[1] AS w1,
       |              string_split(bigram, ' ')[2] AS w2 FROM bc)
       |SELECT w1, w2, n_ab, a.n_w AS n_a, b.n_w AS n_b,
       |       CAST(n_ab * n_tot AS DOUBLE) / CAST(a.n_w * b.n_w AS DOUBLE) AS lift
       |FROM sp JOIN uni a ON sp.w1 = a.word JOIN uni b ON sp.w2 = b.word CROSS JOIN tot
       |ORDER BY lift DESC, w1, w2 LIMIT $k""".stripMargin

  // ------------------------------------------------------------------ PII scrub
  /** Redaction patterns shared by the Spark expression and the DuckDB
    * oracle — restricted to syntax both Java regex and RE2 interpret
    * identically (no backrefs, no lookaround).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+?\\(?[0-9][0-9 ()-]{6,}[0-9]"

  /** PII scrubbing for training corpora: emails, IPv4s and phone-shaped
    * digit runs replaced with typed placeholders. Order matters and is
    * part of the contract: emails first (their local parts contain
    * digits a phone pattern could nibble), IPs before phones (dots keep
    * IPs out of the phone charset, but only until a phone-like prefix
    * overlaps). Pure `regexp_replace` chain — codegen'd, one map pass,
    * no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def redactPiiSql(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($e, '$EmailRe', '<EMAIL>', 'g'), " +
      s"'$Ipv4Re', '<IP>', 'g'), '$PhoneRe', '<PHONE>', 'g')"

  /** Gopher-style repetition/boilerplate signals (Rae et al. 2021 §A1.1:
    * repetitious documents are low-quality training data): per doc the
    * duplicate-word ratio and, for each n in `ns`, the fraction of
    * n-gram occurrences taken by the single most common n-gram.
    *
    * Deliberately AGGREGATION-shaped, not per-row array lambdas: the
    * mode of an array via HOFs is O(len²) interpreted per document —
    * fatal on 10k-word docs. Exploding to (doc, gram) and hash-
    * aggregating is one map-side-combined shuffle per n, keyed by
    * (doc_id, gram) — uniform keys, no skew, linear in corpus size.
    * Docs shorter than n words get a null ratio (left join), mirroring
    * "no n-grams" rather than a fake 0.
    */
  def withRepetitionSignals(docs: DataFrame, idCol: String, textCol: String,
                            ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("_w"))
    val wordStats = base.select(col("doc_id"), explode(col("_w")).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), countDistinct(col("w")).as("_n_distinct"))
      .withColumn("dup_word_ratio",
        lit(1.0) - col("_n_distinct").cast("double") / col("n_words").cast("double"))
      .drop("_n_distinct")
    val gramRatios = ns.map { n =>
      base.select(col("doc_id"), explode(ngramsFromWords(col("_w"), n)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as(s"top${n}gram_ratio"))
    }
    gramRatios.foldLeft(wordStats)((acc, df) => acc.join(df, Seq("doc_id"), "left"))
  }

  /** Gopher/MassiveText-style quality RULE GATE: hard boolean filters
    * next to the soft [[withQualityScore]] blend. Four of the published
    * rules apply to this corpus shape (single-line word streams):
    * word-count bounds, mean-word-length bounds, top-word repetition
    * cap, and the ≥2-distinct-stopwords requirement. Every rule is
    * decided in INTEGER arithmetic (cross-multiplied instead of
    * divided), so the gate is bit-identical cross-engine — no double
    * ever materializes.
    *
    * Shape: explode → (doc, word) counts → per-doc fold. Two map-side
    * -combined hash aggs keyed by (doc_id, word) then doc_id — uniform
    * keys, linear in corpus size, no window and no skew at any scale.
    *
    * @param repDen top-word frequency cap as max_n · repDen <= n_words
    *               (i.e. the most frequent word may be at most 1/repDen
    *               of the doc)
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Long, maxWords: Long,
                  minMeanLen: Long, maxMeanLen: Long,
                  repDen: Long, minStopwords: Long): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(filter(words(col(textCol)), w => length(w) > 0)).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_words"),
        max(col("c")).as("max_word_n"),
        sum(col("c") * length(col("w"))).as("_sum_len"),
        countDistinct(when(col("w").isin(EnStopwords.map(lit): _*), col("w")))
          .as("_n_stop"))
      .select(col("doc_id"), col("n_words"), col("max_word_n"),
        (col("n_words") >= minWords && col("n_words") <= maxWords).as("wc_ok"),
        (col("_sum_len") >= col("n_words") * minMeanLen &&
          col("_sum_len") <= col("n_words") * maxMeanLen).as("wlen_ok"),
        (col("max_word_n") * repDen <= col("n_words")).as("rep_ok"),
        (col("_n_stop") >= minStopwords).as("stop_ok"))
      .withColumn("keep",
        col("wc_ok") && col("wlen_ok") && col("rep_ok") && col("stop_ok"))

  /** Composable CTE chain for [[gopherRulesSql]]: `${p}w → ${p}c →
    * ${p}d`, the per-doc aggregate a caller's keep-filter reads. The
    * prefix keeps the names collision-free when embedded in a larger
    * oracle (the pretrain capstone runs this over a survivor CTE).
    */
  def gopherRulesCtes(p: String, table: String, idCol: String, textCol: String): String = {
    val stopList = EnStopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""${p}w AS (SELECT $idCol AS doc_id,
       |                  unnest(list_filter(string_split($textCol, ' '), x -> strlen(x) > 0)) AS w
       |           FROM $table),
       |${p}c AS (SELECT doc_id, w, count(*) AS c FROM ${p}w GROUP BY 1, 2),
       |${p}d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS max_word_n,
       |             CAST(sum(c * strlen(w)) AS BIGINT) AS sum_len,
       |             count(DISTINCT CASE WHEN list_contains($stopList, w) THEN w END) AS n_stop
       |      FROM ${p}c GROUP BY 1)""".stripMargin
  }

  /** The keep predicate over a `gopherRulesCtes` `${p}d` row. */
  def gopherKeepSql(minWords: Long, maxWords: Long,
                    minMeanLen: Long, maxMeanLen: Long,
                    repDen: Long, minStopwords: Long): String =
    s"""(n_words >= $minWords AND n_words <= $maxWords)
       |         AND (sum_len >= n_words * $minMeanLen AND sum_len <= n_words * $maxMeanLen)
       |         AND (max_word_n * $repDen <= n_words)
       |         AND (n_stop >= $minStopwords)""".stripMargin

  /** DuckDB twin of [[gopherRules]] (same integer cross-multiplies). */
  def gopherRulesSql(table: String, idCol: String, textCol: String,
                     minWords: Long, maxWords: Long,
                     minMeanLen: Long, maxMeanLen: Long,
                     repDen: Long, minStopwords: Long): String = {
    s"""WITH ${gopherRulesCtes("", table, idCol, textCol)}
       |SELECT doc_id, n_words, max_word_n,
       |       n_words >= $minWords AND n_words <= $maxWords AS wc_ok,
       |       sum_len >= n_words * $minMeanLen AND sum_len <= n_words * $maxMeanLen AS wlen_ok,
       |       max_word_n * $repDen <= n_words AS rep_ok,
       |       n_stop >= $minStopwords AS stop_ok,
       |       (n_words >= $minWords AND n_words <= $maxWords)
       |         AND (sum_len >= n_words * $minMeanLen AND sum_len <= n_words * $maxMeanLen)
       |         AND (max_word_n * $repDen <= n_words)
       |         AND (n_stop >= $minStopwords) AS keep
       |FROM d""".stripMargin
  }

  /** Fingerprints: whole-text stable hash + min/max shingle hashes (the
    * rolling-hash document signature).
    */
  def withFingerprint(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // Three materialization steps: words once, the hashed shingle array
    // once, then min+max over the attribute — the md5-per-shingle lambda
    // runs a single time instead of once per aggregate.
    docs.select(col(idCol).as("doc_id"), col(textCol).as("_t"), words(col(textCol)).as("_w"))
      .select(col("doc_id"),
        stableHash60(col("_t")).as("text_hash"),
        shingleHashes(shinglesFromWords(col("_w"), n)).as("_hs"))
      .select(col("doc_id"), col("text_hash"),
        array_min(col("_hs")).as("min_shingle_hash"),
        array_max(col("_hs")).as("max_shingle_hash"))
}
