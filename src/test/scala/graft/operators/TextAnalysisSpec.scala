package graft.operators

import graft.SparkSpec

/** Text-analysis operator semantics on hand-checkable inputs. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace, regex-token and char counts") {
    val out = TextAnalysis.withTokenCounts(
      Seq((1L, "ab cd, ef 12")).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_ws_tokens", "n_re_tokens", "n_chars").head
    // regex tokens: ab, cd, ",", ef, 12
    assert((out.getInt(0), out.getInt(1), out.getInt(2)) === ((4, 5, 12)))
  }

  test("quality score: distinct ratio, stopword ratio, mean length blend") {
    val text = "the cat sat on the mat" // 6 words, 5 distinct, 3 stopwords (the/on/the)
    val r = TextAnalysis.withQualityScore(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_words", "distinct_ratio", "stop_ratio", "mean_word_len", "quality_score").head
    assert(r.getInt(0) === 6)
    assert(r.getDouble(1) === 5.0 / 6.0)
    assert(r.getDouble(2) === 3.0 / 6.0)
    assert(r.getDouble(3) === (22.0 - 5.0) / 6.0)
    val expected = (5.0 / 6.0) * 0.5 + (3.0 / 6.0) * 0.25 // mean len 2.83 < 3.0 -> no bonus
    assert(math.abs(r.getDouble(4) - expected) < 1e-12)
  }

  test("language id picks the dominant marker set; und when none match") {
    val out = TextAnalysis.withLangId(Seq(
      (1L, "the house of the king and a dog"),
      (2L, "el perro de la casa y los gatos"),
      (3L, "zzz qqq www")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
    assert(out(3L) === "und")
  }

  test("fingerprint: null min/max for docs shorter than n words, stable text hash") {
    val out = TextAnalysis.withFingerprint(Seq(
      (1L, "one two three four five six"),
      (2L, "tiny")).toDF("doc_id", "text"), "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(!out(0).isNullAt(2) && !out(0).isNullAt(3))
    assert(out(1).isNullAt(2) && out(1).isNullAt(3)) // no 5-gram shingles
    assert(out(0).getLong(1) !== out(1).getLong(1))
  }

  test("topWords: exact counts, deterministic tiebreak, TakeOrderedAndProject plan") {
    val df = TextAnalysis.topWords(Seq(
      (1L, "b a b c b a"), (2L, "a c d")).toDF("doc_id", "text"), "text", 3)
    assert(df.as[(String, Long)].collect().toSeq === Seq(("a", 3L), ("b", 3L), ("c", 2L)))
    // global top-k must be the bounded per-partition merge, never a full sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("redactPii scrubs emails, IPv4s and phone runs; leaves clean text alone") {
    val out = evalStr(Seq(
      "write to john.doe+spam@mail.example.org today",
      "call +1 555-0199 or (415) 555-2671 now",
      "server at 192.168.0.1 responded",
      "mixed: a@b.co and 10.0.0.1 and +33 1 23 45 67 89",
      "no pii here, just 42 words"))(TextAnalysis.redactPii)
    assert(out(0) === "write to <EMAIL> today")
    assert(out(1) === "call <PHONE> or (415) 555-2671 now".replace("(415) 555-2671", "<PHONE>"))
    assert(out(2) === "server at <IP> responded")
    assert(out(3) === "mixed: <EMAIL> and <IP> and <PHONE>")
    assert(out(4) === "no pii here, just 42 words")
  }

  test("contaminationPairs counts shared distinct n-grams, disjoint sets stay empty") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different words in this doc here")).toDF("doc_id", "text")
    val probes = Seq(
      (100L, "alpha beta gamma delta other tail")).toDF("doc_id", "text")
    val out = Dedup.contaminationPairs(corpus, "doc_id", "text", probes, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect()
    // doc 1 shares exactly one distinct 4-gram ("alpha beta gamma delta")
    assert(out.toSeq === Seq((1L, 100L, 1L)))
  }

  test("repetition signals: known ratios on a hand-built doc, nulls below n words") {
    // "a b a b a b": 6 words, 2 distinct -> dup 2/3; bigrams
    // [a b, b a, a b, b a, a b] -> top "a b" 3/5; trigrams
    // [a b a, b a b, a b a, b a b] -> top 2/4
    val out = TextAnalysis.withRepetitionSignals(Seq(
      (1L, "a b a b a b"),
      (2L, "all words here are different ones"),
      (3L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 6L)
    assert(math.abs(out(0).getDouble(2) - (1.0 - 2.0 / 6.0)) < 1e-15)
    assert(out(0).getDouble(3) === 3.0 / 5.0)
    assert(out(0).getDouble(4) === 2.0 / 4.0)
    // fully distinct doc: dup ratio 0, every bigram unique -> 1/5
    assert(out(1).getDouble(2) === 0.0)
    assert(out(1).getDouble(3) === 1.0 / 5.0)
    // one word: no bigrams/trigrams -> null ratios, dup 0
    assert(out(2).getLong(1) === 1L)
    assert(out(2).getDouble(2) === 0.0)
    assert(out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("tf/df top terms: corpus-wide words rank below document-specific ones") {
    // "common" appears in every doc (df=3); each doc has a private word
    // repeated twice (tf=2, df=1) that must rank first by tf/df.
    val docs = Seq(
      (1L, "common alpha alpha common"),
      (2L, "common beta beta"),
      (3L, "common gamma gamma gamma")).toDF("doc_id", "text")
    val got = TextAnalysis.topTermsByTfDf(docs, "doc_id", "text", 1)
      .select("doc_id", "word", "tf", "df", "score", "rk")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, "alpha", 2L, 1L, 2.0, 1),
      (2L, "beta", 2L, 1L, 2.0, 1),
      (3L, "gamma", 3L, 1L, 3.0, 1)))
    // with k=2 the shared word appears with df = corpus size
    val second = TextAnalysis.topTermsByTfDf(docs, "doc_id", "text", 2)
      .filter($"rk" === 2).select("word", "df").as[(String, Long)].collect().toSet
    assert(second === Set(("common", 3L)))
  }

  test("fuzzy keyword matching absorbs distance-1 typos, counts occurrences") {
    val docs = Seq(
      (1L, "scan scan scann skan xcan"),   // 4 variants of 'scan' within dist 1 (not 'skan'? s->k is 1 edit -> yes)
      (2L, "wildly unrelated words here")).toDF("doc_id", "text")
    val got = TextAnalysis.fuzzyKeywordMatches(docs, "text", Seq("scan", "zzzz"), 1)
      .as[(String, Long, Long, String)].collect().toSeq
    // 'zzzz' matches nothing and drops out (inner join)
    assert(got.map(_._1) === Seq("scan"))
    val (_, variants, occ, first) = got.head
    // variants: scan, scann, skan, xcan (distinct words), occurrences: 2+1+1+1
    assert(variants === 4L && occ === 5L && first === "scan")
  }

  test("collocations rank glued pairs above chance co-occurrence, top-k map-side") {
    // "new"/"york" occur ONLY as the glued pair; alpha/beta straddle
    // both doc shapes, so every other adjacent pair shares a word with
    // a higher unigram count and ranks strictly below. Exact expected
    // lift: N=160 tokens, n_ab=20, n_new=n_york=20 → 20·160/400 = 8.
    val docs = ((1 to 20).map(i => (i.toLong, "new york alpha beta")) ++
      (21 to 40).map(i => (i.toLong, "alpha gamma beta delta"))).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 5, k = 3)
    val rows = got.collect()
    assert(rows.head.getString(0) === "new" && rows.head.getString(1) === "york")
    assert(rows.head.getDouble(5) === 8.0)
    rows.tail.foreach(r => assert(r.getDouble(5) < 8.0))
    // global top-k plans as TakeOrderedAndProject — never a full sort
    assert(got.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("contaminationSpans: consecutive shared grams fuse into one span, scattered ones don't") {
    val corpus = Seq(
      // doc 1 shares the probe's first five words: grams at pos 0 and 1
      // are consecutive -> one island of run 2 -> span 2 + 3 = 5 words
      (1L, "a b c d e f g h"),
      // doc 2 matches the same gram twice, SEPARATED -> two islands of
      // run 1 -> max_run 1, span 4, but n_shared_pos 2
      (2L, "a b c d q r s a b c d")).toDF("doc_id", "text")
    val probes = Seq((10L, "a b c d e x y z")).toDF("doc_id", "text")
    val got = Dedup.contaminationSpans(corpus, "doc_id", "text", probes, "doc_id", "text", 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L, 2L, 2L, 5L), (2L, 10L, 2L, 1L, 4L)))
  }

  test("freq spectrum conserves totals: sum occ*n_words = tokens, sum n_words = vocabulary") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    // counts: a=4, b=3, c=1, d=1 -> spectrum {4:1, 3:1, 1:2}
    val spec = TextAnalysis.freqSpectrum(docs, "text")
      .as[(Long, Long)].collect().toMap
    assert(spec === Map(4L -> 1L, 3L -> 1L, 1L -> 2L))
    assert(spec.map { case (occ, n) => occ * n }.sum === 9L) // total tokens
    assert(spec.values.sum === 4L) // distinct words
  }

  test("vocabCoverage: tokens outside the top-V vocab count as unk") {
    // counts: a=3, b=2, c=1 -> top-2 vocab {a, b}; c is the only unk
    val docs = Seq((1L, "a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((3L, 1L, 1.0 / 3)))
    assert(out(2L) === ((3L, 0L, 0.0)))
  }

  test("langIdEval confusion matrix partitions the corpus by its label") {
    val docs = Seq(
      (1L, "the a of and to in is", "en"),
      (2L, "el la de que y los es", "es"),
      (3L, "qq rr ss", "en")).toDF("doc_id", "text", "lang")
    val m = TextAnalysis.langIdEval(docs, "doc_id", "text", "lang")
      .as[(String, String, Long)].collect().toSet
    assert(m === Set(("en", "en", 1L), ("es", "es", 1L), ("en", "und", 1L)))
  }

  test("gopherRules: each rule fails exactly its violating doc") {
    // minWords=3, maxWords=6, meanLen in [2,4], rep: max*3<=n, >=2 stopwords
    val docs = Seq(
      (1L, "the cat sat on it"),            // passes all (5 words, meanLen 2.8, max 1*3<=5, stops {the,it,on})
      (2L, "the it"),                       // wc fail (2 words)
      (3L, "the considerable magnificent onomatopoeia it"), // wlen fail (meanLen 8.2)
      (4L, "the the the the it x"),         // rep fail (4*3 > 6)
      (5L, "cat dog bird fish")).toDF("doc_id", "text") // stop fail (0 stopwords)
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text", 3, 6, 2, 4, 3, 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("wc_ok"), r.getAs[Boolean]("wlen_ok"),
          r.getAs[Boolean]("rep_ok"), r.getAs[Boolean]("stop_ok"),
          r.getAs[Boolean]("keep")))).toMap
    assert(out(1L) === ((true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._5)
    assert(!out(3L)._2 && !out(3L)._5)
    assert(!out(4L)._3 && !out(4L)._5)
    assert(!out(5L)._4 && !out(5L)._5)
  }

  test("gopherRules ignores empty tokens from repeated separators") {
    val docs = Seq((1L, "the  cat   sat  on  it")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text", 3, 6, 2, 4, 3, 2).collect()
    assert(out.head.getAs[Long]("n_words") == 5L)
  }

  test("fuzzy matching runs the length band BEFORE the levenshtein DP") {
    // |len(a) − len(b)| lower-bounds edit distance: the cheap band must
    // sit ahead of the O(|a|·|b|) DP in the join condition so the
    // short-circuiting conjunction prunes most pairs for free
    val docs = Seq((1L, "scan words")).toDF("doc_id", "text")
    val plan = TextAnalysis.fuzzyKeywordMatches(docs, "text", Seq("scan"), 1)
      .queryExecution.optimizedPlan.toString.replaceAll("\n", " ")
    val cond = "abs\\(\\(length\\(word.*?\\) - length\\(dict_word.*?\\)\\)\\) <= 1\\).*levenshtein".r
    assert(cond.findFirstIn(plan).isDefined, plan.take(1200))
  }
}
