package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CCNet-curation invariants: score arithmetic on a hand-checkable
  * corpus, bucket monotonicity and per-language coverage, domain-cap
  * bounds and determinism, weighted-sample endpoint guarantees.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, 10 corpus tokens total: "a"×5, "b"×3, "c"×2 →
  // rel_ppb(a)=500e6, rel_ppb(b)=300e6, rel_ppb(c)=200e6.
  private def tiny = Seq(
    (1L, "a a a", "en"),
    (2L, "a b b", "en"),
    (3L, "a b c", "en"),
    (4L, "c", "de")).toDF("doc_id", "text", "lang")

  test("unigramQuality computes the exact mean corpus frequency in ppb") {
    val out = Curation.unigramQuality(tiny, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map { case (id, n, s) => id -> ((n, s)) }.toMap
    // doc 1: (500+500+500)/3 = 500e6; doc 2: (500+300+300)/3 = 366666666
    // doc 3: (500+300+200)/3 = 333333333; doc 4: 200e6
    assert(out(1L) === ((3L, 500000000L)))
    assert(out(2L) === ((3L, 366666666L)))
    assert(out(3L) === ((3L, 333333333L)))
    assert(out(4L) === ((1L, 200000000L)))
  }

  test("unigramQuality ignores empty tokens from repeated separators") {
    val df = Seq((1L, "a  a"), (2L, "a")).toDF("doc_id", "text")
    val out = Curation.unigramQuality(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map { case (id, n, s) => id -> ((n, s)) }.toMap
    assert(out(1L) === ((2L, 1000000000L))) // all 3 instances are "a"
    assert(out(2L) === ((1L, 1000000000L)))
  }

  test("ccnetBuckets is monotone in score and covers every language") {
    val docs = (1L to 300L).map { i =>
      // score rises with i (more common filler per doc as i grows)
      val common = Seq.fill((i % 100).toInt + 1)("the")
      val rare = Seq(s"rare$i")
      (i, (common ++ rare).mkString(" "), if (i % 3 == 0) "de" else "en")
    }.toDF("doc_id", "text", "lang")
    val out = Curation.ccnetBuckets(docs, "doc_id", "text", "lang")
      .select("lang", "score_ppb", "bucket").as[(String, Long, String)].collect()
    val ranks = Map("tail" -> 0, "middle" -> 1, "head" -> 2)
    for (lang <- Seq("en", "de")) {
      val g = out.filter(_._1 == lang)
      assert(Set("tail", "middle", "head").subsetOf(g.map(_._3).toSet), lang)
      // bucket rank never decreases as score grows
      val sorted = g.sortBy(_._2).map(t => ranks(t._3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b }, lang)
      // thirds are approximate (bin-quantized) but each bucket holds
      // a substantial share
      val counts = g.groupBy(_._3).view.mapValues(_.size).toMap
      counts.values.foreach(n => assert(n > g.length / 6, s"$lang $counts"))
    }
  }

  test("ccnetBuckets keeps a degenerate single-bin language whole ('head'), never all-'tail'") {
    // a language whose docs all land in one histogram bin (here: one
    // single doc) has no worst third — labeling it 'tail' would make
    // the funnel's quality stage drop the entire language
    val docs = ((1L to 90L).map(i => (i, Seq.fill(5)("the").mkString(" ") + s" rare$i", "en"))
      :+ (91L, "solitary zulu document", "zu")).toDF("doc_id", "text", "lang")
    val out = Curation.ccnetBuckets(docs, "doc_id", "text", "lang")
      .select("lang", "bucket").as[(String, String)].collect()
    assert(out.filter(_._1 == "zu").map(_._2).toSeq === Seq("head"))
  }

  test("domainCap keeps at most k per domain, best-first, layout-stable") {
    val docs = (1L to 500L).map(i => (i, s"src${i % 7}", (i * 13 % 97).toInt))
      .toDF("doc_id", "source", "n_chars")
    val out = Curation.domainCap(docs, "doc_id", "source", "n_chars", 5)
    val rows = out.as[(Long, String, Int, Int)].collect()
    assert(rows.groupBy(_._2).forall(_._2.length <= 5))
    assert(rows.forall(_._4 <= 5))
    // kept set = the top-5 by (n_chars desc, doc_id) computed directly
    val expect = (1L to 500L).map(i => (i, s"src${i % 7}", (i * 13 % 97).toInt))
      .groupBy(_._2).flatMap { case (_, g) =>
        g.sortBy(t => (-t._3, t._1)).take(5)
      }.map(_._1).toSet
    assert(rows.map(_._1).toSet === expect)
    val again = Curation.domainCap(docs.repartition(11), "doc_id", "source", "n_chars", 5)
    assert(again.as[(Long, String, Int, Int)].collect().toSet === rows.toSet)
    intercept[IllegalArgumentException] {
      Curation.domainCap(docs, "doc_id", "source", "n_chars", 0)
    }
  }

  test("qualityWeightedSample always keeps a best doc, never a worst, and is a quality-biased subset") {
    val docs = (1L to 400L).map { i =>
      val common = Seq.fill((i % 40).toInt + 1)("the")
      (i, (common :+ s"rare$i").mkString(" "))
    }.toDF("doc_id", "text")
    val scored = Curation.unigramQuality(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map { case (id, _, s) => id -> s }.toMap
    val mx = scored.values.max
    val mn = scored.values.min
    val kept = Curation.qualityWeightedSample(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(scored.filter(_._2 == mx).keySet.subsetOf(kept))
    assert(scored.filter(_._2 == mn).keySet.intersect(kept).isEmpty)
    // kept mean score strictly above dropped mean score
    val (k, d) = scored.partition { case (id, _) => kept(id) }
    assert(k.values.sum.toDouble / k.size > d.values.sum.toDouble / d.size)
  }

  test("qualityWeightedSample keeps everything when all scores are equal") {
    val docs = Seq((1L, "a a"), (2L, "a a"), (3L, "a a")).toDF("doc_id", "text")
    assert(Curation.qualityWeightedSample(docs, "doc_id", "text").count() === 3L)
  }

  test("curationFunnel stages are sequential, monotone, and respect each rule") {
    val docs = (1L to 120L).map { i =>
      val common = Seq.fill((i % 30).toInt + 1)("the")
      val text = if (i <= 10) "dup dup dup" // 10 exact duplicates
                 else (common :+ s"r$i").mkString(" ")
      (i, text, if (i % 2 == 0) "en" else "de", s"src${i % 3}", text.length)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curation.curationFunnel(docs, "doc_id", "text", "lang", "source", "n_chars", 5)
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(t => (t._1, t._2)).toSeq ===
      Seq((0, "raw"), (1, "exact_dedup"), (2, "quality"), (3, "domain_cap")))
    // monotone shrinking docs and tokens
    assert(out.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
    assert(out.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
    // exact dedup collapses the 10 copies to 1: raw 120 -> 111
    assert(out(0)._3 === 120L && out(1)._3 === 111L)
    // domain cap: at most 5 per 3 sources survive
    assert(out(3)._3 <= 15L)
  }

  test("bigramScoreWithBackoff: exact arithmetic for seen, backed-off, and OOV pairs") {
    // reference bigrams: "a b"×2, "b c"×1 → tot=3; rel2(a b)=666666667,
    // rel2(b c)=333333333. reference unigrams: a×2 b×2 c×1 → tot=5.
    val ref = Seq((10L, "a b c"), (11L, "a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // both bigrams seen: (666666667+333333333)/2
      (2L, "c a"), // "c a" unseen, a known: rel1(a)=400000000 div 10
      (3L, "x y"), // fully OOV: 0
      (4L, "a")) // no bigrams: absent from output
      .toDF("doc_id", "text")
    val out = Curation.bigramScoreWithBackoff(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map { case (id, n, s) => id -> ((n, s)) }.toMap
    assert(out(1L) === ((2L, 500000000L)))
    assert(out(2L) === ((1L, 40000000L)))
    assert(out(3L) === ((1L, 0L)))
    assert(!out.contains(4L))
  }

  test("bigramScoreWithBackoff counts repeated bigrams with multiplicity") {
    val ref = Seq((10L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // pairs: (a b), (b a), (a b) → n=3; rel2(a b)=1e9 seen twice,
    // (b a) backs off to rel1(a)=5e8 div 10 → (2e9 + 5e7) div 3
    val out = Curation.bigramScoreWithBackoff(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 3L, 683333333L)))
  }
}
