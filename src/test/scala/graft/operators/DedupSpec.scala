package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Dedup operator edge cases the DuckDB oracle can't see: empty shingle
  * sets, the document-frequency cap's pruned-universe consistency,
  * identical-document invariants across all four dedup families.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private val wordsA = (1 to 20).map(i => s"w$i").mkString(" ")
  private val wordsB = (1 to 20).map(i => s"w$i").mkString(" ") + " extra tail words here now"
  private val other = (1 to 20).map(i => s"z$i").mkString(" ")

  test("exactGroups groups identical texts and keeps the min doc id as canonical") {
    val out = Dedup.exactGroups(docs((3L, "same"), (1L, "same"), (2L, "diff")), "doc_id", "text")
      .select("n_docs", "canonical_id").as[(Long, Long)].collect().toSet
    assert(out === Set((2L, 1L), (1L, 2L)))
  }

  test("docs shorter than n words produce no shingles, no signature rows, no pairs") {
    val d = docs((1L, "too short"), (2L, "also tiny"))
    assert(Dedup.docShingleHashes(d, "doc_id", "text", 5).count() === 0L)
    assert(Dedup.withMinhashSignature(d, "doc_id", "text", 5).count() === 0L)
    assert(Dedup.minhashLshPairs(d, "doc_id", "text", 5, 0.5).count() === 0L)
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.5).count() === 0L)
  }

  test("identical documents: jaccard 1.0 via ngram, minhash-LSH and hamming 0 via simhash") {
    val d = docs((1L, wordsA), (2L, wordsA), (3L, other))
    val ng = Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(ng.toSeq === Seq((1L, 2L, 1.0)))
    val mh = Dedup.minhashLshPairs(d, "doc_id", "text", 5, 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(mh.toSeq === Seq((1L, 2L, 1.0)))
    val sh = Dedup.simhashPairs(d, "doc_id", "text", 5)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(sh.toSeq === Seq((1L, 2L, 0)))
  }

  test("near-duplicates score below 1.0 but above the threshold") {
    val d = docs((1L, wordsA), (2L, wordsB))
    val ng = Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.5)
      .select("jaccard").as[Double].collect()
    assert(ng.length === 1 && ng.head > 0.5 && ng.head < 1.0)
  }

  test("maxShingleDf prunes stop-shingles consistently: sizes use the pruned universe") {
    // Both docs share every shingle (df=2 > cap=1): the pruned universe is
    // empty, so NO pair survives — rather than an inconsistent 0-of-full-size
    // jaccard. With the cap off they are exact dups (jaccard 1.0).
    val d = docs((1L, wordsA), (2L, wordsA))
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.0, maxShingleDf = Some(1)).count() === 0L)
    val unc = Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.0, maxShingleDf = None)
      .select("jaccard").as[Double].collect()
    assert(unc.toSeq === Seq(1.0))
  }

  test("minhash signature is one row of MinhashK mins per doc with content") {
    val d = docs((1L, wordsA), (2L, other))
    val sig = Dedup.withMinhashSignature(d, "doc_id", "text", 5)
    assert(sig.columns.length === 1 + graft.functions.Hashing.MinhashK)
    assert(sig.count() === 2L)
  }

  test("duplicateClusters: chains collapse to min-id components, singletons label themselves") {
    val docsDf = docs((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f"))
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val comp = Dedup.duplicateClusters(docsDf, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("duplicateClusters converges on a long chain (diameter > 2)") {
    val n = 12L
    val docsDf = docs((1L to n).map(i => (i, s"t$i")): _*)
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.duplicateClusters(docsDf, "doc_id", pairs)
      .as[(Long, Long)].collect()
    assert(comp.forall(_._2 == 1L))
  }

  test("duplicateClusters collapses a diameter-500 chain in O(log n) rounds") {
    // the naive min-propagation loop needs one round per hop (500 here,
    // far past any sane budget); star contraction must land it in ≤ 12
    val n = 501L
    val docsDf = docs((1L to n).map(i => (i, s"t$i")): _*)
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.duplicateClusters(docsDf, "doc_id", pairs, maxIter = 12)
      .as[(Long, Long)].collect()
    assert(comp.length === n)
    assert(comp.forall(_._2 == 1L))
  }

  test("duplicateClusters refuses to return partial labels when maxIter is too small") {
    // a 500-hop chain cannot fully contract in 1 round even for star
    // contraction; silently returning the intermediate edge set would
    // split the component — the operator must throw instead.
    val n = 501L
    val docsDf = docs((1L to n).map(i => (i, s"t$i")): _*)
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ex = intercept[IllegalStateException] {
      Dedup.duplicateClusters(docsDf, "doc_id", pairs, maxIter = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("simhash pair search respects the pigeonhole precondition") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs((1L, wordsA)), "doc_id", "text", maxHamming = 6, chunks = 6)
    }
  }

  // A few hundred distinct docs: enough to distinguish 12-bit banding
  // (4096 bucket values) from the old 8-bit one (256) without slowing
  // the suite down.
  private lazy val corpus: DataFrame =
    docs((1L to 600L).map(i => (i, (1 to 30).map(j => s"d${i}_w$j").mkString(" "))): _*)

  test("simhash banding is lossless vs brute-force hamming at maxHamming = chunks-1") {
    import org.apache.spark.sql.functions._
    val d = docs((1L, wordsA), (2L, wordsA), (3L, wordsB), (4L, other),
      (5L, wordsA + " x"), (6L, other + " y"))
    val banded = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 7)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val sims = Dedup.withSimhash(d, "doc_id", "text")
    val brute = sims.as("a").join(sims.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("bit_count(a.sim_lo ^ b.sim_lo) + bit_count(a.sim_hi ^ b.sim_hi)").as("h"))
      .filter(col("h") <= 7).as[(Long, Long, Int)].collect().toSet
    assert(banded === brute)
    assert(brute.nonEmpty) // the fixture must actually exercise the path
  }

  test("12-bit chunk banding bounds bucket population (the 100x-scale knob)") {
    import org.apache.spark.sql.functions._
    val bands = Dedup.simhashBands(Dedup.withSimhash(corpus, "doc_id", "text"), chunks = 8)
    val buckets = bands.groupBy("chunk_idx", "chunk_val").count()
    // 600 docs over 4096 bucket values: the largest bucket stays tiny.
    // Under the old 8-bit banding (256 values) buckets averaged 2.3 with
    // a much fatter tail; 16 is a loose ceiling that 8-bit banding of a
    // corpus this size would still be unlikely to breach — the sharp
    // evidence of width is the distinct-value count below.
    val maxBucket = buckets.agg(max("count")).as[Long].head()
    assert(maxBucket <= 16L, s"largest band bucket holds $maxBucket docs")
    // >256 distinct chunk values observed for a single chunk index is
    // impossible with 8-bit chunks: proves the banding really is 12-bit.
    val maxDistinct = bands.groupBy("chunk_idx")
      .agg(countDistinct("chunk_val").as("n")).agg(max("n")).as[Long].head()
    assert(maxDistinct > 256L, s"only $maxDistinct distinct chunk values — banding narrower than expected")
  }

  test("containment catches a short doc quoted inside a long one that Jaccard misses") {
    // doc 1 is pasted whole into doc 2's longer text: containment(1→2)
    // is exactly 1.0 while Jaccard sits at |A|/|B| — below any dedup
    // threshold. That asymmetry is the operator's reason to exist.
    val quoted = (1 to 8).map(i => s"q$i").mkString(" ")
    val host = quoted + " " + (1 to 20).map(i => s"h$i").mkString(" ")
    val d = docs((1L, quoted), (2L, host), (3L, other))
    val pairs = Dedup.containmentPairs(d, "doc_id", "text", 5, 0.8, maxShingleDf = None)
      .collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert((p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b")) === ((1L, 2L)))
    assert(p.getAs[Double]("cont_a_in_b") === 1.0)
    assert(p.getAs[Double]("cont_b_in_a") < 0.8)
    // and the symmetric sweep at the same bar really does miss it
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.8, None).isEmpty)
  }

  test("novelty: first owner of every gram scores 1.0, a verbatim repeat scores 0.0") {
    val out = Dedup.noveltyProfile(
      docs((1L, wordsA), (2L, wordsA), (3L, other)), "doc_id", "text", 5)
      .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 1.0, 2L -> 0.0, 3L -> 1.0))
  }

  test("incremental dedup pairs the delta against the frozen corpus only — never within either side") {
    // new 1 duplicates old 2; new 3 duplicates new 1 (delta-internal);
    // old 4 duplicates old 2 (corpus-internal). Only (1, 2) and (3, 2)
    // may appear: delta x corpus, nothing else.
    val newDocs = docs((1L, wordsA), (3L, wordsA), (5L, other))
    val oldDocs = docs((2L, wordsA), (4L, wordsA))
    val pairs = Dedup.incrementalNearDups(newDocs, oldDocs, "doc_id", "text", 5, 0.5,
      maxShingleDf = None)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 4L), (3L, 2L), (3L, 4L)))
  }

  test("incremental dedup prunes stop-grams by the FROZEN side's document frequency") {
    // a gram in every old doc (df 3 > cap 2) must not create pairs on
    // its own; the new doc shares ONLY stop-grams with the corpus
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val oldDocs = docs((2L, boiler + " x1 x2 x3 x4 x5"), (4L, boiler + " y1 y2 y3 y4 y5"),
      (6L, boiler + " z1 z2 z3 z4 z5"))
    val newDocs = docs((1L, boiler))
    val pairs = Dedup.incrementalNearDups(newDocs, oldDocs, "doc_id", "text", 5, 0.1,
      maxShingleDf = Some(2))
    assert(pairs.isEmpty)
  }

  test("repeatedSpans merges consecutive shared positions into one island with 0-based start") {
    // docs 1 and 2 share words 5..12 (an 8-word passage → 5 consecutive
    // 4-gram positions starting at index 5); everything else is unique,
    // so each doc reports exactly one island of span_words 8
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val d = docs(
      (1L, (1 to 5).map(i => s"a$i").mkString(" ") + " " + shared + " a99"),
      (2L, (1 to 5).map(i => s"b$i").mkString(" ") + " " + shared + " b99"))
    val out = Dedup.repeatedSpans(d, "doc_id", "text", 4, minDf = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 5L, 8L), (2L, 5L, 8L)))
  }

  test("repeatedSpans at a high minDf ignores passages shared by too few docs") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val d = docs((1L, shared + " x1 x2 x3 x4"), (2L, shared + " y1 y2 y3 y4"))
    assert(Dedup.repeatedSpans(d, "doc_id", "text", 4, minDf = 3).isEmpty)
  }

  test("yieldReport slices duplicate docs and bytes by cluster size") {
    import org.apache.spark.sql.functions.length
    // cluster {1,2,3} (label 1), cluster {4,5} (label 4), singleton 6
    val d = Seq(
      (1L, "aaaa"), (2L, "bbb"), (3L, "cc"),
      (4L, "ddddd"), (5L, "e"),
      (6L, "ffffff")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
      .toDF("doc_id", "component_id")
    val out = Dedup.yieldReport(d, "doc_id", "text", clusters)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // dup_bytes = lengths of the NON-representative members only
    assert(out(3L) === ((3L, 1L, 2L, 5L))) // docs 2+3: 3+2 chars
    assert(out(2L) === ((2L, 1L, 1L, 1L))) // doc 5: 1 char
    assert(out(1L) === ((1L, 1L, 0L, 0L)))
  }

  test("containment of identical docs is 1.0 in both directions") {
    val p = Dedup.containmentPairs(docs((1L, wordsA), (2L, wordsA)), "doc_id", "text", 5, 0.8,
      maxShingleDf = None).collect().head
    assert(p.getAs[Double]("cont_a_in_b") === 1.0)
    assert(p.getAs[Double]("cont_b_in_a") === 1.0)
  }

  test("sourceOverlap measures source-set Jaccard, not per-document duplication") {
    import spark.implicits._
    val phrase = (1 to 6).map(i => s"p$i").mkString(" ") // 2 distinct 5-grams
    val other = (1 to 6).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      // srcA carries the phrase in MANY docs — source-level distinct
      // collapses them to one set
      ("srcA", phrase), ("srcA", phrase), ("srcA", phrase),
      ("srcB", phrase), // mirrors srcA exactly
      ("srcC", other)) // disjoint
      .toDF("source", "text")
    val out = Dedup.sourceOverlap(docs, "source", "text", 5)
      .as[(String, String, Long, Long, Long, Double)].collect()
    // only (srcA, srcB) overlap; identical sets → jaccard 1.0 even
    // though srcA has 3× the documents
    assert(out.toSeq === Seq(("srcA", "srcB", 2L, 2L, 2L, 1.0)))
  }

  test("sourceOverlap maxSourceDf drops shingles present in too many sources") {
    import spark.implicits._
    val boiler = (1 to 5).map(i => s"b$i").mkString(" ") // 1 shared 5-gram
    val docs = Seq(
      ("s1", boiler + " u1 u2 u3 u4"), ("s2", boiler + " v1 v2 v3 v4"),
      ("s3", boiler + " w1 w2 w3 w4"))
      .toDF("source", "text")
    // the boilerplate gram sits in all 3 sources; cap 2 removes it and
    // the unique tails share nothing → no pairs survive
    assert(Dedup.sourceOverlap(docs, "source", "text", 5, Some(2)).count() === 0L)
    // uncapped, every pair intersects on exactly the boilerplate gram
    assert(Dedup.sourceOverlap(docs, "source", "text", 5).count() === 3L)
  }
}
