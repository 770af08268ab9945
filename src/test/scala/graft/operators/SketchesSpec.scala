package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-state distinct sketch: deterministic, layout-independent,
  * and accurate enough to be worth its bounded buffer.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val bins = 4096
  // 1000 true distinct keys, each appearing 1-3 times
  private def rows = (1L to 1000L).flatMap(k => Seq.fill((k % 3).toInt + 1)(("g", k)))
    .toDF("g", "k")

  test("occupied is a pure function of the data — identical across partition layouts") {
    val a = Sketches.distinctSketch(rows, $"g", $"k", bins).collect().head
    val b = Sketches.distinctSketch(rows.repartition(13), $"g", $"k", bins).collect().head
    assert(a === b)
  }

  test("occupied is bounded by both the exact count and the bin count") {
    val r = Sketches.distinctSketch(rows, $"g", $"k", bins)
      .select("n_rows", "n_exact", "occupied").as[(Long, Long, Long)].collect().head
    val (nRows, exact, occ) = r
    assert(nRows === 2000L && exact === 1000L)
    assert(occ <= exact && occ <= bins.toLong && occ > 0L)
  }

  test("linear-counting estimate lands within ~10% at quarter occupancy") {
    val occ = Sketches.distinctSketch(rows, $"g", $"k", bins)
      .select("occupied").as[Long].collect().head
    val est = Sketches.estimate(occ, bins)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.10, s"occ=$occ est=$est")
  }

  test("estimate edge cases: empty is zero, saturation hits the ceiling, bad input throws") {
    assert(Sketches.estimate(0L, bins) === 0.0)
    assert(Sketches.estimate(bins.toLong, bins) === bins * math.log(bins.toDouble))
    intercept[IllegalArgumentException](Sketches.estimate(bins + 1L, bins))
    intercept[IllegalArgumentException](Sketches.estimate(-1L, bins))
  }

  // ---------------------------------------------------------------- count-min
  private def tokens(ws: String*) = ws.toDF("k")

  test("count-min never undercounts, and is exact without collisions") {
    // width 64 over 3 distinct keys: collisions vanishingly unlikely in
    // all 4 rows at once, but the INVARIANT asserted is one-sided error
    val keys = tokens(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"): _*)
    val est = Sketches.cmEstimates(keys, $"k", Seq("a", "b", "c", "absent"), width = 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    est.foreach { case (w, (cm, exact, over)) =>
      assert(cm >= exact && over === cm - exact, s"$w: cm=$cm exact=$exact")
    }
    assert(est("absent")._2 === 0L)
    assert(est("a")._1 === 5L && est("b")._1 === 3L && est("c")._1 === 1L)
  }

  test("count-min is linear: the sketch of a union is the element-wise sum of the sketches") {
    // THE mergeability property — partial sketches from partitions,
    // days or streams combine by plain addition, no rescan
    val a = tokens(Seq.fill(7)("x") ++ Seq.fill(2)("y"): _*)
    val b = tokens(Seq.fill(4)("y") ++ Seq.fill(3)("z"): _*)
    val w = 32
    val skA = Sketches.cmSketch(a, $"k", w).withColumnRenamed("cnt", "ca")
    val skB = Sketches.cmSketch(b, $"k", w).withColumnRenamed("cnt", "cb")
    val summed = skA.join(skB, Seq("r", "bucket"), "full_outer")
      .select($"r", $"bucket",
        (coalesce($"ca", lit(0L)) + coalesce($"cb", lit(0L))).as("cnt"))
    val whole = Sketches.cmSketch(a.unionByName(b), $"k", w)
    assert(rows(summed.orderBy("r", "bucket")) === rows(whole.orderBy("r", "bucket")))
  }

  test("count-min sketch is layout-independent and bounded at depth x width rows") {
    val keys = tokens((1 to 500).map(i => s"w${i % 97}"): _*)
    val w = 16
    val sk1 = Sketches.cmSketch(keys, $"k", w)
    val sk2 = Sketches.cmSketch(keys.repartition(7), $"k", w)
    assert(rows(sk1.orderBy("r", "bucket")) === rows(sk2.orderBy("r", "bucket")))
    assert(sk1.count() <= (Sketches.CmDepth * w).toLong)
  }

  test("HLL registers merge by element-wise MAX: two halves equal the whole") {
    val all = (1L to 4000L).map(k => ("g", k)).toDF("g", "k")
    val rA = Sketches.hllRegisters(all.filter($"k" <= 2000L), $"g", $"k")
      .withColumnRenamed("m_j", "ma")
    val rB = Sketches.hllRegisters(all.filter($"k" > 2000L), $"g", $"k")
      .withColumnRenamed("m_j", "mb")
    val merged = rA.join(rB, Seq("group_key", "bucket"), "full_outer")
      .select($"group_key", $"bucket",
        greatest(coalesce($"ma", lit(0L)), coalesce($"mb", lit(0L))).as("m_j"))
    val whole = Sketches.hllRegisters(all, $"g", $"k")
    assert(rows(merged.orderBy("bucket")) === rows(whole.orderBy("bucket")))
  }

  test("HLL estimate lands within the ~1.04/sqrt(m) error band (x3) on 4k distinct keys") {
    val all = (1L to 4000L).map(k => ("g", k)).toDF("g", "k")
    val (exact, nReg, est) = Sketches.hllEstimates(all, $"g", $"k")
      .select("n_exact", "n_registers", "hll_est")
      .as[(Long, Long, Double)].collect().head
    assert(exact === 4000L && nReg === Sketches.HllM.toLong)
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 3 * 1.04 / math.sqrt(Sketches.HllM), s"relErr $relErr (est $est)")
  }

  test("HLL is layout-independent, state-bounded at m registers, and corrected for small range") {
    val all = (1L to 4000L).map(k => ("g", k % 7)).toDF("g", "k") // 7 distinct
    val a = Sketches.hllEstimates(all, $"g", $"k").collect().head
    val b = Sketches.hllEstimates(all.repartition(11), $"g", $"k").collect().head
    assert(a === b)
    assert(Sketches.hllRegisters(all, $"g", $"k").count() <= Sketches.HllM.toLong)
    // 7 distinct keys: raw HLL overshoots down here; the linear-counting
    // patch brings it inside +-2
    val corrected = Sketches.hllCorrected(a.getDouble(3), a.getLong(2))
    assert(math.abs(corrected - 7.0) < 2.0, s"corrected $corrected")
  }

  test("bloom mask: no false negatives ever, false positives bounded at low occupancy") {
    val m = 1 << 12; val k = 4
    val members = (1 to 50).map(i => s"member gram number $i alpha")
    val mask = Sketches.bloomMask(members.toDF("g"), $"g", m, k)
    assert(mask.length === m / 64)
    // every member hits (one-sided error: misses are definitive)
    members.foreach { g =>
      val df = Seq(g).toDF("g")
      val hit = df.select(graft.functions.BloomCol.contains(
        graft.functions.Hashing.stableHash48($"g", 0),
        graft.functions.Hashing.stableHash48($"g", 1), mask, k, m).as("h")).head.getBoolean(0)
      assert(hit, s"false negative for '$g'")
    }
    // 50*4/4096 ≈ 5% occupancy → fp ≈ 0.05^4; 500 non-members should all miss
    val nonMembers = (1 to 500).map(i => s"novel gram number $i beta").toDF("g")
    val fps = nonMembers.select(graft.functions.BloomCol.contains(
      graft.functions.Hashing.stableHash48($"g", 0),
      graft.functions.Hashing.stableHash48($"g", 1), mask, k, m).as("h"))
      .filter($"h").count()
    assert(fps <= 2, s"$fps false positives out of 500 at ~5% occupancy")
  }

  test("bloomContamination counts gram hits per doc; a verbatim probe copy is fully flagged") {
    val probes = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "one two three four five six"), // verbatim copy: every 4-gram flagged
      (2L, "totally novel words nothing shared here at all"),
      (3L, "tiny")).toDF("doc_id", "text") // < 4 words: no grams, no row
    val out = Sketches.bloomContamination(corpus, "doc_id", "text", probes, "text",
      n = 4, m = 1 << 12, k = 4)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L))
    assert(out(0) === ((1L, 3L, 3L))) // 6 words → 3 distinct 4-grams, all flagged
    assert(out(1)._3 === 0L) // novel doc: zero flags (no false positives here)
  }

  test("heavyHitters misses no true heavy hitter and never undercounts (CM one-sided)") {
    // 10_000 tokens: 'hot' ×600 (6%), 'warm' ×120 (1.2%), the rest a
    // long tail of singletons. ppm=10_000 (1%) → threshold 100.
    val tokens = (Seq.fill(600)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 9280).map(i => s"tail$i")).toDF("k")
    val out = Sketches.heavyHitters(tokens, $"k", width = 512, ppm = 10000L)
      .as[(String, Long, Long, Long, Boolean)].collect()
    val byWord = out.map(r => r._1 -> r).toMap
    // no false negatives: both true hitters present, exact, flagged
    assert(byWord("hot") === (("hot", 600L, byWord("hot")._3, byWord("hot")._4, true)))
    assert(byWord("warm")._2 === 120L && byWord("warm")._5)
    // CM never undercounts: estimate >= exact for every candidate
    out.foreach { case (w, exact, est, over, _) =>
      assert(est >= exact && over === est - exact, s"undercount for $w")
    }
    // false candidates (collision strays) are visible but not heavy
    out.filter(r => r._1 != "hot" && r._1 != "warm").foreach(r => assert(!r._5, r.toString))
  }

  test("heavyHitters threshold floors at 2: singleton vocab never floods the candidate set") {
    // 100 distinct singletons, ppm=1e6 would give threshold 100·1/1e6=0
    // without the floor → every token a candidate; the floor keeps the
    // candidate set to tokens seen at least twice
    val tokens = ((1 to 100).map(i => s"w$i") ++ Seq("dup", "dup", "dup")).toDF("k")
    val out = Sketches.heavyHitters(tokens, $"k", width = 512, ppm = 1L)
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(out.exists(r => r._1 == "dup" && r._2 === 3L && r._5))
    // every surviving candidate owes its estimate to a real >=2 bucket,
    // and only 'dup' is truly heavy
    assert(out.filter(_._5).map(_._1).toSeq === Seq("dup"))
  }
}
