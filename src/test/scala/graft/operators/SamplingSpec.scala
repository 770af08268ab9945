package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling invariants: layout-independence, split
  * disjointness/coverage, stratified rate behavior.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 2000L).map(i => (i, if (i % 4 == 0) "en" else "de")).toDF("id", "lang")

  test("bernoulli membership is identical across partition layouts") {
    val a = Sampling.bernoulli(docs, $"id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs.repartition(17), $"id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    // rate lands near 30% (hash uniformity; wide tolerance, no flakes)
    assert(a.size > 450 && a.size < 750, a.size)
  }

  test("a smaller rate selects a SUBSET of a larger rate (nested samples)") {
    val small = Sampling.bernoulli(docs, $"id", 0.1).select("id").as[Long].collect().toSet
    val large = Sampling.bernoulli(docs, $"id", 0.5).select("id").as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("split assigns every row exactly one label with disjoint hash ranges") {
    val out = Sampling.split(docs, $"id", Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
    assert(out.count() === 2000L)
    val byLabel = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.keySet === Set("train", "eval", "test"))
    assert(byLabel("train") > 1500L && byLabel("eval") < 300L && byLabel("test") < 300L)
    // re-running on shuffled data gives the identical assignment
    val again = Sampling.split(docs.repartition(7), $"id",
      Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
    assert(out.as[(Long, String, String)].collect().toSet ===
      again.as[(Long, String, String)].collect().toSet)
  }

  test("rates and fractions outside [0,1] are rejected, not silently mislabeled") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] { Sampling.bernoulli(df, col("id"), -0.1) }
    intercept[IllegalArgumentException] { Sampling.bernoulli(df, col("id"), 1.5) }
    intercept[IllegalArgumentException] {
      Sampling.stratified(df, col("id"), col("s"), Map("a" -> 2.0), 0.5)
    }
    intercept[IllegalArgumentException] {
      // sums to <= 1 but a negative fraction would corrupt the bounds
      Sampling.split(df, col("id"), Seq("train" -> 0.9, "bad" -> -0.2, "test" -> 0.3))
    }
  }

  test("stratified applies per-stratum rates and the default elsewhere") {
    val out = Sampling.stratified(docs, $"id", $"lang", Map("en" -> 0.0), defaultRate = 1.0)
    val langs = out.select("lang").distinct().as[String].collect().toSeq
    assert(langs === Seq("de")) // en rate 0 drops the whole stratum
    assert(out.count() === 1500L) // default 1.0 keeps every de row
  }

  test("balanceToMix keeps the binding source whole and downsamples toward targets") {
    // 1000 "web" rows, 100 "code" rows; targets 50/50 → code binds
    // (100/500 < 1000/500), kept whole; web keeps ~100 of 1000.
    val df = ((1L to 1000L).map(i => (i, "web")) ++ (2001L to 2100L).map(i => (i, "code")))
      .toDF("id", "src")
    val out = Sampling.balanceToMix(df, $"id", $"src", Map("web" -> 500, "code" -> 500))
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("code") === 100L) // binding source: threshold = Den, all kept
    // hash membership at rate 1000/10000 is approximately 100 rows
    assert(counts("web") > 60L && counts("web") < 140L, counts.toString)
    // unweighted sources drop entirely
    val extra = df.union(Seq((9999L, "junk")).toDF("id", "src"))
    val out2 = Sampling.balanceToMix(extra, $"id", $"src", Map("web" -> 500, "code" -> 500))
    assert(out2.filter($"src" === "junk").isEmpty)
    // determinism: membership survives an arbitrary repartition
    val again = Sampling.balanceToMix(df.repartition(7), $"id", $"src",
      Map("web" -> 500, "code" -> 500))
    assert(again.select("id").as[Long].collect().sorted.toSeq ===
      out.select("id").as[Long].collect().sorted.toSeq)
  }

  test("temperatureWeights flattens toward the tail: weights sum to 1, epochs = weight·total/n") {
    // a:9 rows, b:1 row → proportional shares would be 0.9/0.1; the
    // sqrt rule gives 3e6/1e6 micro-weights → 0.75/0.25 — head down,
    // tail up. Tail epochs 2.5 > 1: the trainer repeats source b.
    val docs = ((1 to 9).map(i => (i.toLong, "a")) :+ (10L, "b")).toDF("doc_id", "source")
    val out = Sampling.temperatureWeights(docs, $"source")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 9L, 0.75, 0.75 * 10 / 9)))
    assert(out("b") === (("b", 1L, 0.25, 2.5)))
    assert(out.values.map(_._3).sum === 1.0)
  }

  test("cluster-keyed split: no near-dup cluster ever spans two splits") {
    // the leakage guarantee of q_split_by_cluster — the split label is a
    // pure function of the cluster representative, so every member of a
    // cluster lands on the same side, for ANY cluster assignment
    val members = (1L to 300L).map(i => (i, i % 40)).toDF("doc_id", "component_id")
    val split = Sampling.split(members, $"component_id",
      Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
    val spanning = split.groupBy("component_id")
      .agg(countDistinct($"split").as("n_sides"))
      .filter($"n_sides" > 1)
    assert(spanning.count() === 0L)
    // and the split is a real partition of the corpus
    assert(split.count() === 300L)
    assert(split.select("split").distinct().count() >= 2L)
  }

  test("reservoirPerStratum draws exactly k per stratum, layout-independent") {
    val docs2 = (1L to 500L).map(i => (i, if (i % 5 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val a = Sampling.reservoirPerStratum(docs2, $"doc_id", $"lang", 20)
    val counts = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts === Map("en" -> 20L, "de" -> 20L))
    val b = Sampling.reservoirPerStratum(docs2.repartition(13), $"doc_id", $"lang", 20)
    assert(a.select("doc_id").as[Long].collect().toSet ===
      b.select("doc_id").as[Long].collect().toSet)
    // k above the stratum size keeps the whole stratum
    val all = Sampling.reservoirPerStratum(docs2, $"doc_id", $"lang", 1000)
    assert(all.count() === 500L)
  }

  test("mixTokenPlan allocates the budget by temperature weight and caps keep fraction") {
    val docs2 = Seq.tabulate(300)(i =>
      (i.toLong, if (i < 280) "web" else "books", "w " * 9 + "w")) // 10 tokens each
      .toDF("doc_id", "source", "text")
    val plan = Sampling.mixTokenPlan(docs2, $"source", $"text", budgetTokens = 3000L)
      .as[(String, Long, Long, Double, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (web, books) = (plan("web"), plan("books"))
    assert(web._3 === 2800L && books._3 === 200L)
    // sqrt temperature: weights ∝ sqrt(2800):sqrt(200) ≈ 0.789:0.211
    assert(math.abs(web._4 - 0.789) < 0.01 && math.abs(books._4 - 0.211) < 0.01)
    // allocations sum ~ budget (rounding each side)
    assert(math.abs(web._5 + books._5 - 3000L) <= 1L)
    // books is over-allocated relative to size: capped at 10000 bp,
    // epochs > 1; web keeps a fraction
    assert(books._6 === 10000L && books._7 > 1.0)
    assert(web._6 < 10000L && web._7 < 1.0)
  }
}
