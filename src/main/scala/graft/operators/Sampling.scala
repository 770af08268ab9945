package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: resampling the same
  * data on a different cluster layout (or after a repartition) selects
  * DIFFERENT rows, which breaks experiment reproducibility and makes
  * train/eval splits impossible to audit. These operators decide row
  * membership from a stable hash of a KEY instead — the same row is
  * kept everywhere, any engine can reproduce the subset from the
  * formula (the DuckDB oracle does), and splits are disjoint by
  * construction. Pure column expressions: no shuffle, no RNG state,
  * fully pushdown-friendly.
  */
object Sampling {
  /** Membership denominator: rates quantize to 1/10000. */
  val Den = 10000L

  private def slot(keyCol: Column): Column =
    pmod(Hashing.stableHash60(keyCol.cast("string")), lit(Den))

  private def requireRate(r: Double, what: String): Unit =
    require(r >= 0.0 && r <= 1.0, s"$what must be in [0, 1], got $r")

  /** Keep rows whose hash slot falls below rate·Den. */
  def bernoulli(df: DataFrame, keyCol: Column, rate: Double): DataFrame = {
    requireRate(rate, "rate")
    df.filter(slot(keyCol) < math.round(rate * Den))
  }

  /** Per-stratum rates (e.g. language rebalancing: downsample the head
    * language, keep the tail): unlisted strata use `defaultRate`.
    */
  def stratified(df: DataFrame, keyCol: Column, stratumCol: Column,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    requireRate(defaultRate, "defaultRate")
    rates.foreach { case (k, v) => requireRate(v, s"rate for stratum '$k'") }
    val rateCol = rates.foldLeft(lit(math.round(defaultRate * Den))) {
      case (acc, (k, v)) => when(stratumCol === k, lit(math.round(v * Den))).otherwise(acc)
    }
    df.filter(slot(keyCol) < rateCol)
  }

  /** Rebalance a corpus to TARGET source proportions (the pretraining
    * "data mixture" op: e.g. 50% web / 25% books / 25% code) by
    * deterministic downsampling — never upsampling, so the output is
    * the largest subset achieving the mix: the BINDING source s* (the
    * one with the smallest n_s/w_s) is kept whole and every other
    * source keeps `w_s·n_{s*} / (w_{s*}·n_s)` of its rows.
    *
    * Two-phase and scale-shaped: one count aggregate (map-side
    * combined), a k-row collect (model state, like a centroid table),
    * then a pure hash-membership filter — no shuffle of the data, no
    * RNG, reproducible on any engine. Sources without a weight drop
    * (weight 0). Thresholds are INTEGER floor divisions of Den so both
    * engines quantize identically; the binding argmin compares n/w as
    * doubles, safe because IEEE division is correctly rounded (unlike
    * ln — see TextAnalysis.topTermsByTfDf). Overflow bound:
    * Den·w·n must fit a long — fine below ~10^12 rows per source at
    * weight scale 1000.
    */
  def balanceToMix(df: DataFrame, keyCol: Column, sourceCol: Column,
                   weights: Map[String, Int]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be positive")
    val counts = df.groupBy(sourceCol.as("_src")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty, "no weighted source present in the data")
    val (bindSrc, bindW) = present.minBy { case (s, w) => (counts(s).toDouble / w, s) }
    val bindN = counts(bindSrc)
    val threshes = present.toSeq.sortBy(_._1).map { case (s, w) =>
      s -> (Den * w * bindN) / (bindW.toLong * counts(s))
    }
    val threshCol = threshes.foldLeft(lit(-1L): Column) { case (acc, (s, t)) =>
      when(sourceCol === s, lit(t)).otherwise(acc)
    }
    df.filter(slot(keyCol) < threshCol)
  }

  /** Temperature-flattened mixture weights at τ = 2 (α = 1/2): the
    * multilingual/multi-source sampling rule w_s ∝ n_s^(1/2) that
    * upweights tail sources relative to proportional sampling without
    * letting the head dominate (the standard pick in multilingual
    * pretraining). Emits per source: n, the normalized sampling weight,
    * and `epochs` — how many passes over the source one corpus-sized
    * draw implies (the >1 values are the tail sources a trainer will
    * repeat, the oversampling-vs-repetition dial).
    *
    * Determinism across engines: n^(1/2) is `sqrt` (IEEE
    * correctly-rounded on both JVM and C, unlike `pow`/`ln` — the same
    * reasoning that made BM25 drop its log), and each weight is
    * quantized to integer micro-units BEFORE the normalizing sum so the
    * total is an order-free integer, never a reassociated double sum.
    * The totals side is ONE row by construction, met with a broadcast
    * cross join (a sanctioned k×1 nested loop, like the rule cascade's
    * default-rule row — not a global window, which would serialize).
    * Aggregation-shaped: two map-side-combined hash aggs over the
    * corpus, k output rows.
    */
  def temperatureWeights(df: DataFrame, sourceCol: Column): DataFrame = {
    val counts = df.groupBy(sourceCol.as("source")).agg(count(lit(1)).as("n"))
      .withColumn("_w_u", round(sqrt(col("n")) * 1e6).cast("long"))
    val totals = counts.agg(sum(col("_w_u")).as("_tot"), sum(col("n")).as("_n_tot"))
    counts.crossJoin(broadcast(totals))
      .withColumn("weight", col("_w_u").cast("double") / col("_tot"))
      .withColumn("epochs", col("weight") * col("_n_tot") / col("n"))
      .select("source", "n", "weight", "epochs")
  }

  /** Exact-k uniform sample per stratum ("1000 eval docs per
    * language"): rank rows by their stable key hash — a deterministic
    * uniform permutation — and keep the first `k` of each stratum.
    * [[bernoulli]] gives a BINOMIAL per-stratum count; evaluation sets
    * need exactly k, which forces a rank. The rank filter compiles to
    * WindowGroupLimit (per-task k-row heaps, no full sort), stratum
    * cardinality is the parallelism, and the hash order makes the
    * sample layout-independent and reproducible on any engine. Ties on
    * the 60-bit hash break by key.
    */
  def reservoirPerStratum(df: DataFrame, keyCol: Column, stratumCol: Column,
                          k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val slot = Hashing.stableHash60(keyCol.cast("string"))
    df.withColumn("rk", row_number().over(
        Window.partitionBy(stratumCol).orderBy(slot, keyCol)))
      .filter(col("rk") <= k)
  }

  /** Token-budget mixture plan: the actionable step after
    * [[temperatureWeights]] — given a token budget, how many tokens to
    * draw from each source, what hash-filter keep-fraction that
    * implies, and how many epochs of the source one budget-sized draw
    * costs. Weights are τ=2 temperature over TOKEN counts (not doc
    * counts — sources with long documents weigh accordingly).
    * `keep_frac_bp` saturates at 10000 basis points: a source whose
    * allocation exceeds its size is kept whole and repeats
    * (`epochs` > 1 is the repeat dial). Two map-side-combined
    * aggregates + a 1-row broadcast total; every output is integer
    * arithmetic or a single chain of correctly-rounded IEEE double
    * ops, so it hash-gates cross-engine.
    *
    * Output: source, n_docs, n_tokens, weight, alloc_tokens,
    * keep_frac_bp, epochs.
    */
  def mixTokenPlan(docs: DataFrame, sourceCol: Column, textCol: Column,
                   budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    // same token definition as every Curation operator (empty tokens
    // from repeated separators excluded) — the plan's n_tokens must
    // agree with curationFunnel's for the same corpus
    val counts = docs.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(Hashing.words(textCol), w => length(w) > 0))).as("n_tokens"))
      .withColumn("_w_u", round(sqrt(col("n_tokens")) * 1e6).cast("long"))
    val tot = counts.agg(sum(col("_w_u")).as("_tw"))
    counts.crossJoin(broadcast(tot))
      .withColumn("weight", col("_w_u").cast("double") / col("_tw"))
      .withColumn("alloc_tokens",
        round(lit(budgetTokens.toDouble) * col("weight")).cast("long"))
      // an all-empty source has n_tokens = 0: nothing to keep (and the
      // integer div would raise under ANSI)
      .withColumn("keep_frac_bp",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(least(lit(10000L), expr("alloc_tokens * 10000 div n_tokens"))))
      .withColumn("epochs",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("alloc_tokens").cast("double") / col("n_tokens")))
      .select("source", "n_docs", "n_tokens", "weight", "alloc_tokens",
        "keep_frac_bp", "epochs")
  }

  /** Disjoint train/eval/test split by hash range: fractions of Den,
    * in order, must sum to <= Den. Every row lands in exactly one split
    * (the remainder slot gets the last label) — auditable and stable
    * under any repartitioning.
    */
  def split(df: DataFrame, keyCol: Column, bounds: Seq[(String, Double)]): DataFrame = {
    require(bounds.nonEmpty && bounds.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to <= 1")
    // a negative fraction would pass the sum check but produce
    // non-monotone cumulative bounds and silently mislabel rows
    bounds.foreach { case (label, f) => requireRate(f, s"fraction for split '$label'") }
    require(bounds.map(_._1).distinct.size == bounds.size, "split labels must be distinct")
    val cum = bounds.scanLeft(0L) { case (acc, (_, f)) => acc + math.round(f * Den) }.tail
    val s = slot(keyCol)
    val labeled = bounds.zip(cum).foldRight(lit(bounds.last._1): Column) {
      case (((label, _), bound), acc) => when(s < bound, lit(label)).otherwise(acc)
    }
    df.withColumn("split", labeled)
  }
}
