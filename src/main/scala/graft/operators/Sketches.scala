package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-state cardinality sketching — the distinct-count twin of
  * [[HistogramQuantiles]]: exact `count(DISTINCT key)` holds every
  * distinct key in the aggregation state, which for a hot group at
  * 100 TB is the same unbounded-buffer trap as `percentile`. The
  * linear-counting sketch caps state at `bins` slots per group:
  *
  *   occupied = count(DISTINCT stable_hash(key) mod bins)
  *
  * One Expand + two hash aggregates (Spark's distinct-agg rewrite), at
  * most `bins` distinct slot values per group anywhere in the plan,
  * fully mergeable across partitions (slot sets union), and — unlike
  * HLL sketches — DETERMINISTIC as a pure function of the shared
  * 60-bit hash, so an independent engine reproduces the integer
  * exactly and the DuckDB oracle can hash-gate it.
  *
  * The occupied count IS the sketch. Consumers wanting the classic
  * linear-counting estimate apply `-bins·ln(1 - occupied/bins)`
  * driver-side ([[estimate]]); the ln stays OUT of gated columns
  * because it is not correctly rounded across engines
  * (PERF.md / Sampling scaladoc rule). Relative error ~1/sqrt(bins)
  * while occupied ≪ bins; saturation (occupied → bins) means "more
  * distinct keys than bins" — size bins to the cardinality ceiling you
  * care to resolve, the way the histogram grid is sized to the value
  * range.
  */
object Sketches {
  /** Per-group row count, EXACT distinct (the unbounded baseline, for
    * small-cardinality columns only) and the bounded `occupied` slot
    * count over `bins`.
    */
  def distinctSketch(df: DataFrame, groupCol: Column, keyCol: Column,
                     bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    df.groupBy(groupCol.as("group_key"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(keyCol).as("n_exact"),
        countDistinct(pmod(Hashing.stableHash60(keyCol.cast("string")), lit(bins.toLong)))
          .as("occupied"))
  }

  /** DuckDB twin over the same hash and modulus. */
  def distinctSketchSql(table: String, groupExpr: String, keyExpr: String,
                        bins: Int): String =
    s"""SELECT $groupExpr AS group_key, count(*) AS n_rows,
       |       count(DISTINCT $keyExpr) AS n_exact,
       |       count(DISTINCT ${Hashing.stableHash60Sql(s"CAST($keyExpr AS VARCHAR)")} % $bins) AS occupied
       |FROM $table GROUP BY 1""".stripMargin

  /** Driver-side linear-counting estimate from an occupied-slot count.
    * Exact while every key got its own slot; NaN-free: a saturated
    * sketch returns the (infinite-cardinality) bins·ln(bins) ceiling.
    */
  def estimate(occupied: Long, bins: Int): Double = {
    require(bins > 0 && occupied >= 0 && occupied <= bins,
      s"need 0 <= occupied <= bins, got occupied=$occupied bins=$bins")
    if (occupied == bins) bins * math.log(bins.toDouble)
    else -bins * math.log1p(-occupied.toDouble / bins)
  }

  // ------------------------------------------------------------------ HLL
  /** HyperLogLog registers and estimate (Flajolet et al. 2007) — the
    * LARGE-cardinality companion to linear counting above: state is
    * `HllM` registers per group no matter the cardinality, with ~1.04/
    * sqrt(m) relative error, and registers merge across partitions,
    * days, or streams by element-wise MAX.
    *
    * The scaladoc above says classic HLL isn't hash-gateable — that is
    * true of float harmonic sums and log-based corrections, and this
    * implementation is built to dodge exactly those: (a) the register
    * table is a pure max over `rho(key)` — order-free integers from
    * the shared 60-bit hash, so registers are bit-reproducible on any
    * engine; (b) rho uses the BIT LENGTH of the hash remainder
    * (`length(bin(v))` — both engines have `bin`), never `log2`;
    * (c) the harmonic sum Σ 2^(−M_j) is scaled by 2^55 into an exact
    * integer (shifts, not pow), summed order-free, and divided into a
    * single driver-computed double constant α·m²·2^55 — one correctly-
    * rounded division, identical bits on both engines. The small-range
    * linear-counting correction needs `ln`, so it stays driver-side in
    * [[hllCorrected]] (same rule as [[estimate]]).
    */
  val HllB = 6
  val HllM: Int = 1 << HllB // 64 registers
  /** stableHash60 yields 60 bits; b go to the bucket, 54 remain. */
  private val HllVBits = 60 - HllB
  /** α_m · m² · 2^(HllVBits+1), driver-computed once; emitted into the
    * SQL twin via Double.toString (shortest-roundtrip, so both engines
    * parse the identical double).
    */
  val HllAlphaNum: Double =
    0.7213 / (1 + 1.079 / HllM) * HllM * HllM * math.pow(2.0, HllVBits + 1).toLong

  /** Per-group HLL register table: (group_key, bucket, m_j) with at
    * most `HllM` rows per group. m_j ∈ [1, 55]: position of the highest
    * set bit counted from the top of the 54-bit remainder, +1; an
    * all-zero remainder saturates at 55.
    */
  def hllRegisters(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame = {
    val h = Hashing.stableHash60(keyCol.cast("string"))
    val bucket = pmod(h, lit(HllM.toLong))
    val v = shiftrightunsigned(h, HllB)
    val rho = when(v === 0L, lit(HllVBits + 1))
      .otherwise(lit(HllVBits + 1) - length(bin(v)))
    df.groupBy(groupCol.as("group_key"), bucket.as("bucket"))
      .agg(max(rho).cast("long").as("m_j"))
  }

  /** Per-group raw HLL estimate next to the exact distinct count (the
    * diagnostic pair, like [[cmEstimates]]' overcount). `hll_est` is
    * the UNCORRECTED estimator — biased high below ~2.5·m distinct
    * keys; apply [[hllCorrected]] driver-side for the classic
    * small-range patch.
    */
  def hllEstimates(df: DataFrame, groupCol: Column, keyCol: Column): DataFrame = {
    val regs = hllRegisters(df, groupCol, keyCol)
      .withColumn("_term", expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${HllVBits + 1} - m_j AS INT))"))
      .groupBy("group_key")
      .agg(count(lit(1)).as("n_registers"), sum(col("_term")).as("_s_present"))
    val empty = lit(1L << (HllVBits + 1))
    val exact = df.groupBy(groupCol.as("group_key"))
      .agg(countDistinct(keyCol).as("n_exact"))
    exact.join(regs, Seq("group_key"))
      .withColumn("hll_est",
        lit(HllAlphaNum) /
          (col("_s_present") + (lit(HllM.toLong) - col("n_registers")) * empty).cast("double"))
      .select("group_key", "n_exact", "n_registers", "hll_est")
  }

  /** DuckDB twin: same hash, same bit-length rho, same integer-scaled
    * harmonic sum, same single division.
    */
  def hllEstimatesSql(table: String, groupExpr: String, keyExpr: String): String = {
    val h = Hashing.stableHash60Sql(s"CAST($keyExpr AS VARCHAR)")
    val vb = HllVBits + 1
    s"""WITH hh AS (SELECT $groupExpr AS group_key, $h AS h FROM $table),
       |r AS (SELECT group_key, h % ${HllM} AS bucket,
       |             CAST(max(CASE WHEN h // ${HllM} = 0 THEN $vb
       |                           ELSE $vb - length(bin(h // ${HllM})) END) AS BIGINT) AS m_j
       |      FROM hh GROUP BY 1, 2),
       |s AS (SELECT group_key, count(*) AS n_registers,
       |             CAST(sum(CAST(1 AS BIGINT) << CAST($vb - m_j AS INTEGER)) AS BIGINT) AS s_present
       |      FROM r GROUP BY 1),
       |ex AS (SELECT $groupExpr AS group_key, count(DISTINCT $keyExpr) AS n_exact
       |       FROM $table GROUP BY 1)
       |SELECT ex.group_key, n_exact, n_registers,
       |       ${HllAlphaNum} /
       |         CAST(s_present + (${HllM} - n_registers) * (CAST(1 AS BIGINT) << $vb) AS DOUBLE) AS hll_est
       |FROM ex JOIN s USING (group_key)""".stripMargin
  }

  /** Driver-side corrected estimate: below 2.5·m with empty registers,
    * fall back to linear counting over the register occupancy (the
    * `ln` stays out of gated columns, as with [[estimate]]).
    */
  def hllCorrected(rawEst: Double, nRegisters: Long): Double =
    if (rawEst <= 2.5 * HllM && nRegisters < HllM)
      HllM * math.log(HllM.toDouble / (HllM - nRegisters))
    else rawEst

  // ------------------------------------------------------------------ count-min
  /** Count-Min frequency sketch (Cormode & Muthukrishnan 2005): a
    * depth×width integer counter matrix; key k increments counter
    * (r, h_r(k)) for each of `depth` independent hash rows, and a
    * point estimate is the MIN over its `depth` counters — always
    * ≥ the true count (collisions only ever add), within εN of it
    * with high probability at width ~e/ε.
    *
    * Why it belongs here: the sketch is LINEAR — counters are plain
    * sums — so it is partition-order-independent (deterministic given
    * the shared md5 hash, hence hash-gateable, unlike HLL) and merges
    * across partitions, days, or streams by element-wise ADDITION:
    * the frequency twin of the linear-counting cardinality sketch
    * above. State is bounded at depth×width counters no matter the
    * vocabulary — the "count words without holding the vocabulary"
    * shape a 100 TB corpus needs where exact (word, count) state is
    * itself a shuffle of vocabulary size.
    */
  val CmDepth = 4

  /** Bucket of `key` in hash row `r` — shared by sketch build and
    * probe lookup, and mirrored exactly in the SQL twin.
    */
  def cmBucket(key: Column, r: Int, width: Int): Column =
    pmod(Hashing.stableHash60(concat(lit(s"cm${r}_"), key)), lit(width.toLong))

  def cmBucketSql(keyExpr: String, r: Int, width: Int): String =
    s"${Hashing.stableHash60Sql(s"'cm${r}_' || $keyExpr")} % $width"

  /** The sketch itself: (r, bucket, cnt) counter rows — at most
    * depth×width of them, built by one posexplode + one map-side-
    * combined hash agg over the keyed input.
    */
  def cmSketch(keys: DataFrame, keyCol: Column, width: Int,
               depth: Int = CmDepth): DataFrame = {
    require(width > 0 && depth > 0, s"need positive width/depth, got $width x $depth")
    keys.select(posexplode(array((0 until depth).map(r => cmBucket(keyCol, r, width)): _*))
        .as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  // ------------------------------------------------------------------
  // Bloom filter: broadcast-bitmask membership triage
  // ------------------------------------------------------------------

  /** Build the m-bit Bloom mask over a column's values: each value
    * sets k positions via Kirsch-Mitzenmacher double hashing on the
    * two 48-bit md5 slices. The distinct position set is bounded by m
    * (a CONFIG constant — 2^16 bits = 8 KiB default in the queries),
    * so the driver-side fold is model state, same class as k×dim
    * centroids.
    */
  def bloomMask(df: DataFrame, c: Column, m: Int, k: Int): Array[Long] = {
    require(m > 0 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
    require(k > 0, s"k must be positive, got $k")
    val hashed = df.select(Hashing.stableHash48(c, 0).as("_h1"), Hashing.stableHash48(c, 1).as("_h2"))
    val pos = hashed.select(explode(array((0 until k).map(i =>
        (col("_h1") + lit(i.toLong) * col("_h2")) % lit(m.toLong)): _*)).as("p"))
      .distinct()
    graft.functions.Bloom.maskOf(pos.collect().iterator.map(_.getLong(0)), m)
  }

  /** Decontamination triage via a broadcast Bloom mask
    * ([[graft.functions.Bloom]] for the full scale rationale): flag
    * each corpus doc by how many of its distinct word n-grams hit the
    * probe set's mask. A miss is definitive (truly novel gram); a hit
    * is "maybe contaminated" with the classic one-sided false-positive
    * rate — the exact shingle join (`Dedup.contaminationPairs`) then
    * runs over the flagged sliver only. No corpus shuffle against the
    * probe side anywhere: the corpus side is one aggregation over its
    * own grams with k bit probes per gram.
    *
    * Output: `doc_id, n_grams, n_flagged` (distinct grams; integer
    * counts — decisions AND counts hash-gate cross-engine).
    */
  def bloomContamination(corpus: DataFrame, idCol: String, textCol: String,
                         probes: DataFrame, probeTextCol: String,
                         n: Int, m: Int, k: Int): DataFrame = {
    val probeGrams = probes
      .select(Hashing.words(col(probeTextCol)).as("_w"))
      .select(explode(Hashing.shinglesFromWords(col("_w"), n)).as("g"))
    val mask = bloomMask(probeGrams, col("g"), m, k)
    corpus
      .select(col(idCol).as("doc_id"), Hashing.words(col(textCol)).as("_w"))
      .select(col("doc_id"), explode(Hashing.shinglesFromWords(col("_w"), n)).as("g"))
      .select(col("doc_id"),
        graft.functions.BloomCol.contains(
          Hashing.stableHash48(col("g"), 0), Hashing.stableHash48(col("g"), 1),
          mask, k, m).as("_hit"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_hit"), 1L).otherwise(0L)).as("n_flagged"))
  }

  /** DuckDB twin: the probe position set as a CTE, each corpus gram
    * flagged iff all k of its positions are present — the same
    * decisions the mask makes, expressed relationally.
    */
  def bloomContaminationSql(corpusFilter: String, probeFilter: String,
                            n: Int, m: Int, k: Int): String =
    s"""WITH pw AS (SELECT ${Hashing.wordsSql("text")} AS w
       |            FROM documents WHERE $probeFilter),
       |pg AS (SELECT DISTINCT unnest(${Hashing.shinglesSql("w", n)}) AS g FROM pw),
       |ph AS (SELECT ${Hashing.stableHash48Sql("g", 0)} AS h1,
       |              ${Hashing.stableHash48Sql("g", 1)} AS h2 FROM pg),
       |pp AS (SELECT DISTINCT (h1 + i * h2) % $m AS p
       |       FROM ph, (SELECT unnest(range(0, $k)) AS i)),
       |cw AS (SELECT doc_id, ${Hashing.wordsSql("text")} AS w
       |       FROM documents WHERE $corpusFilter),
       |cg AS (SELECT doc_id, unnest(${Hashing.shinglesSql("w", n)}) AS g FROM cw),
       |ch AS (SELECT doc_id, g, ${Hashing.stableHash48Sql("g", 0)} AS h1,
       |              ${Hashing.stableHash48Sql("g", 1)} AS h2 FROM cg),
       |hits AS (SELECT doc_id, g
       |         FROM (SELECT doc_id, g, (h1 + i * h2) % $m AS p
       |               FROM ch, (SELECT unnest(range(0, $k)) AS i)) probes
       |         JOIN pp USING (p)
       |         GROUP BY doc_id, g HAVING count(*) = $k)
       |SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(count(hits.g) AS BIGINT) AS n_flagged
       |FROM cg LEFT JOIN hits ON cg.doc_id = hits.doc_id AND cg.g = hits.g
       |GROUP BY 1""".stripMargin

  /** Point estimates for a fixed probe list, alongside exact counts
    * (for the gate/diagnostics): `cm_est = min_r cnt(r, h_r(probe))`,
    * absent buckets counting 0. `overcount = cm_est - n_exact` is
    * provably ≥ 0 — the one-sided error CM trades for bounded state.
    */
  def cmEstimates(keys: DataFrame, keyCol: Column, probes: Seq[String],
                  width: Int, depth: Int = CmDepth): DataFrame = {
    require(probes.nonEmpty, "need at least one probe key")
    val spark = keys.sparkSession
    import spark.implicits._
    val sk = cmSketch(keys, keyCol, width, depth)
    val pb = probes.toDF("word")
      .select(col("word"),
        posexplode(array((0 until depth).map(r => cmBucket(col("word"), r, width)): _*))
          .as(Seq("r", "bucket")))
    val est = pb.join(sk, Seq("r", "bucket"), "left")
      .groupBy("word").agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
    val exact = keys.select(keyCol.as("word"))
      .filter(col("word").isin(probes.map(lit): _*))
      .groupBy("word").agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("word"), "left")
      .select(col("word"), col("cm_est"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        (col("cm_est") - coalesce(col("n_exact"), lit(0L))).as("overcount"))
  }

  /** DuckDB twin: same hash rows, same probe list, same min-over-rows. */
  def cmEstimatesSql(tokenCte: String, probes: Seq[String], width: Int,
                     depth: Int = CmDepth): String = {
    val buildRows = (0 until depth).map(r =>
      s"SELECT $r AS r, ${cmBucketSql("k", r, width)} AS bucket FROM tok").mkString("\n UNION ALL ")
    val probeRows = (0 until depth).map(r =>
      s"SELECT word, $r AS r, ${cmBucketSql("word", r, width)} AS bucket FROM pr").mkString("\n UNION ALL ")
    val probeList = probes.map(w => s"('$w')").mkString(", ")
    val inList = probes.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS ($tokenCte),
       |bk AS (SELECT r, bucket, count(*) AS cnt FROM ($buildRows) GROUP BY 1, 2),
       |pr(word) AS (VALUES $probeList),
       |pb AS ($probeRows),
       |est AS (SELECT word, min(coalesce(cnt, 0)) AS cm_est
       |        FROM pb LEFT JOIN bk USING (r, bucket) GROUP BY 1),
       |ex AS (SELECT k AS word, count(*) AS n_exact FROM tok WHERE k IN ($inList) GROUP BY 1)
       |SELECT est.word, cm_est, coalesce(n_exact, 0) AS n_exact,
       |       cm_est - coalesce(n_exact, 0) AS overcount
       |FROM est LEFT JOIN ex ON est.word = ex.word""".stripMargin
  }

  // ------------------------------------------------------------------
  // Two-pass heavy hitters: CM candidates, exact verify
  // ------------------------------------------------------------------

  /** Find every token whose frequency is ≥ `ppm` parts-per-million of
    * the total token mass, WITHOUT ever holding full-vocabulary exact
    * counts in one aggregation:
    *
    *   pass 1 — the bounded CM sketch (depth×width counters) gives
    *   each distinct token an UPPER-BOUND estimate `cm_est = min_r
    *   cnt(r, h_r)`; candidates are tokens with `cm_est ≥ threshold`.
    *   CM's one-sided error means no true heavy hitter is missed —
    *   collisions only ADD false candidates;
    *
    *   pass 2 — exact counts for the candidate sliver alone (broadcast
    *   semi-join): the exact agg's state is |candidates| ≈
    *   1e6/ppm + collision strays, not |vocab|.
    *
    * Deterministic end-to-end (CM is a commutative sum over fixed
    * hashes; threshold is integer math over the exact total), so the
    * DuckDB twin reproduces every row. Output per candidate:
    * `word, n_exact, cm_est, overcount (≥0), is_heavy` — keeping the
    * false candidates visible makes the sketch's precision measurable
    * from the result itself.
    *
    * The threshold is RELATIVE (ppm of total mass, floored at 2), so
    * the operator is scale-stable: at any SF the candidate set stays
    * ~1e6/ppm tokens. `width` trades sketch size against false
    * candidates exactly as in [[cmSketch]].
    */
  def heavyHitters(keys: DataFrame, keyCol: Column, width: Int, ppm: Long,
                   depth: Int = CmDepth): DataFrame = {
    require(ppm > 0 && ppm <= 1000000L, s"ppm in (0, 1e6], got $ppm")
    val toks = keys.select(keyCol.as("word"))
    val sk = cmSketch(toks, col("word"), width, depth)
    // floor((n * ppm) / 1e6) == the integer division both engines agree
    // on for non-negative operands (DuckDB `//`)
    val thr = toks.agg(greatest(lit(2L),
      floor((count(lit(1)) * lit(ppm)) / lit(1000000L)).cast("long")).as("thr"))
    val pb = toks.distinct().select(col("word"),
      posexplode(array((0 until depth).map(r => cmBucket(col("word"), r, width)): _*))
        .as(Seq("r", "bucket")))
    val cand = pb.join(broadcast(sk), Seq("r", "bucket"), "left")
      .groupBy("word").agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
      .crossJoin(broadcast(thr)) // vocab × the single threshold row
      .filter(col("cm_est") >= col("thr"))
    // pass 2: exact counts for candidates only. The candidate set is
    // ~1e6/ppm true hitters plus bucket-collision strays — broadcast
    // class, same bound argument as the probe dictionaries.
    toks.join(broadcast(cand.select("word")), Seq("word"), "left_semi")
      .groupBy("word").agg(count(lit(1)).as("n_exact"))
      .join(broadcast(cand), Seq("word"))
      .select(col("word"), col("n_exact"), col("cm_est"),
        (col("cm_est") - col("n_exact")).as("overcount"),
        (col("n_exact") >= col("thr")).as("is_heavy"))
  }

  /** DuckDB twin — same hashes, same integer threshold, same two-pass
    * candidate shape.
    */
  def heavyHittersSql(tokenCte: String, width: Int, ppm: Long,
                      depth: Int = CmDepth): String = {
    val buildRows = (0 until depth).map(r =>
      s"SELECT $r AS r, ${cmBucketSql("word", r, width)} AS bucket FROM tok").mkString("\n UNION ALL ")
    val probeRows = (0 until depth).map(r =>
      s"SELECT word, $r AS r, ${cmBucketSql("word", r, width)} AS bucket FROM dk").mkString("\n UNION ALL ")
    s"""WITH tok AS ($tokenCte),
       |th AS (SELECT greatest(2, CAST(count(*) * $ppm AS BIGINT) // 1000000) AS thr FROM tok),
       |bk AS (SELECT r, bucket, count(*) AS cnt FROM ($buildRows) GROUP BY 1, 2),
       |dk AS (SELECT DISTINCT word FROM tok),
       |pb AS ($probeRows),
       |cand AS (SELECT word, min(coalesce(cnt, 0)) AS cm_est
       |         FROM pb LEFT JOIN bk USING (r, bucket)
       |         GROUP BY 1
       |         HAVING min(coalesce(cnt, 0)) >= (SELECT thr FROM th)),
       |ex AS (SELECT tok.word, count(*) AS n_exact
       |       FROM tok JOIN cand USING (word) GROUP BY 1)
       |SELECT cand.word, n_exact, cm_est,
       |       cm_est - n_exact AS overcount,
       |       n_exact >= (SELECT thr FROM th) AS is_heavy
       |FROM cand JOIN ex USING (word)""".stripMargin
  }
}
