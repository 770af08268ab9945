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
}
