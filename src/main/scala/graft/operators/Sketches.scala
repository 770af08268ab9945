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
}
