package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass grouped quantile ESTIMATES over a fixed histogram grid —
  * the sketch-shaped scale path next to the exact rank-window
  * `q_quantiles`:
  *
  *   - ONE map-side-combined hash aggregate keyed (group, bin) — no
  *     per-group sort at all, so cost is O(rows) + O(groups × bins)
  *     regardless of group skew, and the shape drops straight into a
  *     streaming aggregation (bins are mergeable counts);
  *   - memory is O(bins) per group (vs the full column for exact);
  *   - error is bounded by the bin width, chosen by the caller.
  *
  * Unlike t-digest/GK sketches, the fixed grid is DETERMINISTIC: the
  * estimate is a pure function of integer bin counts and shared double
  * constants, so an independent engine reproduces it bit-for-bit and
  * the DuckDB oracle can hash-gate an "approximate" operator (values
  * below/above the grid clamp into the edge bins).
  *
  * Estimate definition (both engines, same fold): target = ceil(p·n);
  * the quantile lands in the first bin whose cumulative count reaches
  * target; linear interpolation within the bin by remaining count:
  * `lo + width·(bin + (target - cum_before)/c_bin)`.
  */
object HistogramQuantiles {
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double, hi: Double, bins: Int,
                ps: Seq[(String, Double)]): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo, got bins=$bins [$lo,$hi]")
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 },
      "quantiles must be in (0, 1]")
    val width = (hi - lo) / bins
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    val byGroup = Window.partitionBy(col("_g"))
    val cumW = byGroup.orderBy(col("bin"))
    val counts = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("_g"), bin.as("bin"))
      .groupBy("_g", "bin").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(byGroup))
    val qCols = ps.map { case (name, p) =>
      val target = ceil(lit(p) * col("n"))
      max(when(col("cum") >= target && (col("cum") - col("c")) < target,
        lit(lo) + lit(width) *
          (col("bin") + (target - (col("cum") - col("c"))) / col("c")))).as(name)
    }
    counts.groupBy(col("_g").as(groupCol)).agg(qCols.head, qCols.tail: _*)
  }

  /** DuckDB twin generated from the same constants (doubles embedded
    * via shortest-round-trip toString, which DuckDB parses back to the
    * identical bits).
    */
  def quantilesSql(table: String, groupCol: String, valueCol: String,
                   lo: Double, hi: Double, bins: Int,
                   ps: Seq[(String, Double)]): String = {
    val width = (hi - lo) / bins
    val qs = ps.map { case (name, p) =>
      val t = s"ceil($p * n)"
      s"max(CASE WHEN cum >= $t AND cum - c < $t THEN $lo + $width * (bin + ($t - (cum - c)) / c) END) AS $name"
    }.mkString(",\n       ")
    s"""WITH b AS (SELECT $groupCol AS g,
       |                  CAST(LEAST(GREATEST(floor(($valueCol - $lo) / $width), 0.0), ${bins - 1}.0) AS BIGINT) AS bin
       |           FROM $table WHERE $valueCol IS NOT NULL),
       |c AS (SELECT g, bin, count(*) AS c FROM b GROUP BY 1, 2),
       |m AS (SELECT *, CAST(sum(c) OVER (PARTITION BY g ORDER BY bin) AS BIGINT) AS cum,
       |             CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
       |      FROM c)
       |SELECT g AS $groupCol,
       |       $qs
       |FROM m GROUP BY g""".stripMargin
  }
}
