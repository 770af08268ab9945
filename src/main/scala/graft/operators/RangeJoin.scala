package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join without a cross product: Spark plans a naive
  * `l.ts BETWEEN r.start AND r.end` as a broadcast-nested-loop (or
  * worse), so instead both sides are exploded onto a coarse bucket
  * grid — the right side onto every bucket its interval overlaps, the
  * left onto its point's bucket — equi-joined on (key, bucket) and
  * post-filtered with the exact predicate. Shuffle cost is bounded by
  * interval-length/bucketWidth duplication instead of |L|×|R|; pick
  * bucketWidth near the typical interval length.
  */
object RangeJoin {

  /** Left rows (point `leftTs`) joined to right rows whose
    * [rightStart, rightEnd] interval contains the point, inner, on an
    * equality `key` both sides share. Timestamps as epoch numbers.
    */
  def pointInInterval(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightStart: String, rightEnd: String,
                      bucketWidth: Long): DataFrame = {
    // integer div, not `/`: double division drifts on epoch-scale longs
    val l = left.withColumn("_bkt", expr(s"`$leftTs` div $bucketWidth"))
    val r = right.withColumn("_bkt", explode(sequence(
      expr(s"`$rightStart` div $bucketWidth"),
      expr(s"`$rightEnd` div $bucketWidth"))))
    l.join(r, Seq(key, "_bkt"))
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop("_bkt")
  }
}
