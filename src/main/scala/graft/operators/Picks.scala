package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Top-k-per-group operators (SURVEY.md §2.6 W1-W3, W5).
  *
  * The reference sorts each candidate pool in Python and slices; here each
  * pick is a single `row_number` window — one shuffle on the partition
  * keys, no driver-side state, skew handled by AQE. At 100 TB the shuffle
  * is on (item, column)-grain keys whose groups are tiny (a handful of
  * files per cell), so partitions stay balanced regardless of table size.
  *
  * Order columns should include a unique tie-breaker: the reference's
  * Python sort is stable on list order, which has no distributed analog —
  * callers pass e.g. `Seq($"createdAt".desc, $"assetId")`.
  */
object Picks {
  private def ranked(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column]): DataFrame =
    df.withColumn("_rn", row_number().over(Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)))

  /** W1 `pick="latest"` / W5 oldest-winner: top-1 per group by `orderBy`. */
  def pickTop1(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column]): DataFrame =
    ranked(df, partitionBy, orderBy).filter(col("_rn") === 1).drop("_rn")

  /** W3 `pick="all"` with `max` truncation: first `k` per group. */
  def pickTopK(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame =
    ranked(df, partitionBy, orderBy).filter(col("_rn") <= k).drop("_rn")

  /** Chunk rows into groups of at most `size` — the reference's
    * `asset_ids[i:i+50]` batching (`Leyton_depot.py:194-199`) as a column.
    *
    * Distributed formulation: rows are first spread over `buckets`
    * deterministic hash buckets (stable md5-based hash of `keyCol`, so an
    * external oracle can mirror it), then numbered WITHIN each bucket —
    * the window partitions by bucket, so no single task ever sees the
    * whole table (a global `Window.orderBy` would). Chunk ids are unique
    * across buckets via `bucket + buckets * local_chunk`; each chunk
    * holds at most `size` rows, which is the only property batching
    * needs (the reference never requires chunks to be dense/consecutive).
    */
  def withChunkId(df: DataFrame, keyCol: Column, size: Int, buckets: Int = 32): DataFrame =
    df.withColumn("_bkt", pmod(graft.functions.Hashing.stableHash60(keyCol.cast("string")), lit(buckets)))
      .withColumn("_rn", row_number().over(Window.partitionBy(col("_bkt")).orderBy(keyCol)))
      .withColumn("chunk_id", col("_bkt") + lit(buckets) * floor((col("_rn") - 1) / size))
      .drop("_bkt", "_rn")
}
