package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout for data-skipping at scale.
  *
  * A 100 TB scan filtered on (user, time) reads every file when the data
  * is laid out by ingestion order: each file spans the full range of
  * both columns, so no file's min/max stats can exclude it. Range-
  * partitioning and sorting by the Z-VALUE — the bit-interleave of the
  * two dimensions — makes every file cover a small rectangle of the
  * (a, b) plane, so parquet min/max stats (file- and row-group-level)
  * prune most of the scan for ANY box predicate on either or both
  * columns. This is the same idea Delta/Iceberg ship as OPTIMIZE
  * ZORDER BY; here it is a plain column expression + repartitionByRange,
  * nothing engine-specific.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * integer columns (a gets the even bit positions, b the odd).
    * 2·bits <= 62 so the result fits a long. Values are clamped to the
    * `bits`-bit range first — out-of-range inputs would otherwise alias.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val ac = least(greatest(a.cast("long"), lit(0L)), lit(mask))
    val bc = least(greatest(b.cast("long"), lit(0L)), lit(mask))
    (0 until bits).map { i =>
      shiftright(ac, i).bitwiseAND(1) * lit(1L << (2 * i)) +
        shiftright(bc, i).bitwiseAND(1) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** DuckDB twin of [[zValue]] (same clamping, same interleave). */
  def zValueSql(a: String, b: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    def clamp(e: String) = s"least(greatest(CAST($e AS BIGINT), 0), $mask)"
    val (ac, bc) = (clamp(a), clamp(b))
    (0 until bits).map { i =>
      s"(($ac >> $i) & 1) * ${1L << (2 * i)} + (($bc >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
  }

  /** Rewrite `df` into `numFiles` z-ordered output slices: range-
    * partition on the z-value (so files tile the z-curve) and sort
    * within each partition (so row groups tile it too). The caller
    * writes the result; the z column is dropped — it exists only to
    * drive the layout.
    */
  def zOrdered(df: DataFrame, colA: String, colB: String, bits: Int,
               numFiles: Int): DataFrame = {
    val withZ = df.withColumn("_z", zValue(col(colA), col(colB), bits))
    withZ.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
