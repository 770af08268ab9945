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

  import org.apache.spark.sql.expressions.Window

  /** Small-file compaction planner: assign each file of a listing to a
    * target-size output bin. The small-file problem IS the 100 TB
    * problem — a day of streaming micro-batches leaves millions of
    * KB-sized parquet files whose per-file open/footer cost dominates
    * any later scan; compaction rewrites them into ~`target`-byte
    * outputs. This operator emits the *plan* (bin manifest), which a
    * rewrite job executes per-bin.
    *
    * Packing rule (deterministic, shuffle-free beyond one window per
    * partition): files >= target each keep their own bin ("large" —
    * rewriting them buys nothing); smaller files are packed in id
    * order by cumulative size, bin = floor(bytes_before / target).
    * A bin may overflow by at most one file — the price of computing
    * the whole plan in one windowed pass instead of a sequential
    * first-fit loop no engine could parallelize. Everything is integer
    * arithmetic, so the plan is bit-identical cross-engine.
    */
  def compactionPlan(files: DataFrame, partCol: String, idCol: String,
                     sizeCol: String, target: Long): DataFrame = {
    require(target > 0, "target must be positive")
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol))
    val packed = files.filter(col(sizeCol) < target)
      .withColumn("_before", sum(col(sizeCol)).over(w) - col(sizeCol))
      .withColumn("bin_id", expr(s"_before div ${target}L"))
      .groupBy(col(partCol), col("bin_id"))
      .agg(count(lit(1)).as("n_files"), sum(col(sizeCol)).as("total_bytes"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
      .select(col(partCol), lit("packed").as("kind"), col("bin_id"),
        col("n_files"), col("total_bytes"), col("min_id"), col("max_id"))
    val large = files.filter(col(sizeCol) >= target)
      .select(col(partCol), lit("large").as("kind"),
        col(idCol).cast("long").as("bin_id"), lit(1L).as("n_files"),
        col(sizeCol).cast("long").as("total_bytes"),
        col(idCol).as("min_id"), col(idCol).as("max_id"))
    packed.unionByName(large)
  }

  /** DuckDB twin of [[compactionPlan]] (same window packing, same
    * integer division).
    */
  def compactionPlanSql(table: String, partCol: String, idCol: String,
                        sizeExpr: String, target: Long): String =
    s"""WITH f AS (SELECT $partCol, $idCol, $sizeExpr AS bytes FROM $table),
       |s AS (SELECT $partCol, $idCol, bytes,
       |             CAST((sum(bytes) OVER (PARTITION BY $partCol ORDER BY $idCol) - bytes) // $target AS BIGINT) AS bin_id
       |      FROM f WHERE bytes < $target),
       |p AS (SELECT $partCol, 'packed' AS kind, bin_id,
       |             count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS total_bytes,
       |             min($idCol) AS min_id, max($idCol) AS max_id
       |      FROM s GROUP BY 1, 3),
       |l AS (SELECT $partCol, 'large' AS kind, CAST($idCol AS BIGINT) AS bin_id,
       |             CAST(1 AS BIGINT) AS n_files, CAST(bytes AS BIGINT) AS total_bytes,
       |             $idCol AS min_id, $idCol AS max_id
       |      FROM f WHERE bytes >= $target)
       |SELECT * FROM p UNION ALL SELECT * FROM l""".stripMargin
}
