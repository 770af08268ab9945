package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single right
  * row with the greatest right timestamp <= the left timestamp within
  * the same key (left rows with no prior right row keep nulls).
  *
  * Composed from built-ins per the preference order (no custom
  * LogicalPlan needed): tag both sides, union on (key, ts), and fill
  * ONE struct of all right payload columns with a single
  * `last(_, ignoreNulls)` over rows unbounded-preceding..current, with
  * right rows ordered BEFORE left rows at equal timestamps. The struct
  * is non-null exactly on right rows, so every output row takes its
  * whole payload from ONE right row — a per-column fill would backfill
  * a genuinely-NULL payload value from an older right row and mix
  * rows. One shuffle on the key, one sort — the same cost profile as a
  * native as-of merge; no range cross-product ever materializes.
  *
  * Right-side (key, ts) ties must be resolved by the caller (e.g.
  * latest-by-unique-id via Picks.pickTop1) — both engines' tie choice
  * would otherwise be arbitrary.
  */
object AsOf {

  /** leftTs/rightTs must be comparable types. `rightPayload` names the
    * right columns to carry; output = all left columns + rightPayload.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(key)).withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
      .select(Seq(col("_k"), col("_ts"), col("_side")) ++
        leftCols.map(col) ++ rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("_k", col(key)).withColumn("_ts", col(rightTs)).withColumn("_side", lit(0))
      .select(Seq(col("_k"), col("_ts"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ rightPayload.map(col): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("_rp", when(col("_side") === 0, struct(rightPayload.map(col): _*)))
      .withColumn("_rp", last(col("_rp"), ignoreNulls = true).over(w))
    rightPayload.foldLeft(filled) { (df, c) => df.withColumn(c, col("_rp").getField(c)) }
      .filter(col("_side") === 1).drop("_k", "_ts", "_side", "_rp")
  }
}
