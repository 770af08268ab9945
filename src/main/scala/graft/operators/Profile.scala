package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column null count, distinct count and
  * min/max — the "describe my 100 TB table" primitive a pipeline runs
  * before trusting a new input drop.
  *
  * All columns profile in a SINGLE aggregation pass (partial map-side
  * aggregation; no per-column jobs), then one explode unpivots the wide
  * result to (column_name, n_nulls, n_distinct, min_value, max_value)
  * grain. min/max are computed in the column's native type and cast to
  * string only afterwards, so numeric ordering is preserved.
  *
  * Scale note: exact `count_distinct` over N columns plans an Expand (N
  * copies of every input row before partial aggregation). That is the
  * price of exactness; set `approx = true` for one-pass HyperLogLog
  * sketches (approx_count_distinct, default 5% relative error) when
  * profiling truly wide/huge tables — same output shape, not
  * oracle-comparable.
  */
object Profile {
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val distinct =
        if (approx) approx_count_distinct(col(c)) else count_distinct(col(c))
      Seq(
        count(when(col(c).isNull, 1)).as(s"__${c}__nulls"),
        distinct.as(s"__${c}__distinct"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map(c => struct(
      lit(c).as("column_name"),
      col(s"__${c}__nulls").as("n_nulls"),
      col(s"__${c}__distinct").as("n_distinct"),
      col(s"__${c}__min").as("min_value"),
      col(s"__${c}__max").as("max_value")))
    wide.select(explode(array(structs: _*)).as("p")).select("p.*")
  }
}
