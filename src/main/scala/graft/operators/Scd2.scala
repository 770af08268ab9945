package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 build: fold an append-only change
  * feed into versioned validity intervals per entity — the dimension
  * -maintenance operator every warehouse load needs (the reference
  * keeps only last-write-wins state in its board columns; SCD2 is the
  * history-preserving upgrade of the same ingest).
  *
  * Shape: one window partitioned by the entity key does change
  * detection (drop rows whose tracked attribute equals the previous
  * row's), a second window over the surviving change rows assigns
  * version numbers and closes each interval with the next row's start.
  * Both windows share the same (key) partitioning, so the plan is ONE
  * exchange on the entity key followed by two sorts of already-local
  * data — no shuffle grows with version count, and entities
  * distribute freely across executors at any scale.
  *
  * Determinism: rows are ordered by (ts, tieCol) — the tie column
  * (a unique event id) makes same-timestamp feeds reproducible, which
  * the cross-engine hash gate requires.
  */
object Scd2 {

  /** @param changes append-only feed with one row per observed state
    * @param keyCol  entity key (dimension natural key)
    * @param attrCol tracked attribute; consecutive equal values collapse
    * @param tsCol   observation time (becomes valid_from)
    * @param tieCol  unique per-row tiebreaker for same-ts determinism
    */
  def build(changes: DataFrame, keyCol: String, attrCol: String,
            tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changed = changes
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attrCol))
    changed
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("_next", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(attrCol),
        col(tsCol).as("valid_from"),
        // Open intervals close at the conventional SCD2 high date, not
        // NULL: range predicates (`BETWEEN valid_from AND valid_to`)
        // then need no null branch, and the cross-engine hash gate has
        // no engine-specific null-timestamp encoding to disagree on.
        coalesce(col("_next"), lit(HighDate).cast("timestamp")).as("valid_to"),
        col("_next").isNull.as("is_current"))
  }

  /** SCD2 open-interval end (UTC — GraftSession pins the session
    * timezone, so the literal parses identically everywhere). Chosen
    * inside the datetime64[ns] representable range (±~292 years from
    * epoch): the conventional `9999-12-31` sentinel overflows
    * nanosecond-precision timestamp implementations, which makes
    * cross-engine comparison depend on each engine's overflow
    * behavior instead of on the value.
    *
    * MIGRATION NOTE: rounds ≤7 used the conventional `9999-12-31`
    * sentinel, so SCD2 outputs persisted from those rounds mix two
    * sentinels. Consumers rereading prior outputs must filter on
    * `is_current` (always written, sentinel-independent) rather than
    * testing `valid_to` against either literal; new outputs carry only
    * this value.
    */
  val HighDate = "2200-01-01 00:00:00"

  /** DuckDB twin of [[build]] (same change detection, same tiebreak). */
  def buildSql(table: String, keyCol: String, attrCol: String,
               tsCol: String, tieCol: String): String =
    s"""WITH o AS (SELECT $keyCol, $attrCol, CAST($tsCol AS TIMESTAMP) AS ts, $tieCol,
       |                  lag($attrCol) OVER (PARTITION BY $keyCol ORDER BY $tsCol, $tieCol) AS prev
       |           FROM $table),
       |c AS (SELECT $keyCol, $attrCol, ts, $tieCol FROM o
       |      WHERE prev IS NULL OR prev != $attrCol)
       |SELECT $keyCol, CAST(row_number() OVER w AS INTEGER) AS version, $attrCol,
       |       ts AS valid_from,
       |       coalesce(lead(ts) OVER w, TIMESTAMP '$HighDate') AS valid_to,
       |       lead(ts) OVER w IS NULL AS is_current
       |FROM c WINDOW w AS (PARTITION BY $keyCol ORDER BY ts, $tieCol)""".stripMargin
}
