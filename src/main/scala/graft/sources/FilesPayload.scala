package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F9 — the reference's central data shape: an array of file structs
  * inside a JSON *string* cell, `{"files":[{assetId,name,createdAt}]}`
  * (`Leyton_depot.py:147-153`, `fixed_signature_utils.py:301-305`).
  *
  * Parse semantics mirror the reference's defensive defaults: a null,
  * corrupt, or files-less payload yields an EMPTY list (PERMISSIVE
  * `from_json` → null struct → coalesce to `array()`), never an error —
  * the reference wraps `json.loads` in try/except returning `[]`.
  */
object FilesPayload {
  /** files[] entry schema (reference field names). */
  val FileSchema: StructType = StructType(Seq(
    StructField("assetId", LongType),
    StructField("name", StringType),
    StructField("createdAt", LongType)))

  val PayloadSchema: StructType = StructType(Seq(
    StructField("files", ArrayType(FileSchema))))

  /** JSON payload column → files array; null/corrupt/missing → []. */
  def filesArray(value: Column): Column =
    coalesce(from_json(value, PayloadSchema).getField("files"),
      array().cast(ArrayType(FileSchema)))

  /** One row per file entry; rows with no parseable files vanish (the
    * reference's `continue` on empty pools, `app.py:202-210`).
    */
  def explodeFiles(df: DataFrame, valueCol: String): DataFrame =
    df.withColumn("_f", explode(filesArray(col(valueCol))))
      .withColumn("asset_id", col("_f.assetId"))
      .withColumn("file_name", col("_f.name"))
      .withColumn("created_at", col("_f.createdAt"))
      .drop("_f", valueCol)
}
