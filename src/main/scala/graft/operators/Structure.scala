package graft.operators

import graft.functions.Normalize.norm
import graft.functions.StringOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F7/K5/J4 — the regulatory folder-structure generator and its flatten
  * into an upload-task plan (reference `generer_structure_lot`,
  * `Leyton_depot.py:208-256`, consumed by
  * `create_lot_on_drive_with_uploads`, `:548-591`).
  *
  * The reference builds a nested dict lot → clients[] → sections[] →
  * file-slots[]; here the template is a literal nested array exploded
  * twice over the client relation — the flattened DataFrame IS the
  * upload plan, ready for a foreachPartition sink. Column ids are
  * symbolic (config keys), not board-specific identifiers.
  *
  * Scale note: `auto_id` is a GLOBAL sequential id by `id_monday`
  * order, but it is NOT computed with a global window (which would
  * funnel every row through one task): rows bucket by a monotone
  * function of the order key, number within buckets in parallel, and
  * add the broadcast cumulative offset of earlier buckets — the
  * standard distributed zipWithIndex. The big dimensions (files per
  * slot) arrive via the later pool join, which shuffles on
  * (item, column) grain.
  */
object Structure {

  /** (section-name suffix, [(slot-name suffix, column id)]) — the
    * per-client template; every name is prefixed `E{auto_id}-`.
    */
  val Template: Seq[(String, Seq[(String, String)])] = Seq(
    "1-CONVENIO CAE" -> Seq(
      "1-1 CONTRATO CESION AHORROS" -> "col_contrato"),
    "2-DICTAMEN FAVORABLE E INFORME" -> Seq.empty,
    "3-DOCUMENTOS JUSTIFICATIVOS" -> Seq(
      "3-1 FICHA RES020 CUMPLIMENTADA" -> "col_ficha_res020",
      "3-2 DECLARACION RESPONSABLE" -> "col_declaracion",
      "3-3 FACTURA" -> "col_factura",
      "3-4 INFORME FOTOGRÁFICO" -> "col_informe_foto",
      "3-5 CERTIFICADO INSTALADOR" -> "col_certificado_inst",
      "3-6-1 CEE FINAL" -> "col_cee_final",
      "3-6-2 REGISTRO" -> "col_registro",
      "3-6-3 PAGO" -> "col_pago"),
    "4-OTROS DOCUMENTOS JUSTIFICATIVOS" -> Seq(
      "4-DNI" -> "col_dni",
      "4-EXCEL" -> "col_excel"))

  /** Global sequential ids (`startId`, `startId+1`, …) in `orderCol`
    * order WITHOUT a global window: bucket by a monotone function of
    * the key (`orderCol div bucketWidth` — order-preserving across
    * buckets, ≤ bucketWidth unique keys per bucket so no skew is
    * possible), `row_number` within each bucket in parallel, then add
    * the cumulative row count of earlier buckets via a broadcast join
    * of the offsets table. Identical output to
    * `row_number().over(Window.orderBy(orderCol))` for unique keys;
    * no task ever sees more than one bucket of data.
    *
    * The offsets cumsum is itself computed WITHOUT a global window or
    * an O(B²) self-join over all B buckets: buckets group into coarse
    * blocks of `bucketWidth` buckets each; a window partitioned by the
    * coarse block (≤ bucketWidth rows per partition) does the
    * within-block cumsum, and only the B/bucketWidth coarse TOTALS go
    * through the triangle self-join — bounded at (B/width)² on
    * count-rows, i.e. ~10^6 cheap comparisons even for 10^9 input
    * rows. A third level would lift that ceiling again; two levels
    * cover any realistic id space.
    */
  def withSeqId(df: DataFrame, orderCol: String, as: String, startId: Long,
                bucketWidth: Long = 1024L): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // Null order keys coalesce into a sentinel FIRST bucket instead of a
    // null `_b` (which the inner equi-joins below would silently drop):
    // every input row gets an id, and nulls sort first — the same
    // nulls-first placement the plain global-window row_number gives.
    val bucketed = df.withColumn("_b",
      when(col(orderCol).isNull, lit(Long.MinValue))
        .otherwise(expr(s"cast($orderCol as long) div $bucketWidth")))
    val counts = bucketed.groupBy("_b").agg(count(lit(1)).as("_n"))
      .withColumn("_cb", expr(s"_b div $bucketWidth"))
    val coarseTotals = counts.groupBy("_cb").agg(sum(col("_n")).as("_cn"))
    val coarseOff = coarseTotals.as("a")
      .join(coarseTotals.as("b"), col("b._cb") < col("a._cb"), "left")
      .groupBy(col("a._cb").as("_cb")).agg(coalesce(sum(col("b._cn")), lit(0L)).as("_coff"))
    val offsets = counts
      .withColumn("_within",
        sum(col("_n")).over(Window.partitionBy(col("_cb")).orderBy(col("_b"))) - col("_n"))
      .join(broadcast(coarseOff), "_cb")
      .select(col("_b"), (col("_coff") + col("_within")).as("_off"))
    bucketed
      .withColumn("_rn", row_number().over(Window.partitionBy(col("_b")).orderBy(col(orderCol))))
      .join(broadcast(offsets), "_b")
      .withColumn(as, lit(startId) + col("_off") + col("_rn") - 1)
      .drop("_b", "_rn", "_off")
  }

  /** Generate the flattened lot structure for a client relation
    * (`id_monday`, `nomcomplet`). One row per (client, section, slot);
    * sections with no slots keep a row with null slot columns (their
    * folders are still created — K5 makes every section folder).
    */
  def lotStructure(clients: DataFrame, lotNumber: Int, startId: Long): DataFrame = {
    val template = typedlit(Template.map { case (sec, slots) => (sec, slots) })
    withSeqId(clients, "id_monday", "auto_id", startId)
      .withColumn("lot_name", lit(f"CLM_GE_$lotNumber%02d"))
      .withColumn("dossier", StringOps.actFolderName(col("auto_id"), col("nomcomplet")))
      .select(col("lot_name"), col("auto_id"), col("id_monday"), col("nomcomplet"),
        col("dossier"), explode(template).as("sec"))
      .withColumn("section_name", concat(lit("E"), col("auto_id"), lit("-"), col("sec._1")))
      .select(col("lot_name"), col("auto_id"), col("id_monday"), col("dossier"),
        col("section_name"), explode_outer(col("sec._2")).as("slot"))
      .withColumn("slot_name",
        when(col("slot").isNotNull, concat(lit("E"), col("auto_id"), lit("-"), col("slot._1"))))
      .withColumn("column_id", col("slot._2"))
      .drop("slot")
  }

  /** J4 + K5: join the slot plan to a per-(item, column) file pool and
    * name each upload — multi-asset slots get a `_{idx}` suffix after
    * the first (reference `Leyton_depot.py:581-582`), names are
    * drive-sanitized, and the skip-Excel filter (P5,
    * `Leyton_depot.py:33`, `:571-572`) drops slots whose normalized
    * name contains "excel".
    *
    * pool schema: item_id, column_id, asset_id, name, created_at.
    * Slots with no matching file keep one row with null asset columns
    * (the reference records the empty slot, it just uploads nothing).
    */
  def uploadPlan(slots: DataFrame, pool: DataFrame, skipExcel: Boolean = true): DataFrame = {
    val slotFiles = slots
      .filter(col("slot_name").isNotNull)
      .filter(if (skipExcel) !norm(col("slot_name")).contains("excel") else lit(true))
      .join(pool,
        slots("id_monday") === pool("item_id") && slots("column_id") === pool("column_id"),
        "left")
      .drop(pool("column_id")).drop(pool("item_id"))
    val perSlot = Window.partitionBy(col("id_monday"), col("column_id"))
      .orderBy(col("created_at").desc, col("asset_id"))
    slotFiles
      .withColumn("_idx", when(col("asset_id").isNotNull, row_number().over(perSlot) - 1))
      .withColumn("upload_name",
        when(col("asset_id").isNotNull, StringOps.sanitizeName(concat(
          col("slot_name"),
          when(col("_idx") > 0, concat(lit("_"), col("_idx"))).otherwise(lit("")),
          StringOps.extFromNameOrMime(col("name"), lit(null).cast("string"))))))
      .drop("_idx")
  }
}
