package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F7 structure generator + K5/J4 upload-plan flatten golden checks
  * (SURVEY §5.5; reference `Leyton_depot.py:208-256`, `:548-591`).
  */
class StructureSpec extends SparkSpec {
  import spark.implicits._

  private def clients = Seq((101L, "Ana María"), (102L, "Bob")).toDF("id_monday", "nomcomplet")

  test("lotStructure golden layout: names, auto ids, slot counts") {
    val out = Structure.lotStructure(clients, lotNumber = 7, startId = 3)
    assert(out.select("lot_name").distinct().as[String].collect().toSeq === Seq("CLM_GE_07"))
    // 2 clients x 12 template rows (1 + 1-empty + 8 + 2)
    assert(out.count() === 24L)
    val ana = out.filter($"id_monday" === 101L)
    assert(ana.select("auto_id").distinct().as[Long].head === 3L)
    assert(ana.select("dossier").distinct().as[String].head === "ACT_3_ANA_MARÍA")
    assert(ana.filter($"slot_name".isNull).select("section_name").as[String].collect().toSeq ===
      Seq("E3-2-DICTAMEN FAVORABLE E INFORME"))
    assert(ana.filter($"column_id" === "col_factura").select("slot_name").as[String].head ===
      "E3-3-3 FACTURA")
    val bob = out.filter($"id_monday" === 102L)
    assert(bob.select("auto_id").distinct().as[Long].head === 4L)
    assert(bob.select("dossier").distinct().as[String].head === "ACT_4_BOB")
  }

  test("withSeqId equals a global row_number for sparse keys spanning many buckets") {
    import org.apache.spark.sql.expressions.Window
    // ids straddle several 1024-wide buckets, including an empty middle
    // bucket, two ids inside the same bucket, and ids in distinct
    // COARSE (1024²-wide) blocks to exercise the two-level cumsum
    val ids = Seq(5L, 900L, 1030L, 1031L, 5000L, 99999L, 5000000L, 2000000000L)
    val df = scala.util.Random.shuffle(ids).map(i => (i, s"n$i")).toDF("id_monday", "nomcomplet")
    val got = Structure.withSeqId(df, "id_monday", "auto_id", startId = 10)
      .select("id_monday", "auto_id").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("auto_id", lit(10L) + row_number().over(Window.orderBy($"id_monday")) - 1)
      .select("id_monday", "auto_id").as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got(5L) === 10L && got(2000000000L) === 17L)
  }

  test("withSeqId never drops rows with null order keys — they sort first") {
    // regression: a null key used to produce a null bucket that the
    // inner offset equi-joins silently eliminated
    val df = Seq(
      (java.lang.Long.valueOf(7L), "seven"),
      (null.asInstanceOf[java.lang.Long], "nokey"),
      (java.lang.Long.valueOf(3L), "three")).toDF("id_monday", "nomcomplet")
    val got = Structure.withSeqId(df, "id_monday", "auto_id", startId = 1)
      .select("nomcomplet", "auto_id").as[(String, Long)].collect().toMap
    assert(got.size === 3)
    assert(got("nokey") === 1L) // nulls first, like the global-window form
    assert(got("three") === 2L && got("seven") === 3L)
  }

  test("uploadPlan: skip-excel filter, _idx suffix for multi-asset slots, empty slots kept") {
    val slots = Structure.lotStructure(clients, 7, 3)
    val pool = Seq(
      (101L, "col_factura", 11L, "f1.pdf", 100L),
      (101L, "col_factura", 12L, "f2.pdf", 200L), // newer: becomes idx 0
      (101L, "col_excel", 13L, "e.xlsx", 100L)
    ).toDF("item_id", "column_id", "asset_id", "name", "created_at")
    val plan = Structure.uploadPlan(slots, pool)
    // excel slot dropped entirely by P5
    assert(plan.filter($"column_id" === "col_excel").count() === 0L)
    val factura = plan.filter($"id_monday" === 101L && $"column_id" === "col_factura")
      .select("asset_id", "upload_name").as[(Long, String)].collect().toMap
    assert(factura(12L) === "E3-3-3 FACTURA.pdf")      // latest first, no suffix
    assert(factura(11L) === "E3-3-3 FACTURA_1.pdf")    // second gets _1
    // a slot with no files keeps its row with null asset
    val dni = plan.filter($"id_monday" === 101L && $"column_id" === "col_dni")
    assert(dni.count() === 1L)
    assert(dni.filter($"asset_id".isNull).count() === 1L)
    // skipExcel=false keeps the excel slot
    val withExcel = Structure.uploadPlan(slots, pool, skipExcel = false)
    assert(withExcel.filter($"column_id" === "col_excel" && $"asset_id" === 13L).count() === 1L)
  }
}
