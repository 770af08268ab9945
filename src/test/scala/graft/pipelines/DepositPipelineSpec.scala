package graft.pipelines

import graft.SparkSpec
import graft.sinks.DriveStore
import org.apache.spark.sql.functions._

/** End-to-end §3.3 integration: EAV cells with JSON payloads → matching
  * → structure → uploads with a flaky writer → status flips. Mirrors
  * the reference's deposit_single_item walk (`Leyton_depot.py:648-696`)
  * but set-at-a-time.
  */
class DepositPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def clients = Seq((101L, "Ana María"), (102L, "Bob"), (103L, "Carol"))
    .toDF("id_monday", "nomcomplet")

  /** item 101 has a matching factura (latest wins of two) and a DNI;
    * item 102 has only a corrupt payload; 103 has a non-pdf file only.
    */
  private def cells = Seq(
    (101L, "col_factura",
      """{"files":[{"assetId":11,"name":"factura v1.pdf","createdAt":100},
        |          {"assetId":12,"name":"factura v2.pdf","createdAt":200}]}""".stripMargin.replace("\n", "")),
    (101L, "col_dni", """{"files":[{"assetId":13,"name":"dni ana.pdf","createdAt":50}]}"""),
    (102L, "col_factura", "{corrupt json"),
    (103L, "col_factura", """{"files":[{"assetId":31,"name":"factura.xlsx","createdAt":10}]}""")
  ).toDF("item_id", "column_id", "value")

  private def rules = Seq(
    ("col_factura", 1, Seq("factura"), Seq.empty[String], Seq("pdf"), "latest", Option.empty[Int]),
    ("col_dni", 1, Seq("dni"), Seq.empty[String], Seq("pdf"), "latest", Option.empty[Int])
  ).toDF("column_id", "priority", "include_any_of", "exclude_any_of", "file_types", "pick", "max")

  private def defaultRule = Seq(
    ("__default__", 1, Seq.empty[String], Seq.empty[String], Seq("pdf"), "latest", Option.empty[Int])
  ).toDF("column_id", "priority", "include_any_of", "exclude_any_of", "file_types", "pick", "max")

  test("deposit pipeline: match → plan → upload with retry → A4-gated status flip") {
    DriveStore.drop("dp1")
    val plan = DepositPipeline.uploadTasks(clients, cells, rules, defaultRule,
      lotNumber = 7, startId = 1)

    // matching picked the LATEST factura (12) and the dni (13); the corrupt
    // payload and the xlsx yielded no matches.
    val matched = plan.filter($"asset_id".isNotNull)
      .select("id_monday", "asset_id").as[(Long, Long)].collect().toSet
    assert(matched === Set((101L, 12L), (101L, 13L)))

    // slots exist for every client even with nothing to upload
    assert(plan.filter($"id_monday" === 102L).count() > 0)
    assert(plan.filter($"id_monday" === 102L && $"asset_id".isNotNull).count() === 0)

    val (results, updates) = DepositPipeline.run(spark, plan, "dp1", sleep = _ => ())
    val store = DriveStore.get("dp1")
    assert(results.filter($"ok").count() === 2L)
    assert(store.fileCount === 2)
    // A4 gate: only item 101 had a success -> only its status flips
    assert(updates.select("item_id").as[Long].collect().toSeq === Seq(101L))
    assert(store.status(101L) === Some("Livré"))
    assert(store.status(102L) === None)
    assert(store.status(103L) === None)
    // folder get-or-create was idempotent across the two uploads of item 101
    assert(store.listFolders(0L, "ITEM_101").size === 1)
  }

  test("upload names carry the slot template name, not the original file name") {
    DriveStore.drop("dp2")
    val plan = DepositPipeline.uploadTasks(clients, cells, rules, defaultRule, 7, 1)
    val names = plan.filter($"asset_id".isNotNull)
      .select("upload_name").as[String].collect().toSet
    // client 101 is auto_id 1 -> E1- prefixes; extension from the source file
    assert(names === Set("E1-3-3 FACTURA.pdf", "E1-4-DNI.pdf"))
  }
}
