package graft.pipelines

import graft.operators.{RuleCascade, Structure}
import graft.sinks.{DriveStore, StatusSink, UploadSink, UploadTask}
import graft.sources.FilesPayload
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §3.3 `/depot_leyton/` — the reference's flagship pipeline
  * (`Leyton_depot.py:648-696`) recomposed as ONE declarative flow:
  *
  *   cells (EAV, JSON files payload)            S2/F9
  *     → explode file entries                   P1
  *     → RuleCascade matching                   J3 + P2/P3 + W1-W4
  *   clients → lot structure template           F7
  *     → upload plan (slots × matched pool)     J4/K5, P5 skip-Excel
  *     → UploadSink (retry + per-row errors)    K1/K2/K5
  *     → success counts per item                A2/A3
  *     → existence gate → status flip           A4/K4
  *
  * The reference walks this item-at-a-time over HTTP; here every stage
  * is a DataFrame transform, so the same code runs one webhook item or
  * a 100 TB backfill — only the partition count changes. Side effects
  * live exclusively in the two sinks at the end.
  */
object DepositPipeline {

  /** Matched file pool: one row per (item, column) chosen file. */
  def matchedPool(cells: DataFrame, rules: DataFrame, defaultRule: DataFrame): DataFrame = {
    val pool = FilesPayload.explodeFiles(cells, "value")
      .select(col("item_id"), col("column_id"),
        col("asset_id"), col("file_name").as("name"), col("created_at"))
    RuleCascade(pool, rules, defaultRule)
      .select("item_id", "column_id", "asset_id", "name", "created_at")
  }

  /** Full upload plan for a lot: slots joined to the matched pool. */
  def uploadTasks(clients: DataFrame, cells: DataFrame, rules: DataFrame,
                  defaultRule: DataFrame, lotNumber: Int, startId: Long): DataFrame =
    Structure.uploadPlan(
      Structure.lotStructure(clients, lotNumber, startId),
      matchedPool(cells, rules, defaultRule))

  /** Execute the plan against a [[DriveStore]]: upload every matched
    * file with retry, flip status for items with at least one success.
    * Returns (upload results, status updates) for inspection — the
    * side effects have already been applied to the named store.
    */
  def run(spark: SparkSession, plan: DataFrame, storeName: String,
          doneStatus: String = "Livré", sleep: Long => Unit = Thread.sleep): (DataFrame, DataFrame) = {
    import spark.implicits._
    val tasks = plan
      .filter(col("asset_id").isNotNull)
      .select(col("asset_id").as("task_id"), col("id_monday").as("parent_id"),
        col("upload_name").as("name"), col("name").as("payload"))
      .as[UploadTask]
    // The upload stage is SIDE-EFFECTING: materialize it exactly once
    // (eager localCheckpoint cuts the lineage) — otherwise every
    // downstream action would re-run the uploads.
    val results = UploadSink.attemptAll(tasks, sleep = sleep, writer = { t =>
      val store = DriveStore.get(storeName)
      val folder = store.findOrCreateFolder(0L, s"ITEM_${t.parent_id}")
      store.uploadFile(folder, t.name, t.payload.length.toLong)
    }).toDF().localCheckpoint(true)
    val updates = results.join(
        plan.select(col("asset_id").as("task_id"), col("id_monday").as("item_id")), "task_id")
      .groupBy("item_id")
      .agg(count(when(col("ok"), 1)).as("n_success"), count(lit(1)).as("n_total"))
      .filter(col("n_success") > 0)
      .select(col("item_id"), lit(doneStatus).as("new_status"))
    StatusSink.applyStatuses(updates, storeName, sleep = sleep)
    (results, updates)
  }
}
