package graft.sinks

import org.apache.spark.sql.Dataset

/** One upload task row (K5's flattened plan grain) and its outcome. */
case class UploadTask(task_id: Long, parent_id: Long, name: String, payload: String)

/** Per-row Either-style result (reference `Leyton_depot.py:574-588`
  * records failures as rows — `fileId=None, error=str(e)` — instead of
  * aborting the lot).
  */
case class UploadResult(task_id: Long, ok: Boolean, file_id: Option[Long],
                        error: Option[String], attempts: Int)

/** K1/K2/K5 — the side-effecting upload sink: every task is attempted
  * with the K2 retry policy, failures are captured as result ROWS so
  * one bad document never fails the partition (let alone the job), and
  * the writer runs inside `mapPartitions` so connection-style resources
  * amortize per partition, not per row.
  *
  * At scale this is the correct Spark shape for a side-effecting sink:
  * no driver involvement, no collect, task-level parallelism, and the
  * result Dataset feeds the A2/A4 success-count aggregation
  * (`count_success_uploads_for_client`) downstream.
  */
object UploadSink {
  def attemptAll(tasks: Dataset[UploadTask],
                 writer: UploadTask => Long,
                 maxAttempts: Int = Retry.DefaultAttempts,
                 backoffMs: Int => Long = Retry.defaultBackoffMs,
                 sleep: Long => Unit = Thread.sleep): Dataset[UploadResult] = {
    import tasks.sparkSession.implicits._
    tasks.mapPartitions { it =>
      it.map { t =>
        var attempts = 0
        try {
          val id = Retry.withRetry(maxAttempts, backoffMs, sleep) { () =>
            attempts += 1
            writer(t)
          }
          UploadResult(t.task_id, ok = true, Some(id), None, attempts)
        } catch {
          case e: Exception =>
            UploadResult(t.task_id, ok = false, None, Option(e.getMessage), attempts)
        }
      }
    }
  }
}
