package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** K4 — conditional status/text mutation (`Leyton_depot.py:594-633`).
  * The CONDITION lives upstream as a relational gate (A4: only clients
  * with `success > 0` appear in `updates`); the sink applies each row
  * with the K2 retry policy. Batch analog of the reference's
  * per-request mutation; in streaming the same call sits inside
  * foreachBatch.
  */
object StatusSink {
  def applyStatuses(updates: DataFrame, storeName: String,
                    maxAttempts: Int = Retry.DefaultAttempts,
                    backoffMs: Int => Long = Retry.defaultBackoffMs,
                    sleep: Long => Unit = Thread.sleep): Unit =
    updates.select("item_id", "new_status").foreachPartition { (it: Iterator[Row]) =>
      val store = DriveStore.get(storeName)
      it.foreach { r =>
        Retry.withRetry(maxAttempts, backoffMs, sleep) { () =>
          store.setStatus(r.getLong(0), r.getString(1))
        }
      }
    }
}
