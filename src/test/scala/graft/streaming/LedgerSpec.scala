package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the [[ProcessedLedger]] exactly-once contract holds across
  * SEPARATE SparkSessions (fresh SparkContext each) — the test an
  * in-JVM registry map cannot justify, because here every piece of
  * state the dedup relies on (checkpoint, ledger, effects) lives on
  * disk and the first session's JVM-side state is torn down with its
  * SparkContext before the second session starts.
  */
class LedgerSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("item_id", LongType, nullable = false)))

  private def writeEvents(spark: SparkSession, dir: String, ids: Range): Unit = {
    import spark.implicits._
    ids.map(i => (i.toLong, i.toLong % 7)).toDF("event_id", "item_id")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  private def runStream(spark: SparkSession, input: String, chk: String,
                        ledger: String, effects: String): Unit = {
    val q = ProcessedLedger.startLedgeredFileSink(
      spark.readStream.schema(schema).parquet(input), chk, ledger, effects)
    try q.processAllAvailable() finally q.stop()
  }

  test("exactly-once effects across two separate SparkSessions (restart + redelivered content)") {
    val base = java.nio.file.Files.createTempDirectory("graft_xsession").toFile.getAbsolutePath
    val input = s"$base/in"; val chk = s"$base/chk"
    val ledger = s"$base/ledger"; val effects = s"$base/fx"

    // --- session A: ids 1..50 flow through once ---
    val sA = SparkTestSession.session
    writeEvents(sA, input, 1 to 50)
    runStream(sA, input, chk, ledger, effects)
    assert(sA.read.parquet(effects).count() === 50)
    // driver "dies": the whole SparkContext goes away, and with it any
    // JVM-side state a registry map could have been hiding in
    sA.sparkContext.stop()

    // --- session B: a NEW file redelivers 26..50 and adds 51..75 ---
    // The checkpoint only dedups FILES/offsets; redelivered CONTENT in a
    // new file reaches foreachBatch and only the ledger anti-join can
    // drop it.
    val sB = SparkTestSession.session
    assert(sB ne sA)
    writeEvents(sB, input, 26 to 75)
    runStream(sB, input, chk, ledger, effects)

    val eff = sB.read.parquet(effects)
    assert(eff.count() === 75)                                   // no duplicates
    assert(eff.select("event_id").distinct().count() === 75)     // every id exactly once
    assert(ProcessedLedger.count(sB, ledger) === 75)
    // both sessions' batches contributed markers
    assert(ProcessedLedger.read(sB, ledger).select("batch_id").distinct().count() >= 2)
  }

  test("retry of a crash between effect and mark overwrites its own batch dir, never duplicates") {
    val spark = SparkTestSession.session
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_crash").toFile.getAbsolutePath
    val ledger = s"$base/ledger"; val effects = s"$base/fx"
    val batch = (1L to 10L).map(i => (i, i % 3)).toDF("event_id", "item_id")

    // effect ran, then the "driver crashed" before mark
    ProcessedLedger.fresh(batch, ledger).write.mode("overwrite").parquet(s"$effects/batch_id=7")
    // retry: the ledger is unchanged so the SAME fresh set is recomputed
    // and the per-batch overwrite replaces, not appends
    val fresh = ProcessedLedger.fresh(batch, ledger)
    assert(fresh.count() === 10)
    fresh.write.mode("overwrite").parquet(s"$effects/batch_id=7")
    ProcessedLedger.mark(fresh.select("event_id"), ledger, 7L)

    assert(spark.read.parquet(effects).count() === 10)
    // after the mark, nothing is fresh: a crash AFTER mark skips cleanly
    assert(ProcessedLedger.fresh(batch, ledger).isEmpty)
  }

  test("ledger primitives: absent dir is empty, mark records, fresh filters") {
    val spark = SparkTestSession.session
    import spark.implicits._
    val ledger = java.nio.file.Files.createTempDirectory("graft_prim").toFile.getAbsolutePath + "/l"
    assert(ProcessedLedger.count(spark, ledger) === 0)
    val batch = Seq((1L, 0L), (2L, 0L), (2L, 1L)).toDF("event_id", "item_id")
    ProcessedLedger.mark(batch.select("event_id"), ledger, 0L)
    assert(ProcessedLedger.count(spark, ledger) === 2)       // distinct keys only
    val next = Seq((2L, 0L), (3L, 0L)).toDF("event_id", "item_id")
    val fresh = ProcessedLedger.fresh(next, ledger).select("event_id").as[Long].collect()
    assert(fresh.toSeq === Seq(3L))
  }
}
