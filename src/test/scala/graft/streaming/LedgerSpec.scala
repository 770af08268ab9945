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

  test("horizon pruning: the per-batch read scans only partitions inside the horizon") {
    val spark = SparkTestSession.session
    import spark.implicits._
    val ledger = java.nio.file.Files.createTempDirectory("graft_hzn").toFile.getAbsolutePath + "/l"
    (0L to 4L).foreach { b =>
      ProcessedLedger.mark(Seq((b * 10, 0L)).toDF("event_id", "item_id").select("event_id"),
        ledger, b)
    }
    // data: only markers with batch_id >= 3 survive the pruned read …
    val pruned = ProcessedLedger.read(spark, ledger, minBatchId = 3L)
    assert(pruned.select("event_id").as[Long].collect().toSet === Set(30L, 40L))
    // … so a key marked BEYOND the horizon no longer joins: the event
    // is re-applied (the caller's redelivery window must cover it) —
    // while a key inside the horizon still dedups.
    val batch = Seq((10L, 0L), (40L, 0L), (99L, 0L)).toDF("event_id", "item_id")
    val fresh = ProcessedLedger.fresh(batch, ledger, minBatchId = 3L)
      .select("event_id").as[Long].collect().toSet
    assert(fresh === Set(10L, 99L))
    // and the pruning is PARTITION pruning, not a post-scan filter: the
    // horizon predicate lands in the scan's PartitionFilters, so only
    // the in-horizon partition directories are listed and read
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*batch_id[^\\]]*>= 3".r.findFirstIn(plan).isDefined,
      plan.take(1200))
  }

  test("compact folds old partitions into one without losing a marker") {
    val spark = SparkTestSession.session
    import spark.implicits._
    val ledger = java.nio.file.Files.createTempDirectory("graft_cmp").toFile.getAbsolutePath + "/l"
    (0L to 4L).foreach { b =>
      ProcessedLedger.mark(Seq((b * 10, 0L), (b * 10 + 1, 0L)).toDF("event_id", "item_id")
        .select("event_id"), ledger, b)
    }
    ProcessedLedger.compact(spark, ledger, upToBatchId = 3L)
    // every marker survives; the folded ones now carry the surviving batch id
    val after = ProcessedLedger.read(spark, ledger)
      .select("event_id", "batch_id").as[(Long, Long)].collect().toSet
    assert(after.map(_._1) === (0L to 4L).flatMap(b => Seq(b * 10, b * 10 + 1)).toSet)
    assert(after.map(_._2) === Set(3L, 4L))
    // exactly two partition dirs remain on disk
    val dirs = new java.io.File(ledger).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("batch_id=3", "batch_id=4"))
    // dedup still works through the compacted layout
    assert(ProcessedLedger.fresh(
      Seq((11L, 0L), (777L, 0L)).toDF("event_id", "item_id"), ledger)
      .select("event_id").as[Long].collect().toSeq === Seq(777L))
  }

  test("horizon + compactEvery keep the ledger layout flat while exactly-once holds") {
    val spark = SparkTestSession.session
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_cmpstream").toFile.getAbsolutePath
    val ledger = s"$base/ledger"; val effects = s"$base/fx"
    val mem = MemoryStream[(Long, Long)]
    val q = ProcessedLedger.startLedgeredFileSink(
      mem.toDF().toDF("event_id", "item_id"), s"$base/chk", ledger, effects,
      redeliveryHorizon = 2L, compactEvery = 2L)
    try (0 until 6).foreach { b =>
      mem.addData((b * 10L, 0L), (b * 10L + 1L, 0L))
      q.processAllAvailable()
    } finally q.stop()
    // compaction at batch 4 folded partitions 0-2 into batch_id=2: the
    // directory count stays flat (horizon window + one compacted dir)
    // instead of growing one dir per batch forever
    val dirs = new java.io.File(ledger).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("batch_id=2", "batch_id=3", "batch_id=4", "batch_id=5"), dirs)
    // no marker was lost and every effect landed exactly once
    assert(ProcessedLedger.count(spark, ledger) === 12)
    val eff = spark.read.parquet(effects)
    assert(eff.count() === 12 && eff.select("event_id").distinct().count() === 12)
  }

  test("mark fails fast on a non-Long or null key instead of silently voiding the contract") {
    val spark = SparkTestSession.session
    import spark.implicits._
    val ledger = java.nio.file.Files.createTempDirectory("graft_key").toFile.getAbsolutePath + "/l"
    val typed = intercept[IllegalArgumentException] {
      ProcessedLedger.mark(Seq("a-uuid").toDF("event_id"), ledger, 0L)
    }
    assert(typed.getMessage.contains("LongType"))
    val nulled = intercept[IllegalArgumentException] {
      ProcessedLedger.mark(Seq(Some(1L), None).toDF("event_id"), ledger, 0L)
    }
    assert(nulled.getMessage.contains("null"))
    // nothing was written by either failed mark
    assert(ProcessedLedger.count(spark, ledger) === 0)
  }
}
