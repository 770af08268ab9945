package graft.sinks

import graft.SparkSpec
import scala.collection.mutable

/** K1-K5 sink semantics: retry with linear backoff, per-row error
  * capture, idempotent get-or-create with oldest-wins race collapse,
  * conditional status mutation.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- Retry (K2)
  test("withRetry succeeds after transient failures and sleeps the linear backoff") {
    val sleeps = mutable.Buffer[Long]()
    var calls = 0
    val out = Retry.withRetry(maxAttempts = 3, sleep = sleeps.append(_)) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException(s"boom $calls")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 3)
    assert(sleeps.toSeq === Seq(1200L, 2400L)) // 1.2·(n+1) seconds
  }

  test("withRetry rethrows after maxAttempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetry(maxAttempts = 3, sleep = _ => ()) { () =>
        calls += 1; throw new RuntimeException("always")
      }
    }
    assert(e.getMessage === "always")
    assert(calls === 3)
  }

  // ------------------------------------------------------------- UploadSink (K1/K5)
  test("attemptAll captures failures as rows and retries transient errors") {
    DriveStore.drop("s1")
    val tasks = Seq(
      UploadTask(1L, 0L, "ok.pdf", "x"),
      UploadTask(2L, 0L, "flaky.pdf", "x"),
      UploadTask(3L, 0L, "dead.pdf", "x")).toDS()
    val flakyState = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val results = UploadSink.attemptAll(tasks, sleep = _ => (), writer = { t =>
      t.name match {
        case "dead.pdf" => throw new RuntimeException("permanent failure")
        case "flaky.pdf" =>
          val n = flakyState.merge(t.task_id, 1, (a, b) => a + b)
          if (n < 3) throw new RuntimeException("transient")
          DriveStore.get("s1").uploadFile(t.parent_id, t.name, t.payload.length.toLong)
        case _ => DriveStore.get("s1").uploadFile(t.parent_id, t.name, t.payload.length.toLong)
      }
    }).collect().sortBy(_.task_id)

    assert(results.map(r => (r.task_id, r.ok, r.attempts)).toSeq ===
      Seq((1L, true, 1), (2L, true, 3), (3L, false, 3)))
    assert(results(2).error.exists(_.contains("permanent failure")))
    assert(results.flatMap(_.file_id).distinct.length === 2)
    assert(DriveStore.get("s1").fileCount === 2)
  }

  // ------------------------------------------------------------- DriveStore (K3/W5)
  test("findOrCreateFolder is idempotent and races collapse oldest-wins") {
    DriveStore.drop("s2")
    val store = DriveStore.get("s2")
    val a = store.findOrCreateFolder(1L, "CLM_GE_07")
    val b = store.findOrCreateFolder(1L, "CLM_GE_07")
    assert(a === b)
    // Simulate the duplicate-creation race the reference defends against:
    // a second writer created the same folder concurrently.
    store.createFolder(1L, "CLM_GE_07")
    assert(store.listFolders(1L, "CLM_GE_07").size === 2)
    // Every subsequent get-or-create converges on the OLDEST folder.
    assert(store.findOrCreateFolder(1L, "CLM_GE_07") === a)
  }

  test("parallel findOrCreateFolder callers all converge on one winner") {
    DriveStore.drop("s3")
    val store = DriveStore.get("s3")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val ids = Await.result(
      Future.sequence((1 to 16).map(_ => Future(store.findOrCreateFolder(7L, "ACT_1_X")))),
      30.seconds).toSet
    pool.shutdown()
    // duplicates may have been created, but after convergence one id wins
    val winner = store.findOrCreateFolder(7L, "ACT_1_X")
    assert(store.listFolders(7L, "ACT_1_X").head.id === winner)
    assert(ids.forall(id => store.listFolders(7L, "ACT_1_X").map(_.id).contains(id)))
  }

  // ------------------------------------------------------------- IdempotentBatchSink
  test("idempotent batch sink: redelivered batch ids are skipped, readers see committed data once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    assert(IdempotentBatchSink.writeBatch(b0, dir, 0L) === true)
    assert(IdempotentBatchSink.writeBatch(b1, dir, 1L) === true)
    // failure-replay of batch 0 must be a no-op
    assert(IdempotentBatchSink.writeBatch(b0, dir, 0L) === false)
    val back = IdempotentBatchSink.readCommitted(spark, dir)
      .select("id").as[Long].collect().sorted
    assert(back.toSeq === Seq(1L, 2L, 3L))
  }

  // ------------------------------------------------------------- StatusSink (K4/A4)
  test("status updates gated by the A4 existence condition reach only qualifying items") {
    DriveStore.drop("s4")
    val results = Seq(
      (10L, true), (10L, false), (11L, false), (12L, true)).toDF("item_id", "ok")
    // A2/A4: success count per item, gate success > 0, then flip status.
    val updates = results.groupBy("item_id")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when($"ok", 1).otherwise(0)).as("succ"))
      .filter($"succ" > 0)
      .select($"item_id", org.apache.spark.sql.functions.lit("Done").as("new_status"))
    StatusSink.applyStatuses(updates, "s4", sleep = _ => ())
    val store = DriveStore.get("s4")
    assert(store.status(10L) === Some("Done"))
    assert(store.status(11L) === None)
    assert(store.status(12L) === Some("Done"))
    // idempotent re-apply
    StatusSink.applyStatuses(updates, "s4", sleep = _ => ())
    assert(store.status(10L) === Some("Done"))
  }
}
