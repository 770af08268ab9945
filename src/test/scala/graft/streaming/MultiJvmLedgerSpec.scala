package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The ledgered sink's exactly-once claim under REAL multi-JVM
  * executors: `local-cluster[2,2,1024]` launches two executor
  * PROCESSES, so nothing the dedup relies on can hide in driver-shared
  * memory — the anti-join read, the effect write and the marker append
  * all cross process boundaries, exactly as they would on a
  * 1000-executor cluster. LedgerSpec proves restart semantics across
  * sequential SparkContexts; this spec proves the distributed-state
  * claim the scaladoc makes ("no shared memory anywhere") by
  * observation instead of argument.
  */
class MultiJvmLedgerSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("item_id", LongType, nullable = false)))

  test("ledgered file sink applies effects exactly once on local-cluster[2,2,1024]") {
    // one SparkContext per JVM: park the shared local session first
    SparkTestSession.session.sparkContext.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // executor JVMs are spawned fresh and must see the same classpath
    // (graft classes + spark jars) this test JVM runs with
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-multijvm-ledger")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_mjvm").toFile.getAbsolutePath
      val input = s"$base/in"; val chk = s"$base/chk"
      val ledger = s"$base/ledger"; val effects = s"$base/fx"

      def arrive(ids: Range): Unit =
        ids.map(i => (i.toLong, i.toLong % 7)).toDF("event_id", "item_id")
          .coalesce(1).write.mode("append").parquet(input)
      def drain(): Unit = {
        val q = ProcessedLedger.startLedgeredFileSink(
          spark.readStream.schema(schema).parquet(input), chk, ledger, effects)
        try q.processAllAvailable() finally q.stop()
      }

      // really multi-JVM: wait for driver + 2 separate executor
      // processes to register (launch is async)
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      while (spark.sparkContext.statusTracker.getExecutorInfos.length < 3 &&
        System.nanoTime() < deadline) Thread.sleep(200)
      assert(spark.sparkContext.statusTracker.getExecutorInfos.length >= 3,
        "local-cluster executors did not register")

      arrive(1 to 40)
      drain()
      // a NEW file redelivers 21..40 (content the checkpoint's
      // file-offset tracking cannot dedup) and adds 41..60
      arrive(21 to 60)
      drain()

      val eff = spark.read.parquet(effects)
      assert(eff.count() === 60)
      assert(eff.select("event_id").distinct().count() === 60)
      assert(ProcessedLedger.count(spark, ledger) === 60)

      // Representative custom operators under REAL executor JVMs —
      // codegen'd image expressions, plan-constant Bloom masks and the
      // typed funnel fold all serialize to and execute on separate
      // processes, not just local threads.
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val scanned = Seq(1L, 2L, 3L).toDF("doc_id")
        .withColumn("img", graft.functions.ImageOps.synthImage(col("doc_id"), lit(24), lit(18)))
        .withColumn("info", graft.functions.ImageOps.imageInfo(
          graft.functions.ImageOps.scanMinimal(col("img"), "balanced")))
        .select(col("info.width")).as[Int].collect()
      assert(scanned.toSeq === Seq(24, 24, 24))

      val mask = graft.operators.Sketches.bloomMask(Seq("alpha", "beta").toDF("g"), col("g"), 4096, 4)
      val hits = Seq("alpha", "novel").toDF("g")
        .select(graft.functions.BloomCol.contains(
          graft.functions.Hashing.stableHash48(col("g"), 0),
          graft.functions.Hashing.stableHash48(col("g"), 1), mask, 4, 4096).as("h"))
        .as[Boolean].collect()
      assert(hits(0) === true)

      val sec = 1735725600L
      val funnel = graft.operators.Funnel.funnel(
        Seq((1L, "view", new java.sql.Timestamp(sec * 1000)),
          (1L, "click", new java.sql.Timestamp((sec + 60) * 1000)))
          .toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", Seq("view", "click"))
      assert(funnel.count() === 1)

      // round-8 additions under real executor JVMs: the fused GIF
      // analysis expression, the centroid classifier's train+score
      // joins, and the span-scrub rewrite's owner aggregates
      val gifLumas = Seq(5L).toDF("doc_id")
        .withColumn("gif", graft.functions.GifOps.synthGif(col("doc_id"), lit(3), lit(8), lit(6)))
        .select(size(graft.functions.GifOps.analyze(col("gif")).getField("lumas")))
        .as[Int].collect()
      assert(gifLumas.toSeq === Seq(3))

      val train = Seq((1L, "a a b", "x"), (2L, "c c d", "y")).toDF("doc_id", "text", "source")
      val pred = graft.operators.Classify.centroidClassify(
        Seq((10L, "a b")).toDF("doc_id", "text"), "doc_id", "text",
        graft.operators.Classify.classCentroids(train, "source", "text"))
        .select("pred").as[String].collect()
      assert(pred.toSeq === Seq("x"))

      val scrubbed = graft.operators.Rewrite.scrubRepeatedSpans(
        Seq((1L, "p q r s"), (2L, "p q z z")).toDF("doc_id", "text"), "doc_id", "text", 2)
        .filter(col("doc_id") === 2L).select("text_clean").as[String].collect()
      assert(scrubbed.toSeq === Seq("z z"))

      // trained-model operators under real executor JVMs: the iterative
      // PageRank loop (localCheckpoint per round crosses processes),
      // the BPE trainer's collect-and-replace loop, and one probe GD
      // step's broadcast-weights join
      val pr = graft.operators.Graph.pageRank(
        Seq("a", "b", "c").toDF("node"),
        Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst"),
        iters = 3)
      assert(pr.count() === 3)
      val (bpeMerges, _) = graft.operators.Bpe.train(
        Seq((1L, "ab ab ab")).toDF("doc_id", "text"), "text", steps = 1)
      assert(bpeMerges === Seq(graft.operators.Bpe.Merge(1, "a", "b", 3)))
      val probeFeat = graft.operators.Probe.features(
        Seq((1L, Seq.fill(64)(0.1f), 0), (2L, Seq.fill(64)(-0.1f), 1))
          .toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", 0).localCheckpoint(true)
      val probeW = graft.operators.Probe.train(probeFeat, steps = 2)
      assert(probeW.count() === 65)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
