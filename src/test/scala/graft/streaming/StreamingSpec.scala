package graft.streaming

import graft.SparkSpec
import graft.sinks.DriveStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** S8/§2.11 streaming semantics: MemoryStream replay through the
  * idempotent foreachBatch pipeline (redelivery applies once) and
  * watermarked windowed aggregation matching its batch analog.
  */
case class Ev(event_id: Long, item_id: Long, event_type: String, ts: Timestamp, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, item: Long, typ: String, minute: Int): Ev =
    Ev(id, item, typ, Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"), id * 1.5)

  test("idempotent foreachBatch pipeline: redelivered events apply exactly once") {
    EventPipeline.Processed.drop("st1")
    DriveStore.drop("st1")
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipeline.startIdempotentPipeline(mem.toDF(), "st1")
    try {
      mem.addData(ev(1, 100, "upload", 1), ev(2, 100, "upload", 2), ev(3, 200, "scan", 3))
      q.processAllAvailable()
      assert(EventPipeline.Processed.count("st1") === 3)
      // at-least-once redelivery: 2 and 3 arrive again plus a new event 4
      mem.addData(ev(2, 100, "upload", 2), ev(3, 200, "scan", 3), ev(4, 300, "sign", 4))
      q.processAllAvailable()
      assert(EventPipeline.Processed.count("st1") === 4)
      // the per-event side effect ran once per distinct item (K3 get-or-create)
      val store = DriveStore.get("st1")
      assert(store.listFolders(0L, "ITEM_100").size === 1)
      assert(store.listFolders(0L, "ITEM_200").size === 1)
      assert(store.listFolders(0L, "ITEM_300").size === 1)
    } finally q.stop()
  }

  test("sink metrics: listener snapshots per-batch applied/deduped counters") {
    EventPipeline.Processed.drop("st_m")
    DriveStore.drop("st_m")
    StreamMetrics.drop("st_m")
    implicit val ctx = spark.sqlContext
    val listener = new GraftQueryListener
    spark.streams.addListener(listener)
    val mem = MemoryStream[Ev]
    val q = EventPipeline.startIdempotentPipeline(mem.toDF(), "st_m")
    // listener events are ASYNC: poll until the expected snapshot lands
    def await(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
      assert(cond)
    }
    try {
      mem.addData(ev(1, 100, "upload", 1), ev(2, 100, "upload", 2))
      q.processAllAvailable()
      await(listener.latest("st_m").exists(s => s.applied == 2 && s.deduped == 0))
      // redelivery of 1 and 2 plus a new event 3: one applied, two deduped
      mem.addData(ev(1, 100, "upload", 1), ev(2, 100, "upload", 2), ev(3, 200, "scan", 3))
      q.processAllAvailable()
      await(listener.latest("st_m").exists(s => s.applied == 3 && s.deduped == 2))
      val snap = listener.latest("st_m").get
      assert(snap.inputRows === 3)         // engine-side rows of the last batch
      assert(snap.queryName === StreamMetrics.queryName("st_m"))
    } finally { q.stop(); spark.streams.removeListener(listener) }
  }

  test("deposit stream records applied/deduped through the same metrics surface") {
    DriveStore.drop("st_dm")
    StreamMetrics.drop("st_dm")
    val ledger = java.nio.file.Files.createTempDirectory("graft_ledger").toFile.getAbsolutePath + "/l"
    implicit val ctx = spark.sqlContext
    val clients = Seq((100L, "Ana")).toDF("id_monday", "nomcomplet")
    val cells = Seq(
      (100L, "col_factura", """{"files":[{"assetId":11,"name":"factura.pdf","createdAt":100}]}"""))
      .toDF("item_id", "column_id", "value")
    val rules = Seq(("col_factura", 1, Seq("factura"), Seq.empty[String], Seq("pdf"), "latest", Option.empty[Int]))
      .toDF("column_id", "priority", "include_any_of", "exclude_any_of", "file_types", "pick", "max")
    val default = Seq(("__default__", 1, Seq.empty[String], Seq.empty[String], Seq("pdf"), "latest", Option.empty[Int]))
      .toDF("column_id", "priority", "include_any_of", "exclude_any_of", "file_types", "pick", "max")
    val mem = MemoryStream[Ev]
    val q = EventPipeline.startDepositStream(mem.toDF(), clients, cells, rules, default, "st_dm", ledger)
    try {
      mem.addData(ev(1, 100, "depot", 1))
      q.processAllAvailable()
      mem.addData(ev(1, 100, "depot", 1)) // pure redelivery batch
      q.processAllAvailable()
      val c = StreamMetrics.countersFor(spark, "st_dm")
      assert(c.applied.value === 1 && c.deduped.value === 1)
    } finally q.stop()
  }

  test("streaming deposit pipeline: new events trigger uploads, redelivery does not") {
    DriveStore.drop("st3")
    val ledger = java.nio.file.Files.createTempDirectory("graft_ledger").toFile.getAbsolutePath + "/l"
    implicit val ctx = spark.sqlContext
    val clients = Seq((100L, "Ana"), (200L, "Bob")).toDF("id_monday", "nomcomplet")
    val cells = Seq(
      (100L, "col_factura", """{"files":[{"assetId":11,"name":"factura.pdf","createdAt":100}]}"""),
      (200L, "col_factura", """{"files":[{"assetId":21,"name":"factura.pdf","createdAt":100}]}"""))
      .toDF("item_id", "column_id", "value")
    val rules = Seq(("col_factura", 1, Seq("factura"), Seq.empty[String], Seq("pdf"), "latest", Option.empty[Int]))
      .toDF("column_id", "priority", "include_any_of", "exclude_any_of", "file_types", "pick", "max")
    val default = Seq(("__default__", 1, Seq.empty[String], Seq.empty[String], Seq("pdf"), "latest", Option.empty[Int]))
      .toDF("column_id", "priority", "include_any_of", "exclude_any_of", "file_types", "pick", "max")
    val mem = MemoryStream[Ev]
    val q = EventPipeline.startDepositStream(mem.toDF(), clients, cells, rules, default, "st3", ledger)
    try {
      mem.addData(ev(1, 100, "depot", 1))
      q.processAllAvailable()
      val store = DriveStore.get("st3")
      assert(store.fileCount === 1)
      assert(store.status(100L) === Some("Livré"))
      // redelivered event: no new upload; new event for item 200: one more
      mem.addData(ev(1, 100, "depot", 1), ev(2, 200, "depot", 2))
      q.processAllAvailable()
      assert(store.fileCount === 2)
      assert(store.status(200L) === Some("Livré"))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-item counters across micro-batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val typed = mem.toDF().as[StreamEvent]
    val q = EventPipeline.statefulItemCounters(typed)
      .writeStream.outputMode("update").format("memory").queryName("counters").start()
    try {
      mem.addData(Ev(1, 100, "upload", ts(1), 2.0), Ev(2, 100, "error", ts(2), 3.0),
        Ev(3, 200, "upload", ts(3), 5.0))
      q.processAllAvailable()
      mem.addData(Ev(4, 100, "upload", ts(4), 10.0))
      q.processAllAvailable()
      // latest state per item (update mode appends each revision; take the max-n row)
      val last = spark.table("counters")
        .groupBy("item_id")
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct("n_events", "n_errors", "total_value")).as("s"))
        .select("item_id", "s.n_events", "s.n_errors", "s.total_value")
        .as[(Long, Long, Long, Double)].collect()
        .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
      assert(last(100L) === ((3L, 1L, 15.0)))
      assert(last(200L) === ((1L, 0L, 5.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState dedups redelivered event ids inside the engine") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipeline.statefulDedup(mem.toDF().as[StreamEvent])
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    try {
      mem.addData(Ev(1, 100, "a", ts(1), 1.0), Ev(2, 100, "a", ts(2), 1.0))
      q.processAllAvailable()
      mem.addData(Ev(2, 100, "a", ts(2), 1.0), Ev(3, 200, "a", ts(3), 1.0)) // 2 redelivered
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("statefulDedup evicts per-id state at the redelivery horizon; past it, exactly-once re-admission") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipeline.statefulDedup(mem.toDF().as[StreamEvent], "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("hdedup").start()
    try {
      mem.addData(Ev(5, 100, "a", ts(1), 1.0), Ev(1, 100, "a", ts(1), 1.0))
      q.processAllAvailable() // watermark still before ts(1)+10
      mem.addData(Ev(6, 200, "a", ts(30), 1.0), Ev(1, 100, "a", ts(2), 1.0)) // 1 redelivered in-horizon
      q.processAllAvailable() // watermark → 10:20, past id 5/1's 10:11 deadline
      mem.addData(Ev(7, 200, "a", ts(31), 1.0)) // drives the timeout batch
      q.processAllAvailable()
      mem.addData(Ev(5, 100, "a", ts(25), 1.0)) // past-horizon redelivery: state evicted → re-admits ONCE
      q.processAllAvailable()
      mem.addData(Ev(5, 100, "a", ts(26), 1.0)) // second redelivery inside the NEW horizon: suppressed
      q.processAllAvailable()
      val ids = spark.table("hdedup").select("event_id").as[Long].collect().toSeq.sorted
      assert(ids === Seq(1L, 5L, 5L, 6L, 7L))
    } finally q.stop()
  }

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("bounded-state dedup drops redeliveries within the watermark horizon") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipeline.statefulDedupBounded(mem.toDF().as[StreamEvent], "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("bdedup").start()
    try {
      mem.addData(Ev(1, 100, "a", ts(1), 1.0), Ev(2, 100, "a", ts(2), 1.0))
      q.processAllAvailable()
      mem.addData(Ev(2, 100, "a", ts(2), 1.0), Ev(3, 200, "a", ts(3), 1.0)) // 2 redelivered
      q.processAllAvailable()
      val ids = spark.table("bdedup").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally { q.stop(); spark.catalog.dropTempView("bdedup") }
  }

  test("streaming URL dedup collapses canonical variants at arrival; non-URLs pass through") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val q = EventPipeline.streamingUrlDedup(
        mem.toDF().toDF("url", "ts"), "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("urldedup").start()
    try {
      mem.addData(
        ("https://site5.com/doc/9", ts(1)),
        ("HTTPS://WWW.SITE5.COM:443/doc/9/#frag", ts(2)), // same canonical target
        ("not a url", ts(3)))
      q.processAllAvailable()
      // a later batch redelivers the target with different noise, plus
      // one genuinely new target and a second non-URL row
      mem.addData(
        ("https://site5.com/doc/9?utm_source=feed", ts(4)),
        ("https://site6.com/doc/1", ts(5)),
        ("also not a url", ts(6)),
        ("not a url", ts(7))) // IDENTICAL garbage re-arrives: still passes through
      q.processAllAvailable()
      val got = spark.table("urldedup").select("url").as[String].collect().toList.sorted
      assert(got === List(
        "also not a url",
        "https://site5.com/doc/9", // first arrival of the target wins
        "https://site6.com/doc/1",
        "not a url", "not a url")) // non-URL rows NEVER collapse (no shared key)
    } finally { q.stop(); spark.catalog.dropTempView("urldedup") }
  }

  test("streaming frontier: dedup → blocklist → rank-aware cap is arrival-order invariant") {
    implicit val ctx = spark.sqlContext
    val blocklist = Seq("sitea.com").toDF("domain")
    // siteC.com is ranked: effCap = k(1) + 2000/1000 = 3 slots; siteB gets 1
    val ranks = Seq(("sitec.com", 4L, 2000L)).toDF("node", "out_deg", "rank_ppm")
    // logical input: siteA (blocklisted, 2 targets), siteB (3 distinct
    // targets + 1 canonical duplicate), siteC (3 distinct targets), one non-URL
    val pages = Seq(
      (1L, "https://siteA.com/x"),
      (2L, "https://siteA.com/y"),
      (3L, "https://siteB.com/p1"),
      (4L, "HTTPS://WWW.SITEB.COM:443/p1/"), // canon-dup of 3
      (5L, "https://siteB.com/p2"),
      (6L, "https://siteB.com/p3"),
      (7L, "https://siteC.com/q1"),
      (8L, "https://siteC.com/q2?utm_source=f"),
      (9L, "https://siteC.com/q3"),
      (10L, "not a url"))
    def run(name: String, batches: Seq[Seq[(Long, String)]]): Map[String, Int] = {
      val mem = MemoryStream[(Long, String, Timestamp)]
      val q = EventPipeline.streamingFrontier(
          mem.toDF().toDF("doc_id", "url", "ts"), blocklist, ranks, k = 1)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        batches.foreach { b =>
          mem.addData(b.map { case (id, u) => (id, u, ts(id.toInt)) }: _*)
          q.processAllAvailable()
        }
        val out = spark.table(name).as[FrontierPage].collect()
        assert(out.forall(_.domain != "sitea.com"), "blocklisted domain admitted")
        assert(out.map(_.canon_url).distinct.length === out.length, "duplicate canon admitted")
        out.groupBy(_.domain).view.mapValues(_.length).toMap
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
    // order 1: everything in one batch; order 2: reversed, three slices
    val one = run("frontier1", Seq(pages))
    val two = run("frontier2", pages.reverse.grouped(4).toSeq)
    // slicing-invariant: per-domain admitted COUNT = min(effCap, targets)
    val want = Map("siteb.com" -> 1, "sitec.com" -> 3)
    assert(one === want)
    assert(two === want)
  }

  test("streaming frontier: a hot-domain burst admits the `room` smallest doc_ids (bounded fold)") {
    implicit val ctx = spark.sqlContext
    val blocklist = Seq.empty[String].toDF("domain")
    // effCap = k(2) + 3000/1000 = 5 slots for siteh.com
    val ranks = Seq(("siteh.com", 1L, 3000L)).toDF("node", "out_deg", "rank_ppm")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = EventPipeline.streamingFrontier(
        mem.toDF().toDF("doc_id", "url", "ts"), blocklist, ranks, k = 2)
      .writeStream.outputMode("append").format("memory").queryName("frontier_hot").start()
    try {
      // one batch, one domain, 200 distinct targets in shuffled order:
      // admissions must be exactly the 5 smallest doc_ids, emitted ascending
      val burst = new scala.util.Random(7).shuffle((1L to 200L).toList)
        .map(i => (i, s"https://siteH.com/p$i", ts(1)))
      mem.addData(burst: _*)
      q.processAllAvailable()
      val got = spark.table("frontier_hot").as[FrontierPage].collect().map(_.doc_id).toList
      assert(got.sorted === List(1L, 2L, 3L, 4L, 5L))
      // a second burst admits nothing: the lifetime cap is already spent
      mem.addData((201L to 210L).map(i => (i, s"https://siteH.com/q$i", ts(2))): _*)
      q.processAllAvailable()
      assert(spark.table("frontier_hot").count() === 5)
    } finally { q.stop(); spark.catalog.dropTempView("frontier_hot") }
  }

  test("streaming frontier: robots stage drops disallowed paths before the cap") {
    implicit val ctx = spark.sqlContext
    val blocklist = Seq.empty[String].toDF("domain")
    val ranks = Seq(("sitec.com", 1L, 9000L)).toDF("node", "out_deg", "rank_ppm")
    // siteC disallows /q* except /q2; siteB has NO robots row → allowed
    val robots = Seq(("sitec.com",
      "User-agent: *\nDisallow: /q\nAllow: /q2\n")).toDF("domain", "robots_txt")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = EventPipeline.streamingFrontier(
        mem.toDF().toDF("doc_id", "url", "ts"), blocklist, ranks, k = 5,
        robots = Some(robots))
      .writeStream.outputMode("append").format("memory").queryName("frontier_rb").start()
    try {
      mem.addData(
        (1L, "https://siteC.com/q1", ts(1)), // disallowed
        (2L, "https://siteC.com/q2?a=1", ts(2)), // longer Allow wins
        (3L, "https://siteC.com/other", ts(3)), // no rule → allowed
        (4L, "https://siteB.com/q9", ts(4))) // no robots row → allowed
      q.processAllAvailable()
      val got = spark.table("frontier_rb").as[FrontierPage].collect().map(_.doc_id).toSet
      assert(got === Set(2L, 3L, 4L))
    } finally { q.stop(); spark.catalog.dropTempView("frontier_rb") }
  }

  test("streaming frontier: Crawl-delay spaces admissions by event time; deferred pages release, never drop") {
    implicit val ctx = spark.sqlContext
    val blocklist = Seq.empty[String].toDF("domain")
    val ranks = Seq.empty[(String, Long, Long)].toDF("node", "out_deg", "rank_ppm")
    // sited.com declares a 10-minute crawl delay; sitee.com none
    val robots = Seq(("sited.com",
      "User-agent: *\nAllow: /\nCrawl-delay: 600\n")).toDF("domain", "robots_txt")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = EventPipeline.streamingFrontier(
        mem.toDF().toDF("doc_id", "url", "ts"), blocklist, ranks, k = 5,
        horizon = "0 seconds", robots = Some(robots))
      .writeStream.outputMode("append").format("memory").queryName("frontier_pol").start()
    try {
      // one batch: pages at t=0, t=1min, t=30min. Gate: t0 admits
      // (next-eligible 10min), t1 DEFERS (inside the window), t30
      // admits (next-eligible 40min)
      mem.addData(
        (1L, "https://siteD.com/a", ts(0)),
        (2L, "https://siteD.com/b", ts(1)),
        (3L, "https://siteD.com/c", ts(30)))
      q.processAllAvailable()
      assert(spark.table("frontier_pol").as[FrontierPage].collect()
        .map(_.doc_id).toSet === Set(1L, 3L))
      // advancing event time past the gate (another domain's arrival
      // moves the watermark to 55min ≥ 40min) RELEASES the deferral —
      // at most one page per 10min of event time, and nothing dropped
      mem.addData((4L, "https://siteE.com/x", ts(55)))
      q.processAllAvailable()
      val all = spark.table("frontier_pol").as[FrontierPage].collect()
      assert(all.map(_.doc_id).toSet === Set(1L, 2L, 3L, 4L))
      assert(all.count(_.domain == "sited.com") === 3)
    } finally { q.stop(); spark.catalog.dropTempView("frontier_pol") }
  }

  test("stream-stream join correlates events within the time window only") {
    implicit val ctx = spark.sqlContext
    val uploads = MemoryStream[Ev]
    val scans = MemoryStream[Ev]
    val q = EventPipeline.correlatedEvents(uploads.toDF(), scans.toDF())
      .writeStream.outputMode("append").format("memory").queryName("corr").start()
    try {
      uploads.addData(ev(1, 100, "upload", 1), ev(2, 200, "upload", 2))
      scans.addData(
        ev(10, 100, "scan", 5),  // within 10 min of upload@1   -> joins
        ev(11, 100, "scan", 30), // 29 min later                -> outside window
        ev(12, 300, "scan", 3))  // other item                  -> no match
      q.processAllAvailable()
      val got = spark.table("corr").select("item_id", "left_event", "right_event")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((100L, 1L, 10L)))
    } finally { q.stop(); spark.catalog.dropTempView("corr") }
  }

  test("streaming sessionization closes sessions by event-time gap, never wall-clock") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessEvent]
    val gapUs = 5L * 60 * 1000000 // 5 min, as in the batch q_sessionize shape
    val q = EventPipeline.streamingSessionize(mem.toDS(), gapUs, watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    def us(minute: Int) = ts(minute).getTime * 1000L
    try {
      // user 1: gap inside one batch splits immediately; a later open tail stays
      mem.addData(SessEvent(1, ts(0)), SessEvent(1, ts(2)), SessEvent(1, ts(20)), SessEvent(2, ts(1)))
      q.processAllAvailable()
      // watermark is now 10:20 → user 2's 10:01 session times out next batch
      mem.addData(SessEvent(3, ts(40)))
      q.processAllAvailable()
      // watermark 10:40 → user 1's 10:20 tail times out in one more batch
      mem.addData(SessEvent(3, ts(41)))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[SessionOut].collect().toSet
      assert(got.contains(SessionOut(1L, us(0), us(2), 2)))   // split by in-batch gap
      assert(got.contains(SessionOut(2L, us(1), us(1), 1)))   // closed by watermark timeout
      assert(got.contains(SessionOut(1L, us(20), us(20), 1))) // tail closed two batches later
      // user 3's session is still open: nothing emitted for it
      assert(!got.exists(_.user_id == 3L))
    } finally { q.stop(); spark.catalog.dropTempView("sess_out") }
  }

  test("sessionization merges a late within-watermark event BACKWARDS (start extends)") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessEvent]
    val gapUs = 5L * 60 * 1000000
    val q = EventPipeline.streamingSessionize(mem.toDS(), gapUs, watermark = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess_late").start()
    def us(minute: Int) = ts(minute).getTime * 1000L
    try {
      mem.addData(SessEvent(1, ts(10)))
      q.processAllAvailable()
      // ts(8) is LATE (older than the open session) but inside the
      // 30-min watermark: it must extend the session's start backwards,
      // not vanish into a start=10 session. ts(50) drags the watermark
      // past end+gap so the session can time out.
      mem.addData(SessEvent(1, ts(8)), SessEvent(9, ts(50)))
      q.processAllAvailable()
      mem.addData(SessEvent(9, ts(51))) // timeout fires the batch after the watermark moves
      q.processAllAvailable()
      val got = spark.table("sess_late").as[SessionOut].filter(_.user_id == 1L).collect().toSet
      assert(got === Set(SessionOut(1L, us(8), us(10), 2)))
    } finally { q.stop(); spark.catalog.dropTempView("sess_late") }
  }

  test("sessionization does NOT false-merge an event more than gap before the session") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessEvent]
    val gapUs = 5L * 60 * 1000000
    val q = EventPipeline.streamingSessionize(mem.toDS(), gapUs, watermark = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess_old").start()
    def us(minute: Int) = ts(minute).getTime * 1000L
    try {
      mem.addData(SessEvent(1, ts(20)))
      q.processAllAvailable()
      // ts(5) is within the watermark but 15 min BEFORE the open
      // session's start — more than the 5-min gap. `t - end <= gap` is
      // trivially true for any pre-session event, so the false-merge
      // regression produced ONE inflated [5, 20] session here; correct
      // behavior is a closed singleton plus the untouched open session.
      mem.addData(SessEvent(1, ts(5)), SessEvent(9, ts(60)))
      q.processAllAvailable()
      mem.addData(SessEvent(9, ts(61))) // advance watermark → session [20,20] times out
      q.processAllAvailable()
      val got = spark.table("sess_old").as[SessionOut].filter(_.user_id == 1L).collect().toSet
      assert(got === Set(SessionOut(1L, us(5), us(5), 1), SessionOut(1L, us(20), us(20), 1)))
    } finally { q.stop(); spark.catalog.dropTempView("sess_old") }
  }

  test("streaming funnel advances stages in order and matches the batch funnel") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val stages = Seq("view", "click", "purchase")
    val q = EventPipeline.streamingFunnel(mem.toDS(), stages)
      .writeStream.outputMode("update").format("memory").queryName("funnel_out").start()
    def us(minute: Int) = ts(minute).getTime * 1000L
    try {
      // user 1: view+click in one batch (two stages in one fold);
      // user 2: purchase BEFORE any view -> no progress
      mem.addData(
        FunnelEvent(1, "view", ts(1)), FunnelEvent(1, "click", ts(3)),
        FunnelEvent(2, "purchase", ts(2)))
      q.processAllAvailable()
      // user 1 purchases next batch; a duplicate click must not re-emit
      mem.addData(FunnelEvent(1, "purchase", ts(9)), FunnelEvent(1, "click", ts(4)))
      q.processAllAvailable()
      val got = spark.table("funnel_out").as[FunnelProgress].collect().toSeq
      val byBatch = got.filter(_.user_id == 1L).sortBy(_.stage_reached)
      assert(byBatch.map(_.stage_reached) === Seq(2, 3))
      assert(byBatch.last.stage_times_us === Seq(us(1), us(3), us(9)))
      assert(!got.exists(_.user_id == 2L))
      // parity with the batch operator on the same (in-order) events
      val batch = graft.operators.Funnel.funnel(
        Seq((1L, "view", ts(1)), (1L, "click", ts(3)), (1L, "click", ts(4)),
          (1L, "purchase", ts(9)), (2L, "purchase", ts(2)))
          .toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", stages)
      val b1 = batch.filter($"user_id" === 1L).head
      assert(b1.getAs[Int]("stage_reached") === 3)
      assert(Seq(b1.getLong(1), b1.getLong(2), b1.getLong(3)) === Seq(us(1), us(3), us(9)))
    } finally { q.stop(); spark.catalog.dropTempView("funnel_out") }
  }

  test("streamingFunnel abandons a funnel at the conversion deadline; reappearance restarts") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = EventPipeline.streamingFunnel(mem.toDS(), Seq("view", "click"), "10 minutes")
      .writeStream.outputMode("update").format("memory").queryName("funnel_ttl").start()
    try {
      mem.addData(FunnelEvent(1, "view", ts(1))) // user 1 reaches stage 1 at 10:01
      q.processAllAvailable()
      mem.addData(FunnelEvent(2, "view", ts(30))) // watermark → 10:20, past 10:11
      q.processAllAvailable()
      mem.addData(FunnelEvent(2, "click", ts(31))) // drives the timeout batch: user 1 abandoned
      q.processAllAvailable()
      // if user 1's state had survived, this click would complete stage 2;
      // abandoned, it matches nothing (a fresh funnel starts at "view")
      mem.addData(FunnelEvent(1, "click", ts(25)))
      q.processAllAvailable()
      mem.addData(FunnelEvent(1, "view", ts(26))) // fresh funnel restarts at stage 1
      q.processAllAvailable()
      val u1 = spark.table("funnel_ttl").as[FunnelProgress]
        .filter(_.user_id == 1L).collect().toSeq.sortBy(_.stage_times_us.head)
      assert(u1.map(_.stage_reached) === Seq(1, 1)) // two stage-1 rows, never stage 2
      assert(u1.map(_.stage_times_us.head) === Seq(ts(1).getTime * 1000L, ts(26).getTime * 1000L))
    } finally { q.stop(); spark.catalog.dropTempView("funnel_ttl") }
  }

  test("statefulItemCounters evicts idle items at the activity horizon with a final flush") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipeline.statefulItemCounters(mem.toDF().as[StreamEvent], "10 minutes")
      .writeStream.outputMode("update").format("memory").queryName("counters_ttl").start()
    try {
      mem.addData(Ev(1, 100, "upload", ts(1), 2.0), Ev(2, 100, "error", ts(2), 3.0))
      q.processAllAvailable() // item 100: n=2, last activity 10:02
      mem.addData(Ev(3, 200, "upload", ts(30), 5.0)) // watermark → 10:20, past 10:12
      q.processAllAvailable()
      mem.addData(Ev(4, 200, "upload", ts(31), 1.0)) // drives the timeout batch: 100 flushes + evicts
      q.processAllAvailable()
      mem.addData(Ev(5, 100, "upload", ts(25), 7.0)) // reappears past horizon: restarts from zero
      q.processAllAvailable()
      val rows = spark.table("counters_ttl")
        .as[ItemCounter].collect().toSeq.filter(_.item_id == 100L)
      // batch row (n=2), final eviction flush (n=2), fresh restart (n=1)
      assert(rows.map(_.n_events).sorted === Seq(1L, 2L, 2L))
      assert(rows.filter(_.n_events == 1L).head.total_value === 7.0)
    } finally { q.stop(); spark.catalog.dropTempView("counters_ttl") }
  }

  test("file-source replay of events.parquet matches the batch windowed aggregation") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventPipeline.readEventStream(spark, dir)
    val q = EventPipeline.windowedCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("replay").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("replay")
        .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      val batchTotal = graft.Tables.events(spark, dir).count()
      assert(streamed === batchTotal)
      val batchBuckets = EventPipeline.windowedCounts(graft.Tables.events(spark, dir)).count()
      assert(spark.table("replay").count() === batchBuckets)
    } finally q.stop()
  }

  test("checkpointed file sink: restart resumes from offsets without duplicating output") {
    val src = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft_chk").toFile.getAbsolutePath
    val out = s"$base/out"; val chk = s"$base/chk"
    def start() = EventPipeline.readEventStream(spark, src).select("event_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", chk)
      .format("parquet").option("path", out)
      .start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart against the SAME checkpoint: offsets say everything is
    // processed, so the restarted query must emit nothing new — the
    // exactly-once contract of checkpoint + transactional file sink.
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val total = graft.Tables.events(spark, src).count()
    val written = spark.read.parquet(out)
    assert(written.count() === total)
    assert(written.distinct().count() === total)
  }

  test("streaming windowed counts equal the batch aggregation on the same data") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = Seq(
      ev(1, 1, "a", 1), ev(2, 1, "a", 2), ev(3, 1, "b", 4),
      ev(4, 1, "a", 7), ev(5, 1, "b", 8), ev(6, 1, "b", 9))
    val q = EventPipeline.windowedCounts(mem.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("wc").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("wc")
        .select("bucket_start", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = EventPipeline.windowedCounts(events.toDF())
        .select("bucket_start", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.toSeq.map(_._3).sum === 6L)
    } finally q.stop()
  }

  test("streaming bounded-state distinct sketch equals the batch sketch arithmetic") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // items 1/2/3 in the first window (item 2 twice — dedup must fold
    // it), item 1 alone in a later window
    val events = Seq(
      ev(1, 1, "a", 1), ev(2, 2, "a", 2), ev(3, 2, "a", 3), ev(4, 3, "a", 4),
      ev(5, 1, "a", 7))
    val q = EventPipeline.windowedDistinctSketch(mem.toDF(), "item_id", bins = 64)
      .writeStream.outputMode("complete").format("memory").queryName("wds").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("wds")
        .select("bucket_start", "event_type", "occupied")
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = EventPipeline.windowedDistinctSketch(events.toDF(), "item_id", bins = 64)
        .select("bucket_start", "event_type", "occupied")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamed === batch)
      // 3 distinct items hash to ≤3 slots in window 1; exactly 1 in window 2
      val occ = streamed.toSeq.sortBy(_._1.getTime).map(_._3)
      assert(occ.size === 2 && occ.last === 1L && occ.head >= 2L && occ.head <= 3L)
    } finally q.stop()
  }

  test("streaming count-min counters equal the batch sketch after any number of micro-batches") {
    // linearity in action: the stream's running (r, bucket) sums are
    // the batch sketch of everything seen — no watermark, state bounded
    // at depth x width by construction
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[String]
    val w = 32
    val q = EventPipeline.streamingCmSketch(mem.toDF(), "value", w)
      .writeStream.outputMode("complete").format("memory").queryName("cms").start()
    val batch1 = Seq("a", "a", "b", "c")
    val batch2 = Seq("b", "d", "a")
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms").as[(Int, Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.cmSketch(
        (batch1 ++ batch2).toDF("value"),
        org.apache.spark.sql.functions.col("value"), w)
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally { q.stop(); spark.catalog.dropTempView("cms") }
  }

  test("streaming incremental dedup: any micro-batch slicing equals the one-shot batch run") {
    // pairs are strictly delta × corpus and stop-gram stats come from
    // the corpus alone, so arrival slicing cannot change the result
    implicit val ctx = spark.sqlContext
    val wordsA = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val nearOther = other.replace("z1 ", "q1 ")
    val corpus = Seq((2L, wordsA), (4L, other)).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val out = java.nio.file.Files.createTempDirectory("inc_dedup").toString
    val q = EventPipeline.startIncrementalDedup(
      mem.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text", 5, 0.5,
      maxShingleDf = None, outPath = out)
    try {
      mem.addData((1L, wordsA))
      q.processAllAvailable()
      mem.addData((3L, wordsA), (5L, nearOther))
      q.processAllAvailable()
      val cols = Seq("new_id", "old_id", "inter", "n_new", "n_old", "jaccard")
      val streamed = spark.read.parquet(out)
        .select(cols.head, cols.tail: _*)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      val batch = graft.operators.Dedup.incrementalNearDups(
        Seq((1L, wordsA), (3L, wordsA), (5L, nearOther)).toDF("doc_id", "text"),
        corpus, "doc_id", "text", 5, 0.5, maxShingleDf = None)
        .select(cols.head, cols.tail: _*)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(streamed === batch)
      assert(streamed.map(p => (p._1, p._2)) === Set((1L, 2L), (3L, 2L), (5L, 4L)))
    } finally q.stop()
  }

  test("streaming quality filter with a frozen reference equals batch scoring on any slicing") {
    implicit val ctx = spark.sqlContext
    // reference corpus: "the" dominates, so the-heavy docs score high
    val ref = Seq((100L, "the the the the a"), (101L, "the a b"))
      .toDF("doc_id", "text")
    val rel = graft.operators.Curation.referenceRel(ref, "text")
    val arrivals = Seq(
      (1L, "the the a"), // high score
      (2L, "b b b"), // low score
      (3L, "the oov oov"), // OOV-diluted
      (4L, "the the the")) // top score
    val mem = MemoryStream[(Long, String)]
    val out = java.nio.file.Files.createTempDirectory("qfilter").toString
    val min = 300000000L
    val q = EventPipeline.startQualityFilter(
      mem.toDF().toDF("doc_id", "text"), rel, min, out)
    try {
      mem.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      mem.addData(arrivals.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("doc_id", "n_tok", "score_ppb")
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.operators.Curation
        .scoreWithReference(arrivals.toDF("doc_id", "text"), "doc_id", "text", rel)
        .filter($"score_ppb" >= min)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      // the the-heavy docs pass, pure-OOV/rare docs are filtered
      assert(streamed.map(_._1) === Set(1L, 4L))
    } finally q.stop()
  }

  test("streaming code filter equals batch curation on any slicing; autogen files drop") {
    implicit val ctx = spark.sqlContext
    val files = Seq(
      (1L, "a.py", "# c\nx = 1  # t\nprint(x)\n"), // kept
      (2L, "gen.go", "// Code generated by tool. DO NOT EDIT.\npackage p\n"), // autogen → dropped
      (3L, "README.md", "# Title\n\nBody with [link](u).\n"), // kept, markdown route
      (4L, "wide.js", "var x = 1; // " + ("y" * 200) + "\nvar z = \"" + ("w" * 200) + "\";\n")) // >120-char line survives stripping → dropped
    val mem = MemoryStream[(Long, String, String)]
    val out = java.nio.file.Files.createTempDirectory("codefilter").toString
    val q = EventPipeline.startCodeFilter(
      mem.toDF().toDF("doc_id", "path", "content"), maxLine = 120L, outPath = out)
    try {
      mem.addData(files.take(1): _*)
      q.processAllAvailable()
      mem.addData(files.drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("doc_id", "path", "lang", "text", "n_lines")
        .as[(Long, String, String, String, Long)].collect().toSet
      val batch = graft.operators.CodeCuration
        .curate(files.toDF("doc_id", "path", "content"), "path", "content", 120L)
        .filter($"kept")
        .select($"doc_id", $"path", $"lang", $"text", $"m.n_lines".as("n_lines"))
        .as[(Long, String, String, String, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.map(_._1) === Set(1L, 3L))
      assert(streamed.map(r => r._1 -> r._3).toMap === Map(1L -> "python", 3L -> "markdown"))
    } finally q.stop()
  }

  test("streaming corpus ingest equals batch dispatch+extract+quality on any slicing") {
    implicit val ctx = spark.sqlContext
    import graft.sources.{GzipShard, OfficeCodec, PdfText, WarcCodec, WikiCodec, XzCodec, ZstdCodec}
    // mixed shard: 2-page docs pass the 10-word floor, 1-page
    // docx/pptx fail it, garbage bytes extract to null and drop; the
    // round-13 formats (MediaWiki dump, .jsonl.gz) and round-14
    // formats (.jsonl.zst, WET extract) ride the SAME dispatch, so
    // the batch-equality proof covers them for free
    val docs: Seq[(Long, Array[Byte])] = Seq(
      1L -> PdfText.composeTextFixture(11L, 2),
      2L -> OfficeCodec.composeDocx(22L, 2),
      3L -> OfficeCodec.composePptx(33L, 1), // 8 words → quality-dropped
      4L -> OfficeCodec.composeEpub(44L, 2),
      5L -> Array[Byte](0, 1, 2, 3), // binary → null text → dropped
      6L -> OfficeCodec.composeDocx(66L, 1), // 9 words → quality-dropped
      7L -> WikiCodec.synthWikiDump(77L, 2).getBytes("UTF-8"),
      8L -> GzipShard.synthJsonlGz(88L, 2, 3),
      9L -> ZstdCodec.synthJsonlZst(99L, 2, 3),
      10L -> WarcCodec.encodeGz(Seq(
        WarcCodec.WarcRecord("warcinfo", "https://w.example", "2026-02-01T00:00:00Z",
          "software: graft-wet/1.0".getBytes("UTF-8")),
        WarcCodec.WarcRecord("conversion", "https://w.example/a", "2026-02-01T00:00:00Z",
          "wet extract body with eleven words of plain prose right here".getBytes("UTF-8")))),
      11L -> XzCodec.synthJsonlXz(111L, 2, 3))
    val mem = MemoryStream[(Long, Array[Byte])]
    val out = java.nio.file.Files.createTempDirectory("corpusingest").toString
    val q = EventPipeline.startCorpusIngest(
      mem.toDF().toDF("doc_id", "payload"), minWords = 10L, outPath = out)
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      // a same-id duplicate INSIDE one micro-batch must collapse to one
      // canonical row, not double the word count past the floor
      mem.addData(docs(2), docs(2))
      q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("doc_id", "format", "text", "n_words")
        .as[(Long, String, String, Long)].collect().toSet
      val (format, text) = graft.operators.CorpusIngest.dispatch($"payload")
      val extracted = docs.toDF("doc_id", "payload")
        .select($"doc_id", format.as("format"), text.as("text"))
      val batch = extracted.join(
          graft.operators.TextAnalysis
            .gopherRules(extracted, "doc_id", "text", 10L, 1000L, 2L, 20L, 2L, 0L)
            .filter($"keep").select($"doc_id", $"n_words"),
          "doc_id")
        .as[(Long, String, String, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.map(_._1) === Set(1L, 2L, 4L, 7L, 8L, 9L, 10L, 11L))
      assert(streamed.map(r => r._1 -> r._2).toMap ===
        Map(1L -> "pdf", 2L -> "docx", 4L -> "epub",
          7L -> "mediawiki", 8L -> "jsonl-gz",
          9L -> "jsonl-zst", 10L -> "warc-gz", 11L -> "jsonl-xz"))
    } finally q.stop()
  }

  test("ledgered corpus ingest: redelivered payloads extract once; rejects stay rejected") {
    import graft.sources.{OfficeCodec, PdfText}
    val base = java.nio.file.Files.createTempDirectory("corpus_ledger").toString
    val input = s"$base/in"; val chk = s"$base/chk"
    val ledger = s"$base/ledger"; val out = s"$base/kept"
    val docs: Seq[(Long, Array[Byte])] = Seq(
      1L -> PdfText.composeTextFixture(11L, 2),
      2L -> OfficeCodec.composeDocx(22L, 2),
      3L -> OfficeCodec.composePptx(33L, 1), // quality-dropped, must still ledger
      4L -> OfficeCodec.composeEpub(44L, 2))
    def arrive(slice: Seq[(Long, Array[Byte])]): Unit =
      slice.toDF("doc_id", "payload").coalesce(1).write.mode("append").parquet(input)
    def drain(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType, true)))
      val q = EventPipeline.startLedgeredCorpusIngest(
        spark.readStream.schema(schema).parquet(input), minWords = 10L, chk, ledger, out)
      try q.processAllAvailable() finally q.stop()
    }
    arrive(docs.take(3))
    drain()
    // docs 2 and 3 REDELIVERED alongside the new doc 4: the ledger
    // must re-extract neither the kept 2 nor the rejected 3
    arrive(docs.drop(1))
    drain()
    val kept = spark.read.parquet(out)
      .select("doc_id", "format", "n_words")
      .as[(Long, String, Long)].collect()
    assert(kept.length === 3) // 1, 2, 4 exactly once; 3 quality-dropped
    assert(kept.map(_._1).toSet === Set(1L, 2L, 4L))
    assert(kept.map(r => r._1 -> r._2).toMap ===
      Map(1L -> "pdf", 2L -> "docx", 4L -> "epub"))
    // the rejected doc is ledgered (processed once, not retried)
    val ledgered = spark.read.parquet(ledger).select("doc_id")
      .as[Long].collect().toSet
    assert(ledgered === Set(1L, 2L, 3L, 4L))
  }

  test("ledgered classify router: redelivered docs route once, buckets match batch argmax") {
    val base = java.nio.file.Files.createTempDirectory("cls_route").toString
    val input = s"$base/in"; val chk = s"$base/chk"
    val ledger = s"$base/ledger"; val out = s"$base/routed"
    val train = Seq(
      (100L, "a a b m", "x"), (101L, "a b b m", "x"),
      (102L, "c c d m", "y"), (103L, "c d d m", "y"))
      .toDF("doc_id", "text", "source")
    val centroids = graft.operators.Classify.classCentroids(train, "source", "text")
    val docs = Seq(
      (1L, "a b a"), (2L, "c d c"), (3L, "m m"), (4L, "zz qq"))
    def arrive(slice: Seq[(Long, String)]): Unit =
      slice.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(input)
    def drain(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType, true)))
      val q = EventPipeline.startLedgeredClassifyRouter(
        spark.readStream.schema(schema).parquet(input), centroids, chk, ledger, out)
      try q.processAllAvailable() finally q.stop()
    }
    arrive(docs.take(2))
    drain()
    // doc 2 is REDELIVERED alongside the rest: the ledger must route it once
    arrive(docs.drop(1))
    drain()
    val routed = spark.read.parquet(out)
      .select("doc_id", "pred", "score_ppb")
      .as[(Long, String, Long)].collect()
    assert(routed.length === 4) // exactly once despite redelivery
    val batch = graft.operators.Classify
      .centroidClassify(docs.toDF("doc_id", "text"), "doc_id", "text", centroids)
      .as[(Long, String, Long)].collect().toSet
    assert(routed.toSet === batch)
    // the physical layout IS the bucketing: each pred lives in its partition dir
    val preds = routed.map(r => r._1 -> r._2).toMap
    assert(preds(1L) === "x" && preds(2L) === "y" && preds(3L) === "x" && preds(4L) === "?")
  }

  test("ledgered span scrub: id-ordered slices + redelivery equal the one-shot rewrite") {
    val base = java.nio.file.Files.createTempDirectory("scrub_stream").toString
    val input = s"$base/in"; val chk = s"$base/chk"
    val ledger = s"$base/ledger"; val owners = s"$base/owners"; val out = s"$base/scrubbed"
    // k=2 chunks; "a b" repeats across docs and within doc 3
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "a b a b"), (4L, "c d z w"))
    def arrive(slice: Seq[(Long, String)]): Unit =
      slice.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(input)
    def drain(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType, true)))
      val q = EventPipeline.startLedgeredSpanScrub(
        spark.readStream.schema(schema).parquet(input), 2, chk, ledger, owners, out)
      try q.processAllAvailable() finally q.stop()
    }
    arrive(docs.take(2))
    drain()
    // doc 2 REDELIVERED alongside 3..4: ledger must not re-scrub it
    arrive(docs.drop(1))
    drain()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_chunks", "n_kept", "text_clean")
      .as[(Long, Long, Long, String)].collect()
    assert(streamed.length === 4)
    val oneShot = Rewrite_scrub(docs)
    assert(streamed.toSet === oneShot)
  }
  private def Rewrite_scrub(docs: Seq[(Long, String)]): Set[(Long, Long, Long, String)] =
    graft.operators.Rewrite.scrubRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].collect().toSet

  test("ledgered BM25 indexer: sliced + redelivered stream equals one-shot indexing") {
    val base = java.nio.file.Files.createTempDirectory("bm25_stream").toString
    val input = s"$base/in"; val chk = s"$base/chk"
    val ledger = s"$base/ledger"; val index = s"$base/idx"
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the lazy dog sleeps"),
      (3L, "spark engines process the corpus"),
      (4L, "a completely different document"))
    def arrive(slice: Seq[(Long, String)]): Unit =
      slice.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(input)
    def drain(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType, true)))
      val q = EventPipeline.startLedgeredBm25Indexer(
        spark.readStream.schema(schema).parquet(input), chk, ledger, index)
      try q.processAllAvailable() finally q.stop()
    }
    arrive(docs.take(2))
    drain()
    // a new file REDELIVERS doc 2 and adds 3..4: the ledger must keep
    // the index's new-docs-only contract
    arrive(docs.drop(1))
    drain()
    val streamed = graft.operators.Artifacts.loadBm25Tf(spark, index)
      .as[(Long, String, Long)].collect().toSet
    val oneShot = graft.operators.Retrieval
      .termFrequencies(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed === oneShot)
    // and the index scores identically to recompute
    val probes = Seq((100L, "the corpus")).toDF("doc_id", "text")
    val viaIndex = graft.operators.Artifacts
      .bm25TopKFromIndex(spark, index, probes, "doc_id", "text", k = 3)
      .orderBy("rk").collect().map(_.toSeq)
    val recompute = graft.operators.Retrieval
      .bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text", probes, "doc_id", "text", k = 3)
      .orderBy("rk").collect().map(_.toSeq)
    assert(viaIndex.toSeq === recompute.toSeq)
  }

  test("ledgered LM counter: sliced + redelivered + retried stream equals one-shot counts") {
    val base = java.nio.file.Files.createTempDirectory("lm_stream").toString
    val input = s"$base/in"; val chk = s"$base/chk"
    val ledger = s"$base/ledger"; val counts = s"$base/lm"
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the lazy dog"),
      (3L, "the corpus grows"))
    def arrive(slice: Seq[(Long, String)]): Unit =
      slice.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(input)
    def drain(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType, true)))
      val q = EventPipeline.startLedgeredLmCounter(
        spark.readStream.schema(schema).parquet(input), chk, ledger, counts)
      try q.processAllAvailable() finally q.stop()
    }
    arrive(docs.take(2))
    drain()
    // simulate the crash-retry window: re-write batch 0's counts dir —
    // the overwrite replaces, never double-counts
    graft.operators.Artifacts.writeLmCountsBatch(
      docs.take(2).toDF("doc_id", "text"), "text", counts, batchId = 0L)
    // a new file redelivers doc 2 and adds doc 3
    arrive(docs.drop(1))
    drain()
    val streamed = graft.operators.Artifacts.loadLmRel(spark, counts)
      .as[(String, Long)].collect().toSet
    val oneShot = graft.operators.Curation.referenceRel(docs.toDF("doc_id", "text"), "text")
      .as[(String, Long)].collect().toSet
    assert(streamed === oneShot)
  }

  test("streaming domain cap admits first-k per domain across micro-batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[DocArrival]
    val admitted = EventPipeline.streamingDomainCap(mem.toDS(), k = 2)
    val q = admitted.writeStream.outputMode("append").format("memory")
      .queryName("dom_cap").start()
    try {
      // batch 1: srcA over-full (3 arrivals → lowest two ids admitted),
      // srcB partial
      mem.addData(DocArrival(5L, "srcA"), DocArrival(3L, "srcA"),
        DocArrival(9L, "srcA"), DocArrival(7L, "srcB"))
      q.processAllAvailable()
      // batch 2: srcA already full (rejected), srcB tops up then rejects
      mem.addData(DocArrival(1L, "srcA"), DocArrival(2L, "srcB"),
        DocArrival(8L, "srcB"))
      q.processAllAvailable()
      val out = spark.table("dom_cap").as[DocArrival].collect()
        .map(a => (a.doc_id, a.source)).toSet
      // first-k by ARRIVAL: batch-1 srcA admits 3,5 (not the later 1)
      assert(out === Set((3L, "srcA"), (5L, "srcA"), (7L, "srcB"), (2L, "srcB")))
    } finally q.stop()
  }

  test("streaming domain cap: bounded-heap admission equals sort-take on a hot-domain burst") {
    // a single domain floods one micro-batch with 5,000 shuffled
    // arrivals against k = 7 — the heap fold must admit exactly the
    // set the old O(g log g) sort-then-take admitted (the 7 smallest
    // doc_ids), in ascending order
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(42)
    val burst = rnd.shuffle((1L to 5000L).toVector).map(DocArrival(_, "hot"))
    val mem = MemoryStream[DocArrival]
    val q = EventPipeline.streamingDomainCap(mem.toDS(), k = 7)
      .writeStream.outputMode("append").format("memory")
      .queryName("dom_cap_burst").start()
    try {
      mem.addData(burst: _*)
      q.processAllAvailable()
      val out = spark.table("dom_cap_burst").as[DocArrival].collect().map(_.doc_id)
      assert(out.toSeq === burst.map(_.doc_id).sorted.take(7))
      // a second burst is fully rejected: the domain is saturated
      mem.addData(DocArrival(0L, "hot"))
      q.processAllAvailable()
      assert(spark.table("dom_cap_burst").count() === 7)
    } finally q.stop()
  }

  test("streaming corpus ingest: micro-batch output equals the batch transform") {
    implicit val ctx = spark.sqlContext
    // a mixed shard: pdf / docx / pptx / html / plain text / binary
    val payloads: Seq[(Long, Array[Byte])] = Seq(
      1L -> graft.sources.PdfText.composeTextFixture(101L, 2),
      2L -> graft.sources.OfficeCodec.composeDocx(102L, 2),
      3L -> graft.sources.OfficeCodec.composePptx(103L, 2),
      4L -> "<html><head><title>T</title></head><body><p>hello web</p></body></html>".getBytes("UTF-8"),
      5L -> "plain cafÃ© text".getBytes("UTF-8"), // mojibake repair on the text path
      6L -> Array[Byte](0, 1, 2, 3), // binary: labeled, null metrics
      // the r15 bzip2 front doors route through the same dispatch
      7L -> graft.sources.BzipCodec.synthJsonlBz2(107L, 1, 2),
      8L -> graft.sources.BzipCodec.synthWikiBz2(108L, 2),
      // the r16 lz4 / snappy front doors, same rule: batch and stream
      // must route and extract identically from the same bytes
      9L -> graft.sources.Lz4Codec.synthJsonlLz4(109L, 1, 2),
      10L -> graft.sources.SnappyCodec.synthJsonlSnappy(110L, 1, 2),
      // the r17 forms, same rule: the legacy-lz4 mixed shard routes to
      // the same jsonl-lz4 label, the magic-less Hadoop container to
      // its structural route
      11L -> graft.sources.Lz4Codec.synthJsonlLz4Legacy(111L, 2, 2),
      12L -> graft.sources.SnappyCodec.synthJsonlSnappyHadoop(112L, 1, 2))
    val mem = MemoryStream[(Long, Array[Byte])]
    val stream = EventPipeline.streamingCorpus(
      mem.toDF().toDF("doc_id", "payload"))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("corpus_ing").start()
    try {
      mem.addData(payloads.take(3): _*)
      q.processAllAvailable()
      mem.addData(payloads.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("corpus_ing").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(4)) -1 else r.getInt(4)))
        .toSet
      val batch = graft.operators.CorpusIngest.withDocMetrics(
        payloads.toDF("doc_id", "payload"), "doc_id", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(4)) -1 else r.getInt(4)))
        .toSet
      assert(streamed === batch)
      val byId = spark.table("corpus_ing").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(byId === Map(1L -> "pdf", 2L -> "docx", 3L -> "pptx",
        4L -> "html", 5L -> "text", 6L -> "binary",
        7L -> "jsonl-bz2", 8L -> "wiki-bz2",
        9L -> "jsonl-lz4", 10L -> "jsonl-snappy",
        11L -> "jsonl-lz4", 12L -> "jsonl-snappy-hadoop"))
      // the repaired text path actually repaired: n_chars of doc 5
      val doc5 = spark.table("corpus_ing").collect().find(_.getLong(0) == 5L).get
      assert(doc5.getInt(4) === "plain café text".length)
    } finally q.stop()
  }
}
