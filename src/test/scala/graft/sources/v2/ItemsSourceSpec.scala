package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 connector semantics: by-id pushdown reaches the source, columns
  * prune, and partitions are the reference's 50-id API pages.
  */
class ItemsSourceSpec extends SparkSpec {
  import spark.implicits._

  private def load(store: String) =
    spark.read.format(ItemsSource.ShortName).option("store", store).load()

  test("full scan returns every stored cell with the declared schema") {
    ItemsStore.put("s_full", Seq(
      ItemsStore.Cell(1L, "c1", "a", 10L),
      ItemsStore.Cell(1L, "c2", null, 20L),
      ItemsStore.Cell(2L, "c1", "b", 30L)))
    val df = load("s_full")
    assert(df.schema === ItemsSource.schema)
    val got = df.as[(Long, String, Option[String], Long)].collect().toSet
    assert(got === Set((1L, "c1", Some("a"), 10L), (1L, "c2", None, 20L), (2L, "c1", Some("b"), 30L)))
    ItemsStore.drop("s_full")
  }

  test("item_id and column_id predicates push into the scan, others stay in Spark") {
    ItemsStore.put("s_push", (1L to 10L).map(i =>
      ItemsStore.Cell(i, if (i % 2 == 0) "c_even" else "c_odd", s"t$i", i * 100)))
    val df = load("s_push")
      .filter($"item_id".isin(2L, 3L, 4L) && $"column_id" === "c_even" && $"created_at" > 250L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[") && plan.contains("item_id") && plan.contains("column_id"), plan)
    assert(df.select("item_id").as[Long].collect().sorted.toSeq === Seq(4L))
    ItemsStore.drop("s_push")
  }

  test("column pruning reaches the reader (GraphQL field-selection analog)") {
    ItemsStore.put("s_prune", Seq(ItemsStore.Cell(7L, "c1", "x", 1L)))
    val df = load("s_prune").select("text")
    val plan = df.queryExecution.executedPlan.toString
    // the BatchScan's output column list IS the pruned schema
    assert(plan.contains("BatchScan graft_items(s_prune)[text#"), plan)
    assert(!plan.contains("item_id#"), plan)
    assert(df.as[String].collect().toSeq === Seq("x"))
    ItemsStore.drop("s_prune")
  }

  test("IN lists containing NULL plan and evaluate without NPE (null matches nothing)") {
    // regression: a pushed sources.In may carry null values; partition
    // planning used to NPE on v.asInstanceOf[Number]
    ItemsStore.put("s_nullin", (1L to 4L).map(i => ItemsStore.Cell(i, "c1", s"t$i", i)))
    val viaDf = load("s_nullin").filter($"item_id".isin(2L, null))
    assert(viaDf.select("item_id").as[Long].collect().toSeq === Seq(2L))
    load("s_nullin").createOrReplaceTempView("v_nullin")
    val viaSql = spark.sql("SELECT item_id FROM v_nullin WHERE item_id IN (3, NULL)")
    assert(viaSql.as[Long].collect().toSeq === Seq(3L))
    val viaCol = spark.sql("SELECT item_id FROM v_nullin WHERE column_id IN ('c1', NULL)")
    assert(viaCol.as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    ItemsStore.drop("s_nullin")
  }

  test("partitions are 50-id API pages and pushdown shrinks the page set") {
    ItemsStore.put("s_pages", (1L to 120L).map(i => ItemsStore.Cell(i, "c1", s"t$i", i)))
    assert(load("s_pages").rdd.getNumPartitions === 3) // ceil(120/50)
    val filtered = load("s_pages").filter($"item_id".isin(1L to 60L map (identity): _*))
    assert(filtered.rdd.getNumPartitions === 2) // pushdown replans to 2 pages
    assert(filtered.count() === 60L)
    ItemsStore.drop("s_pages")
  }

  test("write path round-trips: cells written through the connector read back identically") {
    val src = (1L to 75L).map(i => (i, s"col${i % 3}", if (i % 10 == 0) null else s"text$i", i * 100))
      .toDF("item_id", "column_id", "text", "created_at")
    src.write.format(ItemsSource.ShortName).option("store", "s_wr").mode("append").save()
    val back = load("s_wr").as[(Long, String, Option[String], Long)].collect().toSet
    val want = src.as[(Long, String, Option[String], Long)].collect().toSet
    assert(back === want)
    ItemsStore.drop("s_wr")
  }

  test("connector writes are idempotent upserts: redelivery converges, updates win") {
    val v1 = Seq((1L, "c1", "old", 10L), (2L, "c1", "keep", 20L))
      .toDF("item_id", "column_id", "text", "created_at")
    v1.write.format(ItemsSource.ShortName).option("store", "s_up").mode("append").save()
    // redelivery of the identical batch (the task-retry shape): no dupes
    v1.write.format(ItemsSource.ShortName).option("store", "s_up").mode("append").save()
    assert(load("s_up").count() === 2)
    // a new value for an existing (item, column) key replaces it — K1's
    // change_column_value semantics, not an append
    Seq((1L, "c1", "new", 30L)).toDF("item_id", "column_id", "text", "created_at")
      .write.format(ItemsSource.ShortName).option("store", "s_up").mode("append").save()
    val got = load("s_up").as[(Long, String, Option[String], Long)].collect().toSet
    assert(got === Set((1L, "c1", Some("new"), 30L), (2L, "c1", Some("keep"), 20L)))
    ItemsStore.drop("s_up")
  }

  test("a written store serves the same pushdown reads as a seeded one (oracle shape)") {
    // write through the connector, read back through the connector with
    // the q_items_connector predicate shape, and compare against the
    // equivalent plain-DataFrame computation — the round-trip oracle.
    val src = (1L to 200L).map(i => (i, s"col${i % 3}", s"t$i", i * 7))
      .toDF("item_id", "column_id", "text", "created_at")
    src.write.format(ItemsSource.ShortName).option("store", "s_rt").mode("append").save()
    val viaConnector = load("s_rt")
      .filter($"item_id" <= 40L && $"column_id" === "col1")
      .as[(Long, String, Option[String], Long)].collect().toSet
    val direct = src.filter($"item_id" <= 40L && $"column_id" === "col1")
      .as[(Long, String, Option[String], Long)].collect().toSet
    assert(viaConnector === direct && viaConnector.nonEmpty)
    ItemsStore.drop("s_rt")
  }

  test("group-by aggregate pushes COMPLETELY into the source (no Spark-side agg)") {
    ItemsStore.put("s_agg", (1L to 100L).map(i =>
      ItemsStore.Cell(i, s"col${i % 3}", if (i % 10 == 0) null else s"t$i", i * 7)))
    val df = load("s_agg").groupBy("column_id")
      .agg(count(lit(1)).as("n_cells"), min("item_id").as("min_item"),
        max("item_id").as("max_item"), count("text").as("n_text"))
    val plan = df.queryExecution.executedPlan.toString
    // complete pushdown: the aggregate is served by the scan — no
    // HashAggregate, no exchange, pushedAgg visible in the description
    assert(plan.contains("pushedAgg=["), plan)
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
    val got = df.as[(String, Long, Long, Long, Long)].collect().toSet
    // col0: 3,6,...,99 (34 ids incl 99? ids 3..99 step 3 = 33) — compute directly instead
    val expect = (1L to 100L).map(i => (s"col${i % 3}", i, if (i % 10 == 0) null else s"t$i"))
      .groupBy(_._1).map { case (k, vs) =>
        (k, vs.size.toLong, vs.map(_._2).min, vs.map(_._2).max,
          vs.count(_._3 != null).toLong) }.toSet
    assert(got === expect)
    ItemsStore.drop("s_agg")
  }

  test("global (no group-by) COUNT/MIN/MAX pushes down and matches") {
    ItemsStore.put("s_gagg", (1L to 57L).map(i => ItemsStore.Cell(i, "c1", s"t$i", i)))
    val df = load("s_gagg").agg(count(lit(1)).as("n"), max("created_at").as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=[") && !plan.contains("HashAggregate"), plan)
    assert(df.as[(Long, Long)].collect().toSeq === Seq((57L, 57L)))
    ItemsStore.drop("s_gagg")
  }

  test("aggregate pushdown composes with pushed filters") {
    ItemsStore.put("s_fagg", (1L to 40L).map(i =>
      ItemsStore.Cell(i, s"col${i % 2}", s"t$i", i)))
    val df = load("s_fagg").filter($"column_id" === "col1")
      .agg(count(lit(1)).as("n"), min("item_id").as("mn"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=[") && plan.contains("column_id"), plan)
    assert(df.as[(Long, Long)].collect().toSeq === Seq((20L, 1L)))
    ItemsStore.drop("s_fagg")
  }

  test("unsupported aggregates (avg, distinct) fall back to a Spark-side agg — still correct") {
    ItemsStore.put("s_avg", (1L to 10L).map(i => ItemsStore.Cell(i, "c1", s"t$i", i)))
    val df = load("s_avg").agg(avg("created_at").as("a"),
      countDistinct("column_id").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("pushedAgg=["), plan)
    assert(df.as[(Double, Long)].collect().toSeq === Seq((5.5, 1L)))
    ItemsStore.drop("s_avg")
  }

  test("LIMIT pushes into page planning: fewer pages fetched, exact count kept") {
    // 300 distinct ids = 6 full pages unpushed; LIMIT 10 must plan 1
    ItemsStore.put("s_lim", (1L to 300L).map(i => ItemsStore.Cell(i, "c1", s"t$i", i)))
    val df = load("s_lim").limit(10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=10"), plan)
    assert(df.count() === 10)
    // page pruning, asserted at the scan itself: 6 pages unlimited, 1 limited
    val unlimited = new ItemsScanBuilder(ItemsConf("s_lim", ItemsConf.StoreTransport, "")).build().toBatch.planInputPartitions()
    assert(unlimited.length === 6)
    val sb = new ItemsScanBuilder(ItemsConf("s_lim", ItemsConf.StoreTransport, ""))
    assert(sb.pushLimit(10))
    assert(sb.build().toBatch.planInputPartitions().length === 1)
    ItemsStore.drop("s_lim")
  }

  test("reported statistics make a filtered lookup broadcastable (no hint needed)") {
    // without SupportsReportStatistics a DSv2 relation sizes at
    // defaultSizeInBytes (effectively infinite) and can never win a
    // broadcast decision on its own
    ItemsStore.put("s_stats", (1L to 1000L).map(i => ItemsStore.Cell(i, "c1", s"t$i", i)))
    val small = load("s_stats").filter($"item_id".isin(2L, 3L, 5L))
    val stats = small.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 10000, stats.sizeInBytes)
    val big = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val joined = big.join(small, big("l_orderkey") === small("item_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(joined.count() > 0)
    ItemsStore.drop("s_stats")
  }

  test("runtime filters shrink page planning to the join-observed ids (scan contract)") {
    // 300 ids = 6 pages; a runtime IN of 3 ids must re-plan to 1 page
    // with only those ids in the API call
    ItemsStore.put("s_rt", (1L to 300L).map(i => ItemsStore.Cell(i, "c1", s"t$i", i)))
    val scan = new ItemsScanBuilder(ItemsConf("s_rt", ItemsConf.StoreTransport, "")).build()
    assert(scan.asInstanceOf[ItemsScan].filterAttributes()
      .map(_.fieldNames.head).toSet === Set("item_id", "column_id"))
    assert(scan.toBatch.planInputPartitions().length === 6)
    scan.asInstanceOf[ItemsScan].filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("item_id", Array(7L, 120L, 260L))))
    val pages = scan.toBatch.planInputPartitions()
    assert(pages.length === 1)
    assert(pages.head.asInstanceOf[ItemsPage].itemIds.toSeq === Seq(7L, 120L, 260L))
    ItemsStore.drop("s_rt")
  }

  test("dynamic pruning end-to-end: a broadcast-joined dim prunes the scanned pages") {
    // the Spark-side half of the contract: the optimizer inserts a
    // DynamicPruning filter on item_id (SupportsRuntimeFiltering) and
    // the scan plans only the dim-surviving ids' pages
    ItemsStore.put("s_dpp", (1L to 300L).map(i => ItemsStore.Cell(i, "c1", s"t$i", i)))
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      .map(k => k -> conf.getOption(k))
    try {
      // tiny fixtures defeat the stats-based benefit estimate; force the
      // fallback ratio path so the rule's decision is deterministic here
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
      // the dim must be a real scan with a SURVIVING selective filter —
      // a LocalRelation folds the filter away and the pruning rule then
      // sees no selective predicate to derive the runtime filter from
      val dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .select($"n_nationkey".cast("long").as("id"))
        .filter($"id".isin(7L, 12L, 21L))
      val fact = load("s_dpp")
      val joined = fact.join(broadcast(dim), fact("item_id") === dim("id"))
        .select("item_id", "text")
      ItemsScan.pagesFetched.set(0)
      val got = joined.as[(Long, String)].collect().toMap
      assert(got === Map(7L -> "t7", 12L -> "t12", 21L -> "t21"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("RuntimeFilters: [dynamicpruning"), plan)
      // only the runtime-FILTERED partition list is read: one API page
      // (3 surviving ids) instead of the unfiltered six
      assert(ItemsScan.pagesFetched.get() === 1,
        s"fetched=${ItemsScan.pagesFetched.get()}\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
    ItemsStore.drop("s_dpp")
  }
}
