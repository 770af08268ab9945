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
}
