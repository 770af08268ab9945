package graft.sources

import graft.SparkSpec

/** Co-located bucketed join: same key, same bucket count on both sides
  * → the sort-merge join plan has NO shuffle exchange on either side.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("joining two co-bucketed tables requires no shuffle exchange") {
    val left = (1L to 1000L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 1000L).map(k => (k, k * 2.0)).toDF("k", "rv")
    Warehouse.writeBucketed(left, "wh_left", "k", 8)
    Warehouse.writeBucketed(right, "wh_right", "k", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Warehouse.table(spark, "wh_left")
        .join(Warehouse.table(spark, "wh_right"), "k")
      assert(joined.count() === 1000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("writePartitioned: pruned directories, bounded file counts, partition-filter pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wp").toFile.getAbsolutePath
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "es" else "de", s"t$i"))
      .toDF("id", "lang", "t")
    Warehouse.writePartitioned(df, dir, Seq("lang"), sortCol = "id", filesPerPartition = 2)
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(langDirs.toSeq === Seq("lang=de", "lang=en", "lang=es"))
    // each Hive partition holds at most filesPerPartition parquet files
    langDirs.foreach { ld =>
      val files = new java.io.File(dir, ld).listFiles().count(_.getName.endsWith(".parquet"))
      assert(files > 0 && files <= 2, s"$ld has $files files")
    }
    // round trip + partition pruning: only the en directory is scanned
    val back = spark.read.parquet(dir).filter($"lang" === "en")
    assert(back.count() === 1000L)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(600))
  }

  test("a bucketed-to-unbucketed join shuffles only the unbucketed side") {
    val plain = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "x")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Warehouse.table(spark, "wh_left").join(plain, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.split("Exchange hashpartitioning").length - 1 === 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
