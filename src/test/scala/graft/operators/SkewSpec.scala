package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting correctness: salted join/agg must equal their plain forms. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (k=1 carries 90% of rows) + a long tail
  private def big = ((1 to 900).map(i => (1L, i.toDouble)) ++ (1 to 100).map(i => (i.toLong + 1, i.toDouble)))
    .toDF("k", "v")
  private def dim = (1L to 101L).map(k => (k, s"name_$k")).toDF("k", "k_name")

  test("saltedJoin equals the plain join on skewed data") {
    val plain = big.join(dim, Seq("k")).select("k", "v", "k_name")
    val salted = Skew.saltedJoin(big, dim, Seq("k"), salt = 8).select("k", "v", "k_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
  }

  test("saltedJoin left-outer keeps unmatched big-side rows") {
    val bigger = big.unionByName(Seq((999L, 1.0)).toDF("k", "v"))
    val salted = Skew.saltedJoin(bigger, dim, Seq("k"), salt = 4, joinType = "left")
    assert(salted.filter($"k" === 999L && $"k_name".isNull).count() === 1L)
  }

  test("saltedAgg equals the plain aggregation") {
    val plain = big.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_value"))
    val salted = Skew.saltedAgg(big, Seq("k"), "v", salt = 8)
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
  }

  test("AQE splits a skewed sort-merge join at runtime — the join-side fix needs no salt") {
    // thresholds scaled to test data (defaults target 256 MB
    // partitions); restored afterwards so other tests see the session
    // untouched. NOTE the shuffle.partitions=32: with very few shuffle
    // partitions (4) the split was observed NOT to fire — recorded in
    // PERF.md as a deployment caveat.
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold", "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.shuffle.partitions", "32")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val bigger = spark.range(400000L)
        .select(when(col("id") < 300000L, 0L).otherwise(pmod(col("id"), lit(1000L))).as("k"),
          col("id").cast("double").as("v"))
      val dimBig = spark.range(1000L)
        .select(col("id").as("k"), concat(lit("n_"), col("id")).as("k_name"))
      val j = bigger.join(dimBig, Seq("k"))
      // run THIS QueryExecution so its adaptive plan is the one that
      // finalizes (an action on a derived frame builds a fresh one)
      j.queryExecution.toRdd.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") && plan.contains("skewed"), plan.take(1200))
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("the hot key is actually spread across salts") {
    val salts = big.withColumn("_salt", pmod(hash(big.columns.map(col): _*), lit(8)))
      .filter($"k" === 1L).select("_salt").distinct().count()
    assert(salts > 4L)
  }
}
