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

  test("the hot key is actually spread across salts") {
    val salts = big.withColumn("_salt", pmod(hash(big.columns.map(col): _*), lit(8)))
      .filter($"k" === 1L).select("_salt").distinct().count()
    assert(salts > 4L)
  }
}
