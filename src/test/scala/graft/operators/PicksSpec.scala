package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Top-k-per-group + chunked batching (SURVEY §2.6/§2.7). */
class PicksSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, 10L, 100L), (1L, 11L, 300L), (1L, 12L, 200L),
    (2L, 20L, 5L)).toDF("grp", "id", "ts")

  test("pickTop1 latest: one row per group, the max order key") {
    val out = Picks.pickTop1(df, Seq(col("grp")), Seq(col("ts").desc, col("id")))
      .select("grp", "id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 11L), (2L, 20L)))
  }

  test("pickTop1 earliest (W5 oldest-wins)") {
    val out = Picks.pickTop1(df, Seq(col("grp")), Seq(col("ts").asc, col("id")))
      .select("grp", "id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 20L)))
  }

  test("pickTopK keeps k per group in order") {
    val out = Picks.pickTopK(df, Seq(col("grp")), Seq(col("ts").desc, col("id")), 2)
      .select("id").as[Long].collect().toSet
    assert(out === Set(11L, 12L, 20L))
  }

  test("withChunkId: every chunk has at most `size` rows and all rows survive") {
    val ids = (1L to 987L).toDF("id")
    val chunked = Picks.withChunkId(ids, col("id"), 50)
    assert(chunked.count() === 987L)
    val maxPerChunk = chunked.groupBy("chunk_id").count()
      .agg(max("count")).as[Long].head()
    assert(maxPerChunk <= 50L)
    // deterministic: same input -> same chunk assignment
    val again = Picks.withChunkId(ids, col("id"), 50)
    assert(chunked.exceptAll(again).count() === 0L)
  }

  test("withChunkId spreads rows over multiple buckets (no single-partition window)") {
    val ids = (1L to 1000L).toDF("id")
    val nBuckets = Picks.withChunkId(ids, col("id"), 10, buckets = 16)
      .select(pmod(col("chunk_id"), lit(16)).as("b")).distinct().count()
    assert(nBuckets > 8L) // hash spread across the 16 buckets
  }
}
