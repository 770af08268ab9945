package graft

import org.apache.spark.sql.functions._

/** Loader invariants, incl. the nanos→micros precision regression. */
class TablesSpec extends SparkSpec {

  test("events.ts converts nanos with integer division — no double-precision drift") {
    val d = "/root/testdata/sf0.001"
    val raw = Tables.table(spark, d, "events")
    assume(raw.schema("ts").dataType.typeName == "long")
    val joined = Tables.events(spark, d).select(col("event_id"), col("ts"))
      .join(raw.select(col("event_id"), col("ts").as("ns")), "event_id")
      .withColumn("us", unix_micros(col("ts")))
    // floor(ns/1000) must hold EXACTLY for every row; `/` (double div)
    // drifts ±1µs on epoch-scale longs (the q_asof_join regression).
    val drifts = joined.filter(col("us") =!= expr("ns div 1000")).count()
    assert(drifts === 0L)
  }

  test("events.ts normalizes to a plain timestamp whatever the physical type") {
    val d = "/root/testdata/sf0.001"
    val ts = Tables.events(spark, d).schema("ts").dataType
    assert(ts.typeName === "timestamp") // never long, never timestamp_ntz
    // unix_micros (TIMESTAMP-only) must resolve — the q_funnel/q_ts_* contract
    val n = Tables.events(spark, d).select(unix_micros(col("ts"))).limit(1).count()
    assert(n === 1L)
  }

  test("every fixture table loads with a non-empty schema") {
    val d = "/root/testdata/sf0.001"
    Tables.names.foreach { t =>
      val df = Tables.table(spark, d, t)
      assert(df.columns.nonEmpty, t)
      assert(df.limit(1).count() === 1L, t)
    }
  }
}
