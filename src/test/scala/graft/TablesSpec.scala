package graft

import org.apache.spark.sql.functions._

/** Loader invariants, incl. the nanos→micros precision regression. */
class TablesSpec extends SparkSpec {

  test("events.ts converts nanos with integer division — no double-precision drift") {
    // The fixture's physical type is generator-dependent (it moved from
    // TIMESTAMP(NANOS)-as-long to TIMESTAMP_NTZ between rounds), so the
    // nanos branch is exercised on a synthesized parquet: epoch-scale
    // longs whose low microsecond digits land in the double-mantissa
    // danger zone. floor(ns/1000) must hold EXACTLY for every row; `/`
    // (double div) drifts ±1µs there (the q_asof_join regression).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nanos_events").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "events.parquet").getAbsolutePath
    val base = 1726000000000000000L // ~2024 in epoch nanos: > 2^53 µs-scale
    (0L until 4096L).map(i => (i, base + i * 777777L + (i % 1000L)))
      .toDF("event_id", "ts")
      .repartition(1).write.mode("overwrite").parquet(path)
    val raw = spark.read.parquet(path)
    assert(raw.schema("ts").dataType.typeName === "long")
    val norm = Tables.normalizeTs(raw)
    assert(norm.schema("ts").dataType.typeName === "timestamp")
    val drifts = norm.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .join(raw.select(col("event_id"), col("ts").as("ns")), "event_id")
      .filter(col("us") =!= expr("ns div 1000")).count()
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
