package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core "matching" shape: latest file per (item, column)
    * enriched through lookup joins (SURVEY §3.3).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val latest = graft.queries.Queries.all("q_pick_latest")(spark, d)
    val o = Tables.orders(spark, d)
    latest.join(o, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_shipdate", "o_orderdate", "o_totalprice")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Queries.oracles
}
