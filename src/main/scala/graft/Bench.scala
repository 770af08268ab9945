package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Per-round benchmark: times every registered query at the given SF and
  * prints one JSON line. Each result is folded through xxhash64 over ALL
  * output columns — a bare `count()` would let Catalyst prune the
  * projections, timing a row count instead of the operator.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // Untimed warmup: JIT/codegen + parquet reader init otherwise land
    // on whichever query happens to run first (~6 s of noise).
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(sum(xxhash64(col("l_orderkey")).cast("double")).as("h")).collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // double sum: a long sum of 64-bit hashes overflows under ANSI.
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("double").as("_h"))
          .agg(sum("_h")).collect()
      } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
