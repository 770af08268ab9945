package graft

import org.apache.spark.sql.functions._

/** One-shot measurement harness behind the PERF.md AQE-skew guidance:
  * a deliberately skewed join (one key carrying 70% of an 8M-row fact)
  * against a broadcast-ineligible dim, run (a) with AQE skew-join off,
  * (b) with it on, (c) manually salted; plus the aggregation-side twin
  * AQE has no machinery for. Prints seconds per variant; not part of
  * the bench suite (it generates its own data).
  */
object SkewLab {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    val rows = 8_000_000L
    val hot = (rows * 7 / 10).toInt
    val big = spark.range(rows)
      .select(when(col("id") < hot, 0L).otherwise(pmod(col("id"), lit(100000L))).as("k"),
        (col("id") % 1000).cast("double").as("v"))
      .repartition(32)
      .localCheckpoint(true)
    val dim = spark.range(100000L).select(col("id").as("k"),
      concat(lit("name_"), col("id")).as("k_name"),
      lit("x" * 64).as("pad"))
      .localCheckpoint(true)

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[skewlab] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def fold(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("double").as("h"))
        .agg(sum("h")).collect()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // thresholds sized to the experiment (defaults target 256 MB partitions)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    time("join smj skew OFF") { fold(big.join(dim, Seq("k"))) }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val aqeJoin = big.join(dim, Seq("k"))
    // execute THIS QueryExecution (a fold would wrap it in a new one
    // whose adaptive plan is the one that finalizes)
    time("join smj AQE skew ON") { aqeJoin.queryExecution.toRdd.count() }
    println("[skewlab] AQE plan has skew=true: " +
      aqeJoin.queryExecution.executedPlan.toString.contains("skew=true"))
    time("join salted(16)") { fold(graft.operators.Skew.saltedJoin(big, dim, Seq("k"), 16)) }

    // aggregation side: cluster the hot key into one partition first —
    // the shape AQE cannot split (its skew machinery is join-only)
    val clustered = big.repartition(col("k")).localCheckpoint(true)
    time("agg plain (clustered)") {
      fold(clustered.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum_value")))
    }
    time("agg salted(16) (clustered)") {
      fold(graft.operators.Skew.saltedAgg(clustered, Seq("k"), "v", 16))
    }
    spark.stop()
  }
}
