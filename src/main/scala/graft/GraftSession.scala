package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so Verify, Bench and tests agree.
  *
  * Scale-minded defaults: AQE on (runtime shuffle coalescing + skew-join
  * splitting), shuffle partitions sized to local cores (on a real cluster
  * AQE re-derives parallelism from data size), UTC timezone for oracle
  * parity, nanos-as-long so the nanosecond `events` parquet loads.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // unique per JVM: the in-memory catalog forgets tables between
      // runs but their files would survive and block re-creation
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      // Long-running driver hygiene: shuffle/broadcast blocks are freed
      // by weak-reference processing, which only runs on GC — the 30 min
      // default lets a many-query session accumulate dead blocks until
      // the heap chokes (observed as a bench-tail GC cliff). 2 min bounds
      // the backlog; a real cluster driver wants the same.
      .config("spark.cleaner.periodicGC.interval", "2min")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
