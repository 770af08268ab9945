package graft

/** Local smoke: runs the flagship `SparkEntry.entry` exactly as the driver
  * does (rows>0 gate) and prints a sample + the physical plan.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.entry(spark)
    println(s"entry rows=${df.count()}")
    df.show(5, truncate = false)
    df.explain("formatted")
    spark.stop()
  }
}
