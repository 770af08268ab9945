package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for every suite (Spark startup is ~5 s;
  * per-suite sessions would dominate `sbt test`). Restart-tolerant:
  * LedgerSpec stops the SparkContext to prove cross-session semantics,
  * so a stopped cached session is replaced with a fresh one.
  */
object SparkTestSession {
  private var cached: SparkSession = _
  def session: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      cached = GraftSession.builder("local[4]", "4").getOrCreate()
      cached.sparkContext.setLogLevel("ERROR")
    }
    cached
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.session

  /** Evaluate a single-string-column expression over the given inputs. */
  def evalStr(inputs: Seq[String])(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] = {
    import spark.implicits._
    inputs.toDF("s").select(f(org.apache.spark.sql.functions.col("s")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq
}
