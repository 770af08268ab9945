package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native needle scan must reproduce `exists(needles, k =>
  * contains(h, k))` EXACTLY, including its three-valued null logic —
  * RuleCascade's filter semantics ride on it.
  */
class ContainsAnySpec extends SparkSpec {
  import spark.implicits._

  test("matches exists-HOF semantics including null needles and null haystack") {
    val rows = Seq(
      (Some("abc def"), Some(Seq(Some("de"), Some("zz")))),   // true (match)
      (Some("abc def"), Some(Seq(Some("zz"), Some("yy")))),   // false
      (Some("abc def"), Some(Seq[Option[String]]())),         // false (empty)
      (Some("abc def"), Some(Seq(Some("zz"), None))),         // null (miss + null needle)
      (Some("abc def"), Some(Seq(Some("abc"), None))),        // true (match wins over null)
      (None, Some(Seq(Some("a")))),                           // null haystack
      (Some("abc"), None))                                    // null array
      .toDF("h", "ns")
    val cmp = rows.select(
      ContainsAnyCol.containsAny(col("h"), col("ns")).as("nat"),
      exists(col("ns"), k => col("h").contains(k)).as("hof"))
    assert(cmp.filter(expr("nat IS DISTINCT FROM hof")).count() === 0)
    val got = rows.select(ContainsAnyCol.containsAny(col("h"), col("ns")))
      .as[Option[Boolean]].collect().toSeq
    assert(got === Seq(Some(true), Some(false), Some(false), None, Some(true), None, None))
  }

  test("compiles under strict codegen") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = Seq(("hello world", Seq("wor")), ("hello", Seq("xyz")))
        .toDF("h", "ns")
        .filter(ContainsAnyCol.containsAny(col("h"), col("ns")))
        .count()
      assert(n === 1L)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
