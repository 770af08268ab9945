package graft.functions

import graft.SparkSpec

/** SQL surface: registered functions behave exactly like the Column API. */
class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API expressions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT norm('  Café  NOËL ') AS n,
        |       file_ext('A.PDF') AS e,
        |       sanitize_name('a/b:c') AS s,
        |       signed_filename('doc.pdf') AS sf,
        |       escape_for_q("it's") AS q,
        |       infer_mime('x.txt', CAST(NULL AS STRING)) AS m,
        |       ext_from_name_or_mime('noext', 'image/png') AS x,
        |       item_name_or(CAST(NULL AS STRING), '7') AS inn
        |""".stripMargin).head
    assert(r.getString(0) === "cafe noel")
    assert(r.getString(1) === "pdf")
    assert(r.getString(2) === "a-b-c")
    assert(r.getString(3) === "doc SIGNÉ.pdf")
    assert(r.getString(4) === """it\'s""")
    assert(r.getString(5) === "text/plain")
    assert(r.getString(6) === ".png")
    assert(r.getString(7) === "ITEM_7")
  }

  test("stable_hash60 in SQL equals the DuckDB twin formula") {
    GraftFunctions.register(spark)
    val h = spark.sql("SELECT stable_hash60('abc') AS h").head.getLong(0)
    // first 15 hex digits of md5('abc') = 900150983cd24fb parsed base-16
    assert(h === java.lang.Long.parseLong("900150983cd24fb", 16))
  }
}
