package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mojibake repair: the cp1252→UTF-8 inversion fixes damaged text and
  * ONLY damaged text — genuine accents/CJK/emoji pass untouched.
  * Cross-engine pinning happens in q_mojibake.
  */
class MojibakeSpec extends SparkSpec {

  test("classic damage repairs; double damage needs two passes") {
    assert(Mojibake.fix("cafÃ©") === "café")
    assert(Mojibake.fix("â€™tis â€” so") === "’tis — so")
    assert(Mojibake.fix("naÃ¯ve rÃ©sumÃ©") === "naïve résumé")
    assert(Mojibake.fix("cafÃƒÂ©") === "café") // double-encoded
  }

  test("undamaged text is the identity") {
    val clean = Seq("café", "中文テキスト", "plain ascii", "", "emoji 😀",
      "mixed é and 中", "€100", "a\tb\nc")
    clean.foreach(s => assert(Mojibake.fix(s) === s, s))
    assert(Mojibake.fix(null) === null)
  }

  test("expression + SQL surface; fixed point (idempotent)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq(("cafÃ©", "café"))
      .toDF("bad", "good")
      .selectExpr("fix_mojibake(bad) AS f", "fix_mojibake(fix_mojibake(bad)) AS ff", "good")
      .head
    assert(r.getString(0) === r.getString(2))
    assert(r.getString(1) === r.getString(2))
  }
}
