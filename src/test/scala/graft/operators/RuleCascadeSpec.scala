package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Matching-engine semantics (SURVEY §2.6 W1-W4): fallback no-inherit,
  * pick modes incl. the reference's first-is-actually-latest quirk,
  * priority monotonicity, default-rule injection, dotless file types.
  * Reference: `Leyton_depot.py:259-339`.
  */
class RuleCascadeSpec extends SparkSpec {
  import spark.implicits._

  private def pool(rows: (Long, String, Long, String, Long)*): DataFrame =
    rows.toDF("item_id", "column_id", "asset_id", "name", "created_at")

  private def rules(rows: (String, Int, Seq[String], Seq[String], Seq[String], String, Option[Int])*): DataFrame =
    rows.toDF("column_id", "priority", "include_any_of", "exclude_any_of", "file_types", "pick", "max")

  private val default = rules(("__default__", 1, Seq(), Seq(), Seq("pdf"), "latest", None))

  test("include keyword matches on the normalized name; extension check uses dotless types") {
    val p = pool(
      (1L, "c", 10L, "Doc SCANNÉ.PDF", 100L),
      (1L, "c", 11L, "Other.pdf", 200L),
      (1L, "c", 12L, "Doc scanne.jpg", 300L))
    val r = rules(("c", 1, Seq("scanne"), Seq(), Seq("pdf"), "latest", None))
    val out = RuleCascade(p, r, default).select("asset_id").as[Long].collect()
    assert(out.toSeq === Seq(10L)) // jpg excluded by type, Other excluded by include
  }

  test("exclude keywords drop candidates even when includes match") {
    val p = pool(
      (1L, "c", 10L, "scanne v2.pdf", 100L),
      (1L, "c", 11L, "scanne final.pdf", 50L))
    val r = rules(("c", 1, Seq("scanne"), Seq("v2"), Seq("pdf"), "latest", None))
    val out = RuleCascade(p, r, default).select("asset_id").as[Long].collect()
    assert(out.toSeq === Seq(11L))
  }

  test("fallback fires only when every higher-priority rule matched nothing, and does NOT inherit includes") {
    val p = pool(
      (1L, "c", 10L, "report.pdf", 100L),
      (1L, "c", 11L, "older.pdf", 50L))
    val r = rules(
      ("c", 1, Seq("scanne"), Seq(), Seq("pdf"), "latest", None), // matches nothing
      ("c", 2, Seq(), Seq(), Seq("pdf"), "latest", None)) // fallback: no includes
    val out = RuleCascade(p, r, default).select("asset_id").as[Long].collect()
    assert(out.toSeq === Seq(10L)) // fallback matched; picked latest
  }

  test("priority monotonicity: adding a fallback never changes a non-empty higher-priority result") {
    val p = pool(
      (1L, "c", 10L, "scanne.pdf", 100L),
      (1L, "c", 11L, "other.pdf", 999L))
    val main = rules(("c", 1, Seq("scanne"), Seq(), Seq("pdf"), "latest", None))
    val withFb = main.unionByName(rules(("c", 2, Seq(), Seq(), Seq("any"), "all", None)))
    val a = RuleCascade(p, main, default).select("asset_id").as[Long].collect().toSeq.sorted
    val b = RuleCascade(p, withFb, default).select("asset_id").as[Long].collect().toSeq.sorted
    assert(a === Seq(10L))
    assert(b === a)
  }

  test("pick=latest takes max created_at; pick=all with max truncates latest-first") {
    val p = pool(
      (1L, "c", 10L, "a.pdf", 100L),
      (1L, "c", 11L, "b.pdf", 300L),
      (1L, "c", 12L, "c.pdf", 200L))
    val latest = RuleCascade(p, rules(("c", 1, Seq(), Seq(), Seq("pdf"), "latest", None)), default)
    assert(latest.select("asset_id").as[Long].collect().toSeq === Seq(11L))
    val all2 = RuleCascade(p, rules(("c", 1, Seq(), Seq(), Seq("pdf"), "all", Some(2))), default)
    assert(all2.select("asset_id").as[Long].collect().toSeq.sorted === Seq(11L, 12L))
  }

  test("pick=first reproduces the reference bug by default (returns LATEST); intended mode opts out") {
    val p = pool(
      (1L, "c", 10L, "a.pdf", 100L),
      (1L, "c", 11L, "b.pdf", 300L))
    val r = rules(("c", 1, Seq(), Seq(), Seq("pdf"), "first", None))
    val ref = RuleCascade(p, r, default).select("asset_id").as[Long].collect()
    assert(ref.toSeq === Seq(11L)) // reference Leyton_depot.py:296-297: cand[:1][::-1] of desc sort
    val intended = RuleCascade(p, r, default, firstMeansLatest = false).select("asset_id").as[Long].collect()
    assert(intended.toSeq === Seq(10L))
  }

  test("columns without a configured rule get the default rule (pdf only)") {
    val p = pool(
      (1L, "unconfigured", 10L, "x.pdf", 100L),
      (1L, "unconfigured", 11L, "y.jpg", 200L))
    val r = rules(("other_col", 1, Seq(), Seq(), Seq("any"), "latest", None))
    val out = RuleCascade(p, r, default).select("asset_id").as[Long].collect()
    assert(out.toSeq === Seq(10L))
  }

  test("per-(item,column) independence: each cell picks from its own pool") {
    val p = pool(
      (1L, "c", 10L, "a.pdf", 100L),
      (2L, "c", 20L, "b.pdf", 50L),
      (2L, "d", 30L, "c.pdf", 10L))
    val r = rules(
      ("c", 1, Seq(), Seq(), Seq("pdf"), "latest", None),
      ("d", 1, Seq(), Seq(), Seq("pdf"), "latest", None))
    val out = RuleCascade(p, r, default)
      .select("item_id", "column_id", "asset_id").as[(Long, String, Long)].collect().toSet
    assert(out === Set((1L, "c", 10L), (2L, "c", 20L), (2L, "d", 30L)))
  }
}
