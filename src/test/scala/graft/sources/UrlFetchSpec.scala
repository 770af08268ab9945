package graft.sources

import graft.SparkSpec
import graft.sources.UrlFetch._

/** S7 URL-fetch seam: reference null/empty semantics, per-row error
  * capture (a dead link yields an error ROW, never a task failure), and
  * connection reuse (one transport open per partition).
  */
class UrlFetchSpec extends SparkSpec {
  import spark.implicits._

  private def install(name: String): Unit =
    StubStore.install(name,
      ok = Map(
        "https://cdn.example/a.pdf" -> (("pdf-bytes".getBytes("UTF-8"), Some("application/pdf"))),
        "https://cdn.example/b.txt" -> (("text".getBytes("UTF-8"), None))),
      failing = Map("https://cdn.example/dead" -> "connection refused"))

  test("fetchAll returns content+type for good urls, empty for null/empty, error rows for failures") {
    install("t_basic")
    val in = Seq(
      UrlRow(1L, "https://cdn.example/a.pdf"),
      UrlRow(2L, "https://cdn.example/b.txt"),
      UrlRow(3L, null),
      UrlRow(4L, ""),
      UrlRow(5L, "https://cdn.example/dead"),
      UrlRow(6L, "https://cdn.example/missing")).toDS()
    val out = fetchAll(in, "t_basic").collect().map(r => r.id -> r).toMap
    assert(out.size === 6)

    assert(new String(out(1L).content, "UTF-8") === "pdf-bytes")
    assert(out(1L).content_type === "application/pdf")
    assert(out(1L).fetch_error === null)
    assert(out(2L).content_type === null) // server sent no Content-Type

    // reference behavior: no url -> empty bytes, no type, NO error
    Seq(3L, 4L).foreach { id =>
      assert(out(id).content.length === 0)
      assert(out(id).content_type === null && out(id).fetch_error === null)
    }

    // failures are rows, not exceptions
    assert(out(5L).content === null)
    assert(out(5L).fetch_error.contains("connection refused"))
    assert(out(6L).fetch_error.contains("404"))
    StubStore.drop("t_basic")
  }

  test("one transport open per non-empty partition — connection reuse, not per-row opens") {
    install("t_reuse")
    val in = (1L to 40L).map(i => UrlRow(i, "https://cdn.example/a.pdf"))
      .toDS().repartition(4)
    assert(fetchAll(in, "t_reuse").count() === 40L)
    assert(StubStore.getCount("t_reuse") === 40)
    assert(StubStore.openCount("t_reuse") <= 4,
      s"expected <= 4 transport opens, got ${StubStore.openCount("t_reuse")}")
    StubStore.drop("t_reuse")
  }

  test("unregistered transport name fails fast") {
    val in = Seq(UrlRow(1L, "https://x/")).toDS()
    val ex = intercept[Exception] { fetchAll(in, "never_registered").collect() }
    assert(ex.getMessage != null)
  }
}
