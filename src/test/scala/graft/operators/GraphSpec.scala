package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(nodes: Seq[String], undirected: Seq[(String, String)],
                    iters: Int = Graph.DefaultIters): Map[String, (Long, Long)] = {
    val n = nodes.toDF("node")
    val e = undirected.toDF("src", "dst")
      .union(undirected.map(_.swap).toDF("src", "dst"))
    Graph.pageRank(n, e, iters).collect()
      .map { case Row(v: String, d: Long, r: Long) => v -> (d, r) }.toMap
  }

  test("symmetric ring: every node gets the same rank, and mass is conserved") {
    val r = ranks(Seq("a", "b", "c", "d"), Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a"))
    assert(r.values.map(_._2).toSet.size === 1)
    assert(r("a")._1 === 2)
    // out-neighbors redistribute everything except integer-floor dust:
    // 4 nodes at 250000 ppm each
    assert(r.values.map(_._2).sum === Graph.Scale)
  }

  test("star graph: the hub outranks the leaves, leaves tie") {
    val r = ranks(Seq("hub", "l1", "l2", "l3"),
      Seq("hub" -> "l1", "hub" -> "l2", "hub" -> "l3"))
    assert(r("hub")._2 > r("l1")._2)
    assert(Set(r("l1")._2, r("l2")._2, r("l3")._2).size === 1)
    assert(r("hub")._1 === 3 && r("l1")._1 === 1)
  }

  test("isolated node keeps the teleport floor and zero out-degree") {
    val r = ranks(Seq("a", "b", "x"), Seq("a" -> "b"))
    assert(r("x")._2 === (Graph.Scale - Graph.DampPpm) / 3)
    assert(r("x")._1 === 0L)
    assert(r("a")._2 > r("x")._2)
  }

  test("ranks are a pure function of the input (two runs bit-identical)") {
    val edges = Seq("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "d")
    val r1 = ranks(Seq("a", "b", "c", "d"), edges)
    val r2 = ranks(Seq("a", "b", "c", "d"), edges)
    assert(r1 === r2)
  }

  test("more iterations move a chain's ranks toward the endpoints' deficit") {
    // on a path a-b-c the middle node has two in-edges: its rank must
    // exceed the endpoints', and iteration must change SOMETHING vs the
    // uniform start (guards against a loop that never updates)
    val r = ranks(Seq("a", "b", "c"), Seq("a" -> "b", "b" -> "c"), iters = 5)
    assert(r("b")._2 > r("a")._2)
    assert(r("a")._2 === r("c")._2)
    assert(r("b")._2 !== Graph.Scale / 3)
  }

  test("triangle stats: a 4-clique is all-triangles, a pendant node is none") {
    // K4 on a,b,c,d plus pendant x-a: each K4 node sits in C(3,2)=3
    // triangles with coefficient 1.0; x has degree 1 -> 0
    val nodes = Seq("a", "b", "c", "d", "x").toDF("node")
    val edges = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d",
      "c" -> "d", "a" -> "x").map { case (u, v) => if (u < v) (u, v) else (v, u) }
      .toDF("u", "v")
    val r = Graph.triangleStats(nodes, edges).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("b") === ((3L, 3L, 1000000L)))
    assert(r("c") === ((3L, 3L, 1000000L)))
    assert(r("x") === ((1L, 0L, 0L)))
    // a has the extra pendant edge: deg 4, still 3 triangles -> 2*3/(4*3)
    assert(r("a") === ((4L, 3L, 500000L)))
  }

  test("q_triangles registers and finds the fixture's copy-ring structure") {
    val df = graft.queries.PipelineQueries.triangles(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq === Seq("source", "deg", "n_tri", "clust_ppm"))
    val rows = df.collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(2)).sum === 3 * 5, "sf0.001 graph has 5 triangles")
  }

  test("pagerank artifact: save → load is row-identical to the computed ranks") {
    val n = Seq("a", "b", "c").toDF("node")
    val e = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b").toDF("src", "dst")
    val computed = Graph.pageRank(n, e)
    val path = java.nio.file.Files.createTempDirectory("graft_pr_art").toFile.getAbsolutePath
    Artifacts.savePageRank(computed, path)
    val loaded = Artifacts.loadPageRank(spark, path)
    // parquet reads everything nullable — compare names + types
    assert(loaded.schema.map(f => (f.name, f.dataType)) ===
      computed.schema.map(f => (f.name, f.dataType)))
    assert(loaded.orderBy("node").collect().toSeq ===
      computed.orderBy("node").collect().toSeq)
  }

  test("q_pagerank registers with deterministic schema and plausible values") {
    val df = graft.queries.PipelineQueries.pageRank(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq === Seq("source", "out_deg", "rank_ppm"))
    val rows = df.collect()
    assert(rows.length === 20)
    val floor = (Graph.Scale - Graph.DampPpm) / rows.length
    // every node holds at least the teleport floor; nothing exceeds the
    // total mass; connected sources differentiate from isolated ones
    assert(rows.forall(r => r.getLong(2) >= floor && r.getLong(2) < Graph.Scale))
    val (conn, iso) = rows.partition(_.getLong(1) > 0)
    assert(conn.nonEmpty, "fixture graph should have edges at sf0.001")
    assert(iso.forall(_.getLong(2) === floor))
    assert(conn.map(_.getLong(2)).max > floor)
  }
}
