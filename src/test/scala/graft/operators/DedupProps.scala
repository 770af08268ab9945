package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property: large-star/small-star connected components equal a
  * driver-side union-find on arbitrary random graphs — self-loops,
  * parallel edges, isolated nodes, and multi-component shapes
  * included. The chain fixtures in DedupSpec pin the O(log) round
  * bound; this pins CORRECTNESS over the shapes chains don't cover.
  */
object DedupProps extends Properties("graft.duplicateClusters") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkTestSession.session

  private val nodeCount = 24
  private val edgeGen: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(1L, nodeCount.toLong)
    b <- Gen.chooseNum(1L, nodeCount.toLong)
  } yield (a, b)

  /** Reference: path-compressed union-find labeling by component min. */
  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((1L to nodeCount.toLong).map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (1L to nodeCount.toLong).map(i => i -> find(i)).toMap
  }

  property("star contraction == union-find on random graphs") =
    Prop.forAll(Gen.listOfN(30, edgeGen)) { edges =>
      import spark.implicits._
      val docs = (1L to nodeCount.toLong).map(i => (i, s"d$i")).toDF("doc_id", "text")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = Dedup.duplicateClusters(docs, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
      val want = unionFind(edges)
      Prop(got == want) :| s"got=${got.toSeq.sorted} want=${want.toSeq.sorted} edges=$edges"
    }
}
