package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property: the distributed gaps-and-islands contamination spans equal
  * a driver-side reference fold on arbitrary tiny-vocab corpora —
  * duplicate grams, repeated passages, probes with no overlap.
  */
object ContamSpanProps extends Properties("graft.contamSpans") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkTestSession.session
  private val NGram = 3

  // tiny vocabulary makes shared n-grams (and repeated ones) likely
  private val docGen: Gen[String] =
    Gen.chooseNum(NGram, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  private def grams(text: String): Vector[String] =
    text.split(" ").toVector.sliding(NGram).filter(_.size == NGram)
      .map(_.mkString(" ")).toVector

  /** Reference: per (doc, probe), positions whose gram is in the
    * probe's gram set; islands of consecutive positions; (count,
    * max run, max run + n − 1).
    */
  private def reference(docs: List[(Long, String)], probes: List[(Long, String)])
  : Map[(Long, Long), (Long, Long, Long)] =
    (for {
      (did, dtext) <- docs
      (pid, ptext) <- probes
      pset = grams(ptext).toSet
      hits = grams(dtext).zipWithIndex.collect { case (g, i) if pset(g) => i }
      if hits.nonEmpty
    } yield {
      val runs = scala.collection.mutable.ListBuffer.empty[Int]
      var prev = Int.MinValue
      hits.foreach { pos =>
        if (pos == prev + 1) runs(runs.size - 1) += 1 else runs += 1
        prev = pos
      }
      (did, pid) -> ((hits.size.toLong, runs.max.toLong, runs.max.toLong + NGram - 1))
    }).toMap

  property("operator == sequential reference fold") =
    Prop.forAll(
      Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, docGen)),
      Gen.chooseNum(1, 2).flatMap(k => Gen.listOfN(k, docGen))) { (dTexts, pTexts) =>
      import spark.implicits._
      val docs = dTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val probes = pTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
      val got = Dedup.contaminationSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        probes.toDF("doc_id", "text"), "doc_id", "text", NGram,
        maxShingleDf = None)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val want = reference(docs, probes)
      Prop(got == want) :| s"got=$got want=$want docs=$docs probes=$probes"
    }
}
