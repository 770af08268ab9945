package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("first merge picks the most frequent adjacent pair, ties on pair order") {
    // "ab" ×3, "ba" ×1 → pair (a,b) count 3 beats (b,a) count 1
    val (m, _) = Bpe.train(docs("ab ab", "ab ba"), "text", steps = 1)
    assert(m === Seq(Bpe.Merge(1, "a", "b", 3)))
  }

  test("back-to-back occurrences merge greedily left-to-right (aaa -> [aa, a])") {
    val (m, vocab) = Bpe.train(docs("aaa aaa"), "text", steps = 1)
    assert(m.head.lhs === "a" && m.head.rhs === "a")
    val sym = vocab.select("sym").as[String].collect().head
    assert(sym === "  aa  a  ")
  }

  test("merged symbols participate in later merges (e r -> er, then m er -> mer)") {
    val (m, vocab) = Bpe.train(docs("mer mer mer er"), "text", steps = 2)
    assert(m.map(x => (x.lhs, x.rhs)) === Seq(("e", "r"), ("m", "er")))
    val syms = vocab.orderBy("word").select("word", "sym").as[(String, String)].collect()
    assert(syms === Seq(("er", "  er  "), ("mer", "  mer  ")))
  }

  test("merge patterns cannot false-match inside longer symbols") {
    // pair (a, b): "xa b" must NOT merge its (xa, b) via the (a, b) rule.
    // "a b" appears in: ab ×2 -> merge (a,b). xab stays x|a|b -> after
    // merge x|ab (the a-b inside xab IS a real adjacent pair — but the
    // symbol boundary " x  a " never matches " a  b " patterns mid-symbol
    val (_, vocab) = Bpe.train(docs("ab ab xab"), "text", steps = 1)
    val m = vocab.orderBy("word").select("word", "sym").as[(String, String)].collect().toMap
    assert(m("ab") === "  ab  ")
    assert(m("xab") === "  x  ab  ")
  }

  test("tokenize counts words and BPE tokens per doc") {
    val d = docs("ab ab xy", "xy")
    val (_, vocab) = Bpe.train(d, "text", steps = 1)
    val r = Bpe.tokenize(d, "doc_id", "text", vocab).orderBy("doc_id").collect()
    // doc 0: ab(1) + ab(1) + xy(2 syms: x,y — untouched) = 3 words, 4 tokens
    assert(r(0) === Row(0L, 3L, 4L))
    assert(r(1) === Row(1L, 1L, 2L))
  }

  test("token frequencies aggregate the final segmentation weighted by word count") {
    val (_, vocab) = Bpe.train(docs("ab ab ab ba"), "text", steps = 1)
    val f = Bpe.tokenFrequencies(vocab).as[(String, Long)].collect().toMap
    // vocab: ab ×3 -> [ab]; ba ×1 -> [b, a] (the (b,a) pair was not merged)
    assert(f === Map("ab" -> 3L, "b" -> 1L, "a" -> 1L))
  }

  test("segmentExpr reproduces the training segmentation on in-corpus words") {
    val d = docs("mer mer mer er")
    val (merges, vocab) = Bpe.train(d, "text", steps = 2)
    val viaVocab = vocab
      .select($"word", org.apache.spark.sql.functions.trim($"sym").as("t"))
      .as[(String, String)]
      .collect().toMap.map { case (w, t) => w -> t.split("  ").toSeq }
    val viaInference = vocab.select($"word", Bpe.segmentExpr($"word", merges).as("t"))
      .as[(String, Seq[String])].collect().toMap
    assert(viaInference === viaVocab)
  }

  test("segmentExpr on UNSEEN words applies learned pieces and falls back to chars") {
    val (merges, _) = Bpe.train(docs("mer mer mer er"), "text", steps = 2)
    // 'merx' never seen: (e,r) then (m,er) apply, 'x' stays a char
    val seg = evalStr(Seq("merx", "zzz"))(c =>
      org.apache.spark.sql.functions.array_join(Bpe.segmentExpr(c, merges), "_"))
    assert(seg === Seq("mer_x", "z_z_z"))
  }

  test("merge artifact round-trips losslessly through parquet") {
    val (merges, _) = Bpe.train(docs("ab ab ba cd cd"), "text", steps = 3)
    val path = java.nio.file.Files.createTempDirectory("bpe_rt").toFile.getAbsolutePath
    graft.operators.Artifacts.saveBpeMerges(merges, spark, path)
    assert(graft.operators.Artifacts.loadBpeMerges(spark, path) === merges)
  }

  test("training is deterministic across runs") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val (m1, _) = Bpe.train(d, "text", steps = 4)
    val (m2, _) = Bpe.train(d, "text", steps = 4)
    assert(m1 === m2)
    assert(m1.map(_.step) === Seq(1L, 2L, 3L, 4L))
    assert(m1.forall(x => x.lhs.nonEmpty && x.rhs.nonEmpty && x.pairCnt > 0))
  }
}
