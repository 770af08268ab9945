package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-stage-codegen health of the ANN stages. Round 4's expanded
  * per-plane / per-centroid scoring inlined up to 4096 multiply-adds
  * into one generated method, blowing janino's 64 KB limit — Spark then
  * logged `ERROR CodeGenerator` and SILENTLY ran the stage interpreted.
  * `spark.sql.codegen.fallback=false` turns exactly that fallback into
  * a hard error, so these tests fail if any plan stops compiling again.
  */
class CodegenSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private val dim = 64

  private lazy val corpus: DataFrame = Tables.embeddings(spark, d)
  private lazy val queries: DataFrame = corpus.filter(col("vec_id") < 8)
  private lazy val cents: Seq[Seq[Double]] =
    (0 until 8).map(i => (1 to dim).map(dd => graft.functions.Hashing.hyperplane(100 + i, dd)).toSeq)

  private def strictCodegen[T](body: => T): T = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("multi-table LSH probe stage compiles (8 tables x 4 planes)") {
    strictCodegen {
      assert(Similarity.lshTopK(corpus, queries, "vec_id", "embedding", dim, 10,
        planes = 4, tables = 8).count() > 0)
    }
  }

  test("single-table LSH and IVF probe/assign stages compile") {
    strictCodegen {
      assert(Similarity.lshTopK(corpus, queries, "vec_id", "embedding", dim, 3,
        planes = 8).count() > 0)
      assert(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", dim, 3,
        cents, nProbe = 2).count() > 0)
      assert(Similarity.withIvfList(corpus, "embedding", dim, cents)
        .groupBy("ivf_list").count().count() > 0)
    }
  }

  test("IVF assignment is evaluated once (no inferred null-filter duplicate)") {
    // joining on a NULLABLE join key makes InferFiltersFromConstraints
    // add isnotnull(key), which pushdown substitutes into a Filter that
    // re-runs the whole k×dim assignment per corpus row (measured 2.5 s
    // of 4 s at sf0.1). withIvfList's non-nullable coalesce folds that
    // filter away — exactly one array_max must survive optimization.
    val full = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", dim, 3, cents, 2)
    val plan = full.queryExecution.optimizedPlan.toString
    assert("array_max".r.findAllIn(plan).size === 1,
      "IVF assignment expression appears more than once in the optimized plan")
  }

  test("centroid count scales the literal, not the generated code (k=64 compiles)") {
    val many = (0 until 64).map(i => (1 to dim).map(dd => graft.functions.Hashing.hyperplane(200 + i, dd)).toSeq)
    strictCodegen {
      assert(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", dim, 3,
        many, nProbe = 4).count() > 0)
    }
  }

  test("the full image-codec expression stack compiles in whole-stage codegen") {
    import graft.functions.ImageOps
    import spark.implicits._
    strictCodegen {
      val widths = Seq(1L, 2L).toDF("doc_id")
        .withColumn("img", ImageOps.synthImage(col("doc_id"), lit(20), lit(16)))
        .withColumn("out", ImageOps.jpegReencode(
          ImageOps.compressImage(ImageOps.scanMinimal(col("img"), "balanced"), "minimum"), 70))
        .withColumn("seeded", ImageOps.scanSeeded(col("img"), col("doc_id"), "light"))
        .withColumn("resized", ImageOps.resizeImage(col("img"), lit(10), lit(8)))
        .select(col("out"), col("seeded"), col("resized"),
          ImageOps.imageInfo(col("out")).getField("width").as("w"))
      assert(widths.select("w").as[Int].collect().forall(_ > 0))
    }
  }
}
