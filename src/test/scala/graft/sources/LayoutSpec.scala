package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout: morton-value correctness and the skipping property
  * that justifies it — files written z-ordered cover small rectangles of
  * the 2-d key space, so min/max stats can prune box queries.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known values) and clamps out-of-range inputs") {
    val out = Seq((0, 0), (1, 0), (0, 1), (3, 5), (1000, -7)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 3).as("z")).as[Long].collect().toSeq
    // a=3 (011), b=5 (101): z = b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 39
    // a=1000 clamps to 7 (111), b=-7 clamps to 0: z = 010101 = 21
    assert(out === Seq(0L, 1L, 2L, 39L, 21L))
  }

  test("z-ordered files tile the key plane: per-file spans shrink vs ingestion order") {
    // 64×64 grid in random ingestion order; 16 output files either way.
    // Seeded so a threshold failure is replayable.
    val rows = new scala.util.Random(42).shuffle(
      (for (a <- 0 until 64; b <- 0 until 64) yield (a, b)).toList)
    val df = rows.toDF("a", "b")
    def meanSpan(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dir = Files.createTempDirectory("graft_zorder").toFile.getAbsolutePath
      laid.write.mode("overwrite").parquet(dir)
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa"), avg("sb")).head
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (za, zb) = meanSpan(Layout.zOrdered(df, "a", "b", bits = 6, numFiles = 16))
    val (ra, rb) = meanSpan(df.repartition(16))
    // random layout: every file spans ~the full 0..63 range on both axes;
    // z-order: 16 files tile the curve into 16×16 rectangles (span ~15).
    assert(ra > 55 && rb > 55, s"random layout should span the range, got ($ra, $rb)")
    assert(za < 20 && zb < 20, s"z-ordered spans should be ~16, got ($za, $zb)")
  }
}
