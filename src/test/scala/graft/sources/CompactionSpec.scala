package graft.sources

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def files(rows: (String, Long, Long)*) =
    rows.toSeq.toDF("dir", "file_id", "bytes")

  private def plan(df: org.apache.spark.sql.DataFrame, target: Long) =
    Layout.compactionPlan(df, "dir", "file_id", "bytes", target)
      .collect()
      .map(r => (r.getAs[String]("dir"), r.getAs[String]("kind"), r.getAs[Long]("bin_id"),
        r.getAs[Long]("n_files"), r.getAs[Long]("total_bytes"),
        r.getAs[Long]("min_id"), r.getAs[Long]("max_id")))
      .sortBy(t => (t._1, t._2, t._3))

  test("small files pack into target-sized bins in id order") {
    // 4 files of 40 bytes at target 100: cum-before 0,40,80,120 → bins 0,0,0,1
    val out = plan(files(("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L), ("a", 4L, 40L)), 100L)
    assert(out.toSeq == Seq(
      ("a", "packed", 0L, 3L, 120L, 1L, 3L),
      ("a", "packed", 1L, 1L, 40L, 4L, 4L)))
  }

  test("a bin may overflow by at most one file") {
    // 99 + 99: second file starts at cum-before 99 < 100 → same bin, 198 bytes
    val out = plan(files(("a", 1L, 99L), ("a", 2L, 99L), ("a", 3L, 99L)), 100L)
    val bin0 = out.find(_._3 == 0L).get
    assert(bin0._4 == 2L && bin0._5 == 198L)
    assert(bin0._5 < 2 * 100L) // overflow strictly less than target
  }

  test("files at or above target keep their own bins") {
    val out = plan(files(("a", 7L, 100L), ("a", 8L, 5000L), ("a", 9L, 10L)), 100L)
    val larges = out.filter(_._2 == "large")
    assert(larges.map(t => (t._3, t._4, t._5)).toSeq == Seq((7L, 1L, 100L), (8L, 1L, 5000L)))
    assert(out.count(_._2 == "packed") == 1)
  }

  test("partitions pack independently and bytes are conserved") {
    val in = files(("a", 1L, 30L), ("a", 2L, 30L), ("b", 1L, 30L), ("b", 2L, 200L))
    val out = plan(in, 100L)
    assert(out.filter(_._1 == "a").forall(_._2 == "packed"))
    assert(out.map(_._5).sum == 290L)
    assert(out.map(_._4).sum == 4L)
  }
}
