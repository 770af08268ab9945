package graft

import org.apache.spark.sql.functions._

/** Measurement main for the q_semdedup nlist ∝ N adjudication (PERF.md):
  * the fixture pins the IVF list count for the oracle, so its ×10 scale
  * point grows quadratically within clusters (~54× at ×10 rows). The
  * standing claim is that at production scale nlist scales WITH the
  * corpus (standard IVF sizing), bounding per-cluster pair counts and
  * keeping the wall ~linear. This lab measures all three points on the
  * SAME scaled fixtures the sweep uses:
  *
  *   x1/k        — the fixture shape at base size;
  *   x10/k       — 10× rows, nlist PINNED (the sweep's outlier);
  *   x10/k×10    — 10× rows, nlist ∝ N (the deployment shape).
  *
  * Reported per point: min-of-3 wall of the full semDedup, total
  * within-cluster pair count (the actual quadratic term), and the max
  * cluster size. Run with the docs-x10 scaled dir already built by
  * ScaleBench:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.SemdedupScaleLab"
  */
object SemdedupScaleLab {
  private val Dim = 64

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val x10 = sys.env.getOrElse("SPARK_GRAFT_SCALE_X10_DIR", "target/scale/docs-x10")
    val k0 = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_K", "8").toInt

    def centroids(k: Int): Seq[Seq[Double]] =
      (0 until k).map(i => (1 to Dim).map(d => graft.functions.Hashing.hyperplane(100 + i, d)).toSeq)

    def run(dir: String, k: Int): (Double, Long, Long, Long) = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val cs = centroids(k)
      val sizes = graft.operators.Similarity.withIvfList(emb, "embedding", Dim, cs)
        .groupBy("ivf_list").count().select(col("count"))
        .collect().map(_.getLong(0)) // ≤ nlist rows — bounded driver state
      val pairs = sizes.map(c => c * (c - 1) / 2).sum
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Similarity.semDedup(emb, "vec_id", "embedding", Dim, cs, 0.4)
          .select(xxhash64(col("id"), col("list_id")).cast("double").as("h"))
          .agg(sum("h")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      (times.min, sizes.sum, pairs, sizes.max)
    }

    val (t1, n1, p1, m1) = run(base, k0)
    val (tf, nf, pf, mf) = run(x10, k0)       // 10× rows, nlist pinned
    val (tp, np, pp, mp) = run(x10, k0 * 10)  // 10× rows, nlist ∝ N, pinned ratio
    // the DEFAULT path users call: semDedupAuto derives nlist from the
    // corpus itself (autoNlist = rows/250, r17) — measured so the lab
    // describes the shipped default, not just the hand-scaled ratio
    val (ta, na, pa, ma) = {
      val emb = spark.read.parquet(s"$x10/embeddings.parquet")
      val kAuto = graft.operators.Similarity.autoNlist(emb.count())
      run(x10, kAuto) match { case (t, n, p, m) => (t, n, p, m) }
    }
    val kAuto = graft.operators.Similarity.autoNlist(na)
    def ms(t: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))
    val line =
      s"""{"metric":"semdedup_nlist","x1":{"k":$k0,"rows":$n1,"pairs":$p1,"max_cluster":$m1,"sec":${ms(t1)}},""" +
        s""""x10_pinned":{"k":$k0,"rows":$nf,"pairs":$pf,"max_cluster":$mf,"sec":${ms(tf)}},""" +
        s""""x10_scaled":{"k":${k0 * 10},"rows":$np,"pairs":$pp,"max_cluster":$mp,"sec":${ms(tp)}},""" +
        s""""x10_auto":{"k":$kAuto,"rows":$na,"pairs":$pa,"max_cluster":$ma,"sec":${ms(ta)}},""" +
        s""""growth_pinned":${ms(tf / t1)},"growth_scaled":${ms(tp / t1)},"growth_auto":${ms(ta / t1)},""" +
        s""""pair_growth_pinned":${ms(pf.toDouble / p1)},"pair_growth_scaled":${ms(pp.toDouble / p1)},""" +
        s""""cpus":${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}}"""
    val out = java.nio.file.Paths.get("target/semdedup_scale.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    spark.stop()
    println(line)
  }
}
