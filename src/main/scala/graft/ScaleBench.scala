package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence bench: the 100×-scale claims in SURVEY/PERF rest on
  * plan audits (no cartesian, bucketed pair generation, bounded
  * driver state); this main adds the MEASURED data point the audits
  * can't — does wall-clock actually grow ~linearly with input rows?
  *
  * Two modes:
  *   - default: the ten heaviest documents-driven queries at
  *     k ∈ SPARK_GRAFT_SCALE_KS (default 1,4,10; 10× sf0.1 documents =
  *     the sf1 row count for the codec/dedup/ANN families), min of
  *     SPARK_GRAFT_SCALE_RUNS (default 2) per point;
  *   - SPARK_GRAFT_SCALE_FULL=1: the ENTIRE registry once per k
  *     (default ks 1,4; runs default 1) — the sweep that catches a
  *     superlinear query OUTSIDE the heavy-10.
  *
  * Every table is blown up k× with FK-CONSISTENT key remapping (each
  * copy joins inside its own copy-space, so join selectivities match
  * a genuinely larger SF): customer/supplier/part/orders/lineitem
  * offset by their referenced key's base cardinality, events by
  * event and user, documents/embeddings by doc/vec id — id-derived
  * fixture content stays distribution-identical. The two tiny dims
  * (region, nation) stay fixed, as dims do at scale.
  *
  * Output: a markdown table on stdout (pasted into PERF.md), the full
  * artifact at target/scale_bench.json, and ONE compact JSON line
  * LAST for bounded tail captures.
  */
object ScaleBench {

  /** The heaviest documents/embeddings-driven registry queries (from
    * the per-round bench), plus the pretraining capstone.
    */
  val DefaultQueries: Seq[String] = Seq(
    "q_crawl_pipeline", "q_scan_pipeline", "q_sign_pipeline",
    "q_dsir_resample", "q_dup_clusters", "q_decontaminate",
    "q_dedup_minhash", "q_dedup_ngram", "q_ann_sq", "q_pretrain_corpus")

  private def scaleTable(df: DataFrame, remaps: Seq[(String, Long)], k: Int): DataFrame =
    if (k <= 1 || remaps.isEmpty) df
    else {
      val blown = df.withColumn("_copy", explode(lit((0 until k).toArray)))
      remaps.foldLeft(blown) { case (acc, (c, unit)) =>
        acc.withColumn(c, col(c) + col("_copy") * unit)
      }.drop("_copy")
    }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val full = sys.env.get("SPARK_GRAFT_SCALE_FULL").exists(v => v == "1" || v == "true")
    val ks = sys.env.getOrElse("SPARK_GRAFT_SCALE_KS", if (full) "1,4" else "1,4,10")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", if (full) "1" else "2").toInt
    val registry = SparkEntry.queries
    val queryNames = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(if (full) registry.keys.toSeq.sorted else DefaultQueries)
    queryNames.foreach(q => require(registry.contains(q), s"unknown query: $q"))
    val spark = GraftSession.local()

    // ---- FK-consistent remap spec: offset unit = referenced key's base cardinality
    def unitOf(table: String, col0: String): Long =
      spark.read.parquet(s"$base/$table.parquet").agg(max(col(col0))).head.getLong(0) + 1
    val nCust = unitOf("customer", "c_custkey")
    val nSupp = unitOf("supplier", "s_suppkey")
    val nPart = unitOf("part", "p_partkey")
    val nOrd = unitOf("orders", "o_orderkey")
    val nEvt = unitOf("events", "event_id")
    val nUser = unitOf("events", "user_id")
    val nDoc = unitOf("documents", "doc_id")
    val nVec = unitOf("embeddings", "vec_id")
    val remaps: Map[String, Seq[(String, Long)]] = Map(
      "customer" -> Seq("c_custkey" -> nCust),
      "supplier" -> Seq("s_suppkey" -> nSupp),
      "part" -> Seq("p_partkey" -> nPart),
      "orders" -> Seq("o_orderkey" -> nOrd, "o_custkey" -> nCust),
      "lineitem" -> Seq("l_orderkey" -> nOrd, "l_partkey" -> nPart, "l_suppkey" -> nSupp),
      "events" -> Seq("event_id" -> nEvt, "user_id" -> nUser),
      "documents" -> Seq("doc_id" -> nDoc),
      "embeddings" -> Seq("vec_id" -> nVec))

    // ---- build scaled input dirs (idempotent per k; full mode gets its
    // own dirs because it remaps more tables than the default mode did)
    val tag = if (full) "full" else "docs"
    val dirs: Map[Int, String] = ks.map { k =>
      val dir = s"target/scale/$tag-x$k"
      val ok = java.nio.file.Paths.get(dir, "_OK")
      if (!java.nio.file.Files.exists(ok)) {
        Tables.names.foreach { t =>
          val df = spark.read.parquet(s"$base/$t.parquet")
          val out =
            if (full) scaleTable(df, remaps.getOrElse(t, Seq.empty), k)
            else scaleTable(df, remaps.getOrElse(t, Seq.empty).filter(r =>
              t == "documents" || t == "embeddings"), k)
          out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
        }
        java.nio.file.Files.createFile(ok)
      }
      k -> dir
    }.toMap
    val docRows: Map[Int, Long] = ks.map { k =>
      k -> spark.read.parquet(s"${dirs(k)}/documents.parquet").count()
    }.toMap

    Bench.warmup(spark, dirs(ks.head))

    // ---- time: per query, per k, min of `runs` ----
    val results: Seq[(String, Map[Int, Double])] = queryNames.map { q =>
      val fn = registry(q)
      val perK = ks.map { k =>
        val times = (0 until runs).map { _ =>
          val (t, err) = Bench.timeOnce(spark, dirs(k), fn)
          err.foreach { e =>
            System.err.println(s"[scale-bench] $q at x$k failed: $e"); sys.exit(1)
          }
          t
        }
        k -> times.min
      }.toMap
      System.err.println(s"[scale-bench] $q: " +
        ks.map(k => f"x$k=${perK(k)}%.2fs").mkString(" "))
      q -> perK
    }

    // ---- report ----
    val kMin = ks.head
    val kMax = ks.last
    val rowRatio = docRows(kMax).toDouble / docRows(kMin)
    def md(d: Double): String = f"$d%.2f"
    val sb = new StringBuilder
    sb.append(f"documents rows: ${ks.map(k => s"x$k=${docRows(k)}").mkString(", ")} " +
      f"(row ratio x$kMax/x$kMin = $rowRatio%.1f)\n\n")
    sb.append(s"| query | ${ks.map(k => s"x$k (s)").mkString(" | ")} | growth t(x$kMax)/t(x$kMin) | µs/row at x$kMax |\n")
    sb.append(s"|---${"|---" * (ks.size + 2)}|\n")
    results.foreach { case (q, perK) =>
      val growth = perK(kMax) / perK(kMin)
      val usPerRow = perK(kMax) * 1e6 / docRows(kMax)
      sb.append(s"| $q | ${ks.map(k => md(perK(k))).mkString(" | ")} | " +
        s"${md(growth)}× | ${md(usPerRow)} |\n")
    }
    println(sb.toString)

    def jm(m: Map[Int, Double]): String =
      ks.map(k => s""""x$k":${m(k)}""").mkString("{", ",", "}")
    val qJson = results.map { case (q, perK) => s""""$q":${jm(perK)}""" }.mkString("{", ",", "}")
    val rowsJson = ks.map(k => s""""x$k":${docRows(k)}""").mkString("{", ",", "}")
    val line = s"""{"metric":"scale_growth","base":"$base","full":$full,"ks":[${ks.mkString(",")}],""" +
      s""""doc_rows":$rowsJson,"runs":$runs,"queries":$qJson,""" +
      s""""cpus":${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}}"""
    val out = java.nio.file.Paths.get(
      if (full) "target/scale_bench_full.json" else "target/scale_bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    spark.stop()
    println(line)
  }
}
