package graft

/** Dev tool: prints the shuffle/join/window skeleton of selected query
  * plans so partitioning and broadcast decisions can be audited quickly
  * (`sbt "runMain graft.PlanAudit [query...]"`). Not part of the engine.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_lookup_join", "q_pick_latest", "q_rule_fallback", "q_dedup_minhash", "q_dedup_ngram")
    for (q <- names) {
      println(s"===== $q")
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parquet") ||
        l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") || l.contains("Window") ||
        l.contains("HashAggregate") || l.contains("WholeStageCodegen") || l.contains("ReusedExchange"))
        .foreach(l => println(l.take(150)))
    }
    spark.stop()
  }
}
