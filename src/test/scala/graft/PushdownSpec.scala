package graft

/** Scan-hygiene assertions: predicate pushdown and column pruning must
  * reach the parquet reader — a regression here multiplies every scan
  * at 100 TB.
  */
class PushdownSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("point lookup pushes the id filter into the parquet scan") {
    val plan = queries.ParityQueries.pointLookup(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(c_custkey"), plan.take(500))
  }

  test("point lookup prunes unused columns from the scan") {
    val plan = queries.ParityQueries.pointLookup(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("c_acctbal") && !plan.contains("c_nationkey"))
  }

  test("lookup join broadcasts every dimension (no shuffle of the fact side)") {
    val plan = queries.ParityQueries.lookupJoin(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.split("BroadcastHashJoin").length - 1 === 3)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("pick queries use the WindowGroupLimit partial top-k pushdown") {
    val plan = queries.ParityQueries.pickLatest(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }
}
