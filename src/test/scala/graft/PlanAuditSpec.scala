package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression guards: the declared queries must keep the
  * plan shapes they were tuned to (broadcast small sides, planning-time
  * partition pruning, top-k pushdown, column pruning). A change that
  * silently degrades one of these to a shuffle join or a full scan fails
  * here instead of only showing up as a bench regression. */
class PlanAuditSpec extends GraftSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(key: String): String = {
    val df: DataFrame = SparkEntry.queries(key)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q10: dimension joins are broadcast, not shuffle") {
    val p = plan("q10_join_users_dim")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q06: day read prunes partitions at planning time") {
    val p = plan("q06_partition_pruned_scan")
    assert(p.contains("PartitionFilters: [isnotnull(date"))
  }

  test("q18: limit folds into TakeOrderedAndProject (no global sort)") {
    val p = plan("q18_token_counts")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q19: corpus never shuffles — broadcast nested loop over queries") {
    val p = plan("q19_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q24: scan reads only the needed columns") {
    val p = plan("q24_quality_score")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("q11: anti join stays a join, not a cartesian") {
    val p = plan("q11_anti_join")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("no CollectLimit-to-driver in any declared aggregate query") {
    // collect()-shaped operators in a declared plan would mean driver-side
    // data movement; the only driver scalars allowed are in q06/q33's
    // literal lookup, which happens at plan-build time, not in the plan.
    Seq("q01_distinct_users", "q02_requests_per_user", "q15_totals_row",
      "q20_near_dedup", "q30_centroids").foreach { k =>
      assert(!plan(k).contains("CollectLimitExec"), s"$k collects to driver")
    }
  }
}
