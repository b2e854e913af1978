package graft

/** Physical-plan audits: the 100 TB story is in the plan, not the row
  * counts — assert the plans stay the ones we designed (SURVEY §4).
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("filters and projections push into the parquet scan") {
    val p = plan("filt_between")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull"), p)
    // pruned read schema: only the 3 referenced columns
    assert(p.contains("l_quantity") && !p.contains("l_extendedprice"), p)
  }

  test("small dimension joins broadcast (no shuffle of the fact)") {
    val p = plan("join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("5-way star join broadcasts region+nation") {
    val p = plan("join_5way_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("aggregations are partial+final (map-side combine)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("semi/anti joins plan as join types, not subquery re-execution") {
    assert(plan("join_semi").contains("LeftSemi"), plan("join_semi"))
    assert(plan("join_anti").contains("LeftAnti"), plan("join_anti"))
  }

  test("whole-stage codegen covers the custom vector expression") {
    // AQE finalizes the plan only on execution — run, then inspect
    val df = SparkEntry.queries("sim_bruteforce_topk")(spark, sf0001)
    df.collect() // count() would plan a different query execution
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages print as "*(n) Operator" in simpleString
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, p)
    assert(p.contains("cosinesimilarityf32"), p)
  }

  test("top-k uses TakeOrdered, not a full sort") {
    val p = plan("sort_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("theta residual stays attached to a hash/sort-merge join, not BNL") {
    val p = plan("join_theta_residual")
    assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("as-of join extracts the equi key (interval stays residual, not BNL)") {
    val p = plan("join_asof")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("deterministic split is map-only: no shuffle in the plan") {
    val p = plan("text_train_test_split")
    assert(!p.contains("Exchange"), p)
  }

  test("stacked same-partition windows share one shuffle") {
    // dense_rank + max windows both partition by l_returnflag — the
    // partitioning must be reused, not re-shuffled per window
    val p = plan("win_count_distinct")
    assert("Exchange".r.findAllIn(p).size === 1, p)
  }

  test("funnel plans as keyed joins, never a nested loop") {
    val p = plan("evt_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
