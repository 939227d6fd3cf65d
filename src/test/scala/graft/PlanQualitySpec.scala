package graft

import org.apache.spark.sql.DataFrame

/** Plan-quality regression guards: the physical plans the 100 TB design
  * depends on (SCALE.md) must survive refactors. Checked against sf0.001
  * so the suite stays fast; the asserted properties are size-independent
  * (explicit broadcast hints, filter pushdown, map-side partial
  * aggregation). */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_p2: filters reach the parquet scan (PushedFilters)") {
    val p = plan("q_p2_filter_project")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("EqualTo(l_returnflag,R)"), p.take(2000))
    // plan strings truncate long filter lists — match the stable prefix
    assert(p.contains("GreaterThanOrEqual(l_qu"), p.take(2000))
  }

  test("q_p2: scan reads only referenced columns") {
    val p = plan("q_p2_filter_project")
    // 16-column lineitem pruned to the 6 referenced ones
    assert(p.contains("ReadSchema"), p.take(500))
    assert(!p.contains("l_comment"), "unreferenced column not pruned")
    assert(!p.contains("l_shipdate"), "unreferenced column not pruned")
  }

  test("q_j2: dimension joins are broadcast hash joins, fact side streams") {
    val p = plan("q_j2_equi_join")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "small-dim join degraded to sort-merge:\n" + p.take(1500))
  }

  test("q_a1: aggregation is map-side partial before one exchange") {
    val p = plan("q_a1_oi")
    assert(p.contains("partial_sum"), p.take(1200))
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "OI panel must shuffle exactly once:\n" + p.take(1500))
  }

  test("q_j6: all three dimension joins broadcast") {
    val p = plan("q_j6_dim_join")
    val n = p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin")
    assert(n == 3, s"expected 3 broadcast joins, saw $n:\n" + p.take(1500))
  }

  test("q_w1: all window columns share one Window operator (one sort)") {
    val p = plan("q_w1_lag_lead")
    val n = p.sliding("Window".length).count(_ == "Window") -
      p.sliding("WindowGroupLimit".length).count(_ == "WindowGroupLimit")
    assert(p.contains("lag") && p.contains("lead"))
    assert(n <= 2, s"window fan-out (saw $n Window nodes):\n" + p.take(1500))
  }
}
