package graft

import graft.queries.{EtlQueries, RelationalQueries}

/** Plan-shape assertions tying the scale claims to the optimizer's
  * actual output (SURVEY.md §4.1: pushdown, pruning, broadcast).
  */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(q: String, pack: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame]) =
    pack(q)(spark, sf).queryExecution.executedPlan.toString

  test("q_agg_pricing: shipdate predicate is pushed to the parquet scan") {
    val p = plan("q_agg_pricing", RelationalQueries.queries)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"plan:\n$p")
  }

  test("q_agg_pricing: scan reads only the referenced columns") {
    val p = plan("q_agg_pricing", RelationalQueries.queries)
    assert(p.contains("ReadSchema: struct<l_quantity"), s"plan:\n$p")
    assert(!p.contains("l_partkey"), s"l_partkey should be pruned:\n$p")
    assert(!p.contains("l_suppkey"), s"l_suppkey should be pruned:\n$p")
  }

  test("q_broadcast_lookup_join: all three dim decodes broadcast") {
    val p = plan("q_broadcast_lookup_join", EtlQueries.queries)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected ≥3 BroadcastHashJoins, got $broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no dim decode should sort-merge:\n$p")
  }

  test("q_join_topk: aggregation is partial (map-side combine) before the exchange") {
    val p = plan("q_join_topk", RelationalQueries.queries)
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), s"plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k should avoid a global sort:\n$p")
  }
}
