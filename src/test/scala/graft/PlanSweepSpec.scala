package graft

/** Suite-wide scale guard: EVERY batch query's physical plan is built
  * and swept for shuffle products. The per-query pins in PlanShapeSpec
  * assert the shapes that matter for specific operators; this sweep is
  * the backstop that a future edit cannot quietly introduce an
  * unpartitionable CartesianProduct anywhere in the 150-query surface —
  * the one plan node that has no 100 TB posture at all (a
  * BroadcastNestedLoopJoin is fine: its build side is bounded by the
  * broadcast threshold by construction).
  *
  * Streaming queries are excluded (building their result executes the
  * stream against the state store — covered by their own oracle gate
  * and StreamingSpec), as are the iterative clustering queries whose
  * CONSTRUCTION runs fixpoint jobs (their round shape is pinned in
  * PlanShapeSpec/GraphOps tests).
  */
class PlanSweepSpec extends SparkSpecBase {

  private val skip: Set[String] = Set(
    // construction executes jobs (fixpoint rounds / driver sketches)
    "q_dedup_cluster", "q_semantic_cluster", "q_pagerank",
    "q_triangle_count", "q_dedup_bloom",
  )

  test("no batch query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) =>
        name.startsWith("q_stream_") || skip(name)
      }
      .flatMap { case (name, fn) =>
        val hit =
          try {
            val p = fn(spark, sf).queryExecution.executedPlan.toString
            if (p.contains("CartesianProduct")) Some(name -> "CartesianProduct")
            else None
          } catch {
            case e: Throwable => Some(name -> s"failed to plan: ${e.getMessage}")
          } finally {
            graft.queries.QueryCaches.releaseAll(spark)
          }
        hit
      }
    assert(offenders.isEmpty,
      s"queries with shuffle products or planning failures: $offenders")
  }
}
