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

  /** The r16 global-window audit: an empty-partition-spec Window plans
    * as ONE task sorting its whole input — invisible to the bench and
    * the oracle at fixture scale (both r15 weak flags, q_rfm and
    * q_interval_concurrency, were exactly this), so the guard has to
    * be structural. Every batch query's plan is swept (AQE disabled
    * for the build so the physical tree is walkable; partition specs
    * are AQE-invariant) and each query that plans a global Window or
    * WindowGroupLimit must carry a bounded-frame justification in
    * [[graft.queries.BoundedFrames]]; stale entries fail too.
    * Limitation (documented): windows inside InMemoryRelation cached
    * plans are not visible to the walk — cache sites are few and
    * individually audited (CacheHygieneSpec).
    */
  test("every empty-partition-spec Window is justified as bounded-frame") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val found = scala.collection.mutable.SortedMap[String, Int]()
    val errors = scala.collection.mutable.ListBuffer[(String, String)]()
    withConf("spark.sql.adaptive.enabled" -> "false") {
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (name, _) =>
          name.startsWith("q_stream_") || skip(name)
        }
        .foreach { case (name, fn) =>
          try {
            val plan = fn(spark, sf).queryExecution.executedPlan
            val n = plan.collectWithSubqueries {
              case w: WindowExec if w.partitionSpec.isEmpty => 1
              case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => 1
            }.sum
            if (n > 0) found(name) = n
          } catch {
            case e: Throwable => errors += name -> s"${e.getMessage}"
          } finally {
            graft.queries.QueryCaches.releaseAll(spark)
          }
        }
    }
    assert(errors.isEmpty, s"failed to plan: $errors")
    val justified = graft.queries.BoundedFrames.globalWindowJustified
    val unjustified = found.keySet -- justified.keySet
    assert(unjustified.isEmpty,
      s"""global (single-task) windows without a bounded-frame justification:
         |  ${unjustified.toSeq.sorted.map(q => s"$q (${found(q)} window(s))").mkString("\n  ")}
         |Either re-shape with RankOps.withGlobalRank or add a
         |BoundedFrames entry naming the bound.""".stripMargin)
    val stale = justified.keySet -- found.keySet
    assert(stale.isEmpty,
      s"stale BoundedFrames entries (no global window planned): ${stale.toSeq.sorted}")
  }
}
