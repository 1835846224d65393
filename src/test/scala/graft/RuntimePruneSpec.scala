package graft

import graft.sources.asciigrid.AsciiGridScanStats

/** Proves DSv2 dynamic partition pruning reaches the asciigrid LISTING:
  * the selective nation-dim join must shrink the planned partitions to
  * the surviving regions' files — regions r00/r04/r08/r12 hold
  * 1+2+3+1 = 7 grids of the tree's 31. The pruned files leave no other
  * observable trace (they are simply never opened), hence the scan's
  * planned-partition counter.
  */
class RuntimePruneSpec extends SparkSpecBase {

  test("q_runtime_prune_source: runtime filter prunes the listing to the joined regions") {
    AsciiGridScanStats.lastRuntimePlanned = -1
    val df = graft.queries.EtlQueries.queries("q_runtime_prune_source")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 4, rows.mkString(", "))
    assert(AsciiGridScanStats.lastRuntimePlanned == 7,
      s"expected the runtime filter to plan exactly the 7 surviving files, " +
        s"got ${AsciiGridScanStats.lastRuntimePlanned} " +
        s"(-1 = Spark never delivered runtime filters to the scan)")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RuntimeFilters: [dynamicpruning"),
      s"the BatchScan node must carry the dynamic pruning predicate:\n$p")
    graft.queries.QueryCaches.releaseAll(spark)
  }

  test("RegionPredicateEval: IN/= prune, unknown shapes conservatively keep") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.unsafe.types.UTF8String
    import graft.sources.asciigrid.RegionPredicateEval
    val region = Expressions.column("region")
    def lit(s: String) = Expressions.literal(UTF8String.fromString(s))
    val in = new Predicate("IN", Array(region, lit("r01"), lit("r02")))
    assert(RegionPredicateEval.eval(in, "r01"))
    assert(!RegionPredicateEval.eval(in, "r05"))
    val eq = new Predicate("=", Array(region, lit("r03")))
    assert(RegionPredicateEval.eval(eq, "r03"))
    assert(!RegionPredicateEval.eval(eq, "r04"))
    val and = new Predicate("AND", Array[org.apache.spark.sql.connector.expressions.Expression](in, eq))
    assert(!RegionPredicateEval.eval(and, "r01"), "AND must require both sides")
    // unknown predicate name, or a predicate on another column: keep
    val unknown = new Predicate("STARTS_WITH", Array(region, lit("r0")))
    assert(RegionPredicateEval.eval(unknown, "zzz"),
      "unrecognized predicate shapes must keep the file (the join re-filters)")
    val otherCol = new Predicate("=", Array(Expressions.column("path"), lit("x")))
    assert(RegionPredicateEval.eval(otherCol, "r09"))
  }

  test("without a selective join the scan plans every file (control)") {
    AsciiGridScanStats.lastRuntimePlanned = -1
    // build (or rebuild) the shared side tree ourselves: run in
    // isolation this test must not depend on an earlier test or query
    // having materialized it in this JVM
    val treePath = graft.queries.EtlQueries.spjTree()
    val tree = spark.read.format("asciigrid").load(treePath)
    assert(tree.count() == 31)
    assert(AsciiGridScanStats.lastRuntimePlanned == -1,
      "an unfiltered scan must not take the runtime-filtered path")
  }
}
