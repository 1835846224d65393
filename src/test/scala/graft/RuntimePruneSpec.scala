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

  test("without a selective join the scan plans every file (control)") {
    AsciiGridScanStats.lastRuntimePlanned = -1
    val tree = spark.read.format("asciigrid")
      .load(s"${System.getProperty("java.io.tmpdir")}/graft_spj_tree")
    assert(tree.count() == 31)
    assert(AsciiGridScanStats.lastRuntimePlanned == -1,
      "an unfiltered scan must not take the runtime-filtered path")
  }
}
