package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-partitioned join over the asciigrid DataSource V2: the
  * region-directory layout is reported as KeyGroupedPartitioning
  * (Table.partitioning + SupportsReportPartitioning +
  * HasPartitionKey per split), so two asciigrid scans joined on
  * `region` need NO exchange on either side — the V2 analog of the
  * bucketed-table join, with the layout owned by the source instead
  * of the warehouse. The conf gate matters both ways: enabled, the
  * join is exchange-free; disabled, the report is ignored and
  * per-file parallelism is untouched.
  */
class StoragePartitionedJoinSpec extends SparkSpecBase {

  private def grid(ncols: Int, v: Double): String =
    s"ncols $ncols\nnrows 1\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n" +
      s"NODATA_value -9999\n${Seq.fill(ncols)(v).mkString(" ")}\n"

  /** Three region dirs, two grids each. */
  private lazy val dir: String = {
    val root = Files.createTempDirectory("graft-spj")
    for (r <- Seq("r1", "r2", "r3")) {
      val sub = root.resolve(r)
      Files.createDirectories(sub)
      Files.writeString(sub.resolve("a.asc"), grid(2, 1.0))
      Files.writeString(sub.resolve("b.asc"), grid(3, 2.0))
    }
    root.toString
  }

  test("region column reflects the parent directory") {
    val rows = spark.read.format("asciigrid").load(dir)
      .select("region", "path").collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(
      r.getAs[String]("path").contains("/" + r.getAs[String]("region") + "/")))
  }

  test("co-partitioned scans join on region with no exchange") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.read.format("asciigrid").load(dir)
        .groupBy("region").agg(sum(col("ncols")).as("a_cols"))
      val b = spark.read.format("asciigrid").load(dir)
        .groupBy("region").agg(count(lit(1)).as("b_files"))
      val joined = a.join(b, "region")
      val rows = joined.orderBy("region").collect()
      assert(rows.length == 3)
      assert(rows.forall(r => r.getAs[Long]("a_cols") == 5L &&
        r.getAs[Long]("b_files") == 2L))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"storage-partitioned join must need no hash exchange:\n$plan")
    }
  }

  /** One grid per region: Spark propagates a V2 scan's reported
    * ordering only when every key-grouped partition holds exactly ONE
    * split (DataSourceV2ScanExecBase.outputOrdering checks
    * parts.length == 1 — with several splits per key it conservatively
    * drops the report, even though a partition-key-prefix order would
    * hold on the concatenation). So: single-split regions → the SMJ
    * runs with neither exchanges nor sorts; multi-split regions → only
    * the exchanges elide (the test above).
    */
  private lazy val dirOnePerRegion: String = {
    val root = Files.createTempDirectory("graft-spj1")
    for (r <- Seq("r1", "r2", "r3")) {
      val sub = root.resolve(r)
      Files.createDirectories(sub)
      Files.writeString(sub.resolve("a.asc"), grid(2, 1.0))
    }
    root.toString
  }

  test("scan-to-scan join on region elides the SMJ sorts (SupportsReportOrdering)") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // direct scans, no aggregates in between: each split holds one
      // region, the reported region order holds trivially, and the SMJ
      // needs neither exchanges NOR sorts
      val a = spark.read.format("asciigrid").load(dirOnePerRegion).select("region", "ncols")
      val b = spark.read.format("asciigrid").load(dirOnePerRegion).select("region", "path")
      val joined = a.join(b, "region")
      assert(joined.count() == 3)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"storage-partitioned join must need no hash exchange:\n$plan")
      assert(!plan.contains("Sort "),
        s"reported per-split region order must elide the SMJ sorts:\n$plan")
    }
  }

  test("with v2 bucketing off, the same join shuffles (control) and results match") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.read.format("asciigrid").load(dir)
        .groupBy("region").agg(sum(col("ncols")).as("a_cols"))
      val b = spark.read.format("asciigrid").load(dir)
        .groupBy("region").agg(count(lit(1)).as("b_files"))
      val joined = a.join(b, "region")
      assert(joined.count() == 3)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"),
        s"without v2 bucketing the report is ignored and the join shuffles:\n$plan")
    }
  }
}
