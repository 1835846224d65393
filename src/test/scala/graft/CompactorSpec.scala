package graft

import org.apache.spark.sql.functions._
import graft.sinks.Compactor

/** Small-files compaction: fewer files, identical rows, shuffle-free. */
class CompactorSpec extends SparkSpecBase {

  test("compacts a fragmented parquet dir without changing its rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    // 32 tiny files
    (0 until 3200).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
      .repartition(32).write.parquet(dir)
    val checksumBefore = spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1)), max(col("s"))).head()

    val (before, after) = Compactor.compact(spark, dir, targetBytes = 1L << 30)
    assert(before == 32 && after == 1, s"$before -> $after")

    val checksumAfter = spark.read.parquet(dir)
      .agg(sum(col("id")), count(lit(1)), max(col("s"))).head()
    assert(checksumBefore == checksumAfter)
  }

  test("no-op when the layout is already at or under target count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString + "/t"
    (0 until 100).map(_.toLong).toDF("id").coalesce(1).write.parquet(dir)
    val (before, after) = Compactor.compact(spark, dir, targetBytes = 1L << 30)
    assert(before == 1 && after == 1)
  }
}
