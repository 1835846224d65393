package graft

import org.apache.spark.sql.functions._

/** Partition layout + pruning — the storage-level optimization the
  * 100 TB posture leans on: a year-partitioned write produces one
  * directory per year, a literal year predicate prunes at PLANNING
  * time (static pruning), and a selective dim-side filter prunes fact
  * partitions at RUNTIME via dynamic partition pruning (DPP).
  */
class PartitionPruningSpec extends SparkSpecBase {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-part").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year")
      .parquet(s"$d/orders_by_year")
    d
  }

  test("static partition pruning: literal year predicate prunes the scan") {
    val q = spark.read.parquet(s"$dir/orders_by_year")
      .filter(col("order_year") === 1995)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("order_year"), s"plan:\n$plan")
    // correctness: only 1995 rows survive
    val years = q.select("order_year").distinct().collect().map(_.getInt(0))
    assert(years.toSeq === Seq(1995))
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try {
      val fact = spark.read.parquet(s"$dir/orders_by_year")
      // the PartitionPruning rule fires only when the dim side carries a
      // SELECTIVE predicate surviving into the optimized plan — a
      // filtered literal table constant-folds away, so the dim must be
      // a real source with a real Filter above it
      import spark.implicits._
      Seq((1996, "picked"), (2099, "ignored"))
        .toDF("dim_year", "tag")
        .write.mode("overwrite").parquet(s"$dir/year_dim")
      val dim = spark.read.parquet(s"$dir/year_dim")
        .filter(col("tag") === "picked")
      val q = fact.join(dim, fact("order_year") === dim("dim_year"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
        s"expected a DPP subquery in:\n$plan")
      val years = q.select("order_year").distinct().collect().map(_.getInt(0))
      assert(years.toSeq === Seq(1996))
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
    }
  }
}
