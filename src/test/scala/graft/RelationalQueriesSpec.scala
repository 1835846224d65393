package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries

class RelationalQueriesSpec extends SparkSpecBase {

  test("every relational query runs and returns rows at sf0.001") {
    RelationalQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every relational query has an oracle") {
    val noOracle = RelationalQueries.queries.keySet -- RelationalQueries.oracles.keySet
    assert(noOracle.isEmpty, s"missing oracles: $noOracle")
  }

  test("approx_count_distinct gates itself against the exact counts") {
    val row = RelationalQueries.queries("q_approx_distinct")(spark, sf).head()
    assert(row.getAs[Boolean]("orders_within_bound"), row.toString)
    assert(row.getAs[Boolean]("parts_within_bound"), row.toString)
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(row.getAs[Long]("n_orders_exact") == exact)
  }

  test("top-k plans as TakeOrderedAndProject (no global sort materialization)") {
    val plan = RelationalQueries.queries("q_orderby_limit")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("rollup includes grand total row") {
    val df = RelationalQueries.queries("q_rollup")(spark, sf)
    val grand = df.filter(col("nation") === "(all)" && col("priority") === "(all)")
    assert(grand.count() == 1)
    val total = grand.head().getAs[Long]("n_orders")
    val orders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(total == orders)
  }

  test("set ops are consistent: intersect + except = union of left") {
    val df = RelationalQueries.queries("q_set_ops")(spark, sf)
    val byOp = df.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val leftDistinct = spark.read.parquet(s"$sf/customer.parquet")
      .select(countDistinct(col("c_nationkey"))).head().getLong(0)
    assert(byOp("intersect") + byOp("except") == leftDistinct)
  }
}
