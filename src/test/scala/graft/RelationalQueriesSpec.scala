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

  test("all relational queries except approx_distinct have oracles") {
    val noOracle = RelationalQueries.queries.keySet -- RelationalQueries.oracles.keySet
    assert(noOracle == Set("q_approx_distinct"))
  }

  test("approx_count_distinct is within 10% of exact") {
    val row = RelationalQueries.queries("q_approx_distinct")(spark, sf).head()
    val approxOrders = row.getAs[Long]("approx_orders")
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(approxOrders - exact).toDouble / exact < 0.10,
      s"approx=$approxOrders exact=$exact")
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
