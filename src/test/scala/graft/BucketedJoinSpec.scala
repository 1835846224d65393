package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale pattern: bucketing co-locates both join sides on the join key
  * at WRITE time, so the join itself needs no shuffle — the plan the
  * 100 TB path relies on for repeated large-large joins.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-wh").toString

  // NO autoBroadcastJoinThreshold in the builder: getOrCreate APPLIES
  // builder confs to a reused session, so a session-level "-1" here
  // leaks into every suite sharing the JVM's session (it broke
  // PlanShapeSpec's broadcast pins). The SMJ-forcing conf is scoped
  // per test by withNoBroadcast instead.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bucket-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Force the SMJ path (no broadcast) for `body` only, restoring the
    * session's previous threshold after — plans built inside are
    * final (executedPlan is forced eagerly), so the scope is safe.
    */
  private def withNoBroadcast[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** getOrCreate reuses whichever suite built the JVM's session first,
    * and warehouse.dir is a STATIC conf — so the temp warehouse above
    * only applies if this suite runs first. Clear both the catalog
    * entry and any stale on-disk location from a previous JVM (the
    * in-memory catalog dies with the process, the directory does not —
    * saveAsTable then fails with LOCATION_ALREADY_EXISTS).
    */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = new java.io.File(
      if (wh.getScheme == "file") new java.io.File(wh).toString
      else wh.toString, name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (dir.exists()) rm(dir)
  }

  test("bucketed tables join without a shuffle exchange") { withNoBroadcast {
    val sf = "/root/testdata/sf0.001"
    resetTable("orders_b")
    resetTable("customer_b")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    spark.read.parquet(s"$sf/customer.parquet")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"),
      s"bucketed join should be shuffle-free:\n$plan")
    assert(joined.count() ==
      spark.read.parquet(s"$sf/orders.parquet").count())
  } }

  test("unbucketed equivalent does shuffle (control)") { withNoBroadcast {
    val sf = "/root/testdata/sf0.001"
    val joined = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"), s"expected shuffles in:\n$plan")
  } }
}
