package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

/** RewriteRangeJoin: a naive interval join must plan as a binned
  * equi-join (no nested loop) when the rule is armed, with identical
  * results.
  */
class RangeJoinRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-rangejoin-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  private def intervalJoin() = {
    import spark.implicits._
    // parquet-backed sides: LocalRelations constant-fold before joins plan
    val dir = java.nio.file.Files.createTempDirectory("graft-rj").toString
    (0L until 200L).map(i => (i, i * 10, i * 10 + 25)).toDF("iid", "lo", "hi")
      .write.mode("overwrite").parquet(s"$dir/iv")
    (0L until 500L).map(i => (i, i * 4)).toDF("pid", "x")
      .write.mode("overwrite").parquet(s"$dir/pt")
    val iv = spark.read.parquet(s"$dir/iv")
    val pt = spark.read.parquet(s"$dir/pt")
    iv.join(pt, pt("x") >= iv("lo") && pt("x") <= iv("hi"))
      .select(col("iid"), col("pid"), col("x"))
  }

  test("armed: the interval join plans as an equi-join on the bin id") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "32")
    try {
      val df = intervalJoin()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule should remove the nested loop:\n$p")
      assert(p.contains("__graft_bin") || p.contains("Generate"),
        s"bin explode expected in plan:\n$p")
      // correctness vs the naive plan
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.set("spark.graft.rangeJoin.binSize", "0")
      val expected = intervalJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected && expected.nonEmpty, s"sizes: ${got.size} vs ${expected.size}")
    } finally spark.conf.unset("spark.graft.rangeJoin.binSize")
  }

  test("disarmed (default): plan keeps the nested loop, rule stays out of the way") {
    val p = intervalJoin().queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"), p)
  }

  test("joins with an equality conjunct are left alone") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "32")
    try {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-rj2").toString
      (0L until 50L).map(i => (i % 5, i * 10, i * 10 + 25)).toDF("k", "lo", "hi")
        .write.mode("overwrite").parquet(s"$dir/a")
      (0L until 100L).map(i => (i % 5, i * 4)).toDF("k2", "x")
        .write.mode("overwrite").parquet(s"$dir/b")
      val a = spark.read.parquet(s"$dir/a")
      val b = spark.read.parquet(s"$dir/b")
      val p = a.join(b, a("k") === b("k2") && b("x") >= a("lo") && b("x") <= a("hi"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("__graft_bin"), s"equi-join must not be rewritten:\n$p")
    } finally spark.conf.unset("spark.graft.rangeJoin.binSize")
  }

  test("inverted intervals (lo > hi) match nothing instead of crashing") {
    spark.conf.set("spark.graft.rangeJoin.binSize", "32")
    try {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-rj3").toString
      Seq((1L, 100L, 50L), (2L, 0L, 40L)).toDF("iid", "lo", "hi")
        .write.mode("overwrite").parquet(s"$dir/iv")
      Seq((10L, 20L), (11L, 70L)).toDF("pid", "x")
        .write.mode("overwrite").parquet(s"$dir/pt")
      val iv = spark.read.parquet(s"$dir/iv")
      val pt = spark.read.parquet(s"$dir/pt")
      val rows = iv.join(pt, pt("x") >= iv("lo") && pt("x") <= iv("hi"))
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // interval 1 is inverted -> matches nothing; interval 2 catches x=20
      assert(rows == Set((2L, 10L)))
    } finally spark.conf.unset("spark.graft.rangeJoin.binSize")
  }
}
