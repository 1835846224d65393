package graft

import org.apache.spark.sql.functions._
import graft.queries.Spread

/** Pins for the optimization-r20 scale-adaptive kernel spread
  * (graft.queries.Spread): the gate must fire on a narrow frame, stay
  * out of the way of an already-wide one, and honor the off/force
  * session-conf hook — the properties every adopted call site's plan
  * shape depends on.
  */
class SpreadSpec extends SparkSpecBase {

  import spark.implicits._

  private def parts(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("narrow frame is repartitioned to the session shuffle count; " +
    "values and multiplicity are unchanged") {
    val narrow = Seq.tabulate(100)(i => (i.toLong, s"v$i"))
      .toDF("id", "v").coalesce(1)
    assert(parts(narrow) == 1)
    val spread = Spread.ifNarrow(narrow, col("id"))
    // parallelism 4 → want = max(2, 4/2) = 2 > 1 → spread fires. The
    // exact output count belongs to AQE (coalescing may merge the tiny
    // test shuffle), so pin the SHAPE: a repartition was inserted.
    assert(spread ne narrow)
    assert(spread.queryExecution.analyzed.toString
      .contains("RepartitionByExpression"))
    assert(spread.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .sameElements(narrow.collect().map(r => (r.getLong(0), r.getString(1))).sorted))
  }

  test("already-wide frame passes through with its plan untouched") {
    val wide = spark.range(1000).repartition(8).toDF("id")
    val out = Spread.ifNarrow(wide, col("id"))
    // no extra exchange: the returned frame IS the input
    assert(out eq wide)
  }

  test("spark.graft.spread=off suppresses the spread; =force spreads a " +
    "wide frame too") {
    val narrow = spark.range(100).coalesce(1).toDF("id")
    withConf("spark.graft.spread" -> "off") {
      assert(Spread.ifNarrow(narrow, col("id")) eq narrow)
    }
    val wide = spark.range(100).repartition(8).toDF("id")
    withConf("spark.graft.spread" -> "force") {
      val forced = Spread.ifNarrow(wide, col("id"))
      assert(forced ne wide)
      assert(forced.queryExecution.analyzed.toString
        .contains("RepartitionByExpression"))
    }
  }
}
