package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{AsOf, GraftExtensions}

/** The plan-level as-of join operator (AsOfJoinNode + ResolveAsOfJoin
  * via SparkSessionExtensions) — semantics on a hand-built table, and
  * equivalence with the composed q_asof_join pipeline on the fixture.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-asof-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  test("as-of semantics on a hand-built example (incl. equal-ts and no-match)") {
    import spark.implicits._
    val trades = Seq(
      ("A", 10L, "t1"), // after quotes at 5, 10 → matches q@10 (equal ts)
      ("A", 7L, "t2"),  // matches q@5
      ("A", 1L, "t3"),  // before any quote → null
      ("B", 4L, "t4")   // key with no quotes → null
    ).toDF("sym", "ts", "tid")
    val quotes = Seq(
      ("A", 5L, 1.5), ("A", 10L, 2.5), ("C", 1L, 9.9)
    ).toDF("sym", "ts", "px")

    val got = AsOf.join(trades, quotes, "sym", "ts", "sym", "ts", "px")
      .orderBy("tid")
      .select("tid", "asof_px", "asof_ts")
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq === Seq(
      ("t1", Some(2.5), Some(10L)),
      ("t2", Some(1.5), Some(5L)),
      ("t3", None, None),
      ("t4", None, None)))
  }

  test("operator output ids stay referenceable (filter + agg downstream)") {
    import spark.implicits._
    val l = Seq(("k", 10L, 1), ("k", 20L, 2)).toDF("k", "ts", "v")
    val r = Seq(("k", 5L, 100.0)).toDF("k", "ts", "p")
    val n = AsOf.join(l, r, "k", "ts", "k", "ts", "p")
      .filter(col("asof_p").isNotNull)
      .agg(sum(col("v")).as("s"), min(col("asof_ts")).as("m"))
      .head()
    assert(n.getLong(0) === 3L && n.getLong(1) === 5L)
  }

  test("matches the composed q_asof_join pipeline on the events fixture") {
    val sf = "/root/testdata/sf0.001"
    // µs epoch ordering — the same granularity q_asof_join's window
    // sorts on, so same-second click/purchase pairs resolve identically
    val e = graft.sources.EventSource.batch(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))

    val viaOperator = AsOf.join(purchases, clicks,
        "user_id", "ts_us", "user_id", "ts_us", "click_id")
      .select(col("purchase_id"), col("asof_click_id"))

    val viaQuery = graft.queries.EventQueries.queries("q_asof_join")(spark, sf)
      .select(col("purchase_id"), col("asof_click_id"))

    assert(viaOperator.count() === viaQuery.count())
    val diff = viaOperator.exceptAll(viaQuery).count() +
      viaQuery.exceptAll(viaOperator).count()
    assert(diff === 0L, "operator and composed pipeline disagree")
  }
}
