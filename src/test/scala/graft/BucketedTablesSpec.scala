package graft

import org.apache.spark.sql.functions._

import graft.queries.BucketedTables

/** The write-once guard behind the persisted bucketed layouts
  * (q_bucketed_join, the postings index family). The dangerous edge is
  * NOT writing too often — it's serving a STALE layout: the same
  * session probing a different fixture dir must rewrite, or the index
  * answers for the wrong corpus.
  */
class BucketedTablesSpec extends SparkSpecBase {

  test("ensure writes once per (session, dir) and rewrites on dir change") {
    var writes = 0
    def mk(dirTag: String): Unit =
      BucketedTables.ensure(spark, Seq("graft_bts_test"),
          "spark.graft.btstest.writtenDir", dirTag) {
        writes += 1
        spark.range(10).select(col("id"), lit(dirTag).as("tag"))
          .repartition(2, col("id"))
          .write.mode("overwrite")
          .bucketBy(2, "id").sortBy("id")
          .saveAsTable("graft_bts_test")
      }
    try {
      mk("dirA")
      assert(writes == 1)
      // same dir, table present: write-once — no rewrite
      mk("dirA")
      assert(writes == 1)
      // table dropped behind the guard's back (the fresh-JVM case:
      // conf matches but the catalog entry is gone) — must recreate
      spark.sql("DROP TABLE IF EXISTS graft_bts_test")
      mk("dirA")
      assert(writes == 2)
      // DIFFERENT dir, table present: must rewrite — a stale layout
      // would serve the wrong corpus's data
      mk("dirB")
      assert(writes == 3)
      assert(spark.table("graft_bts_test")
        .select("tag").distinct().collect().map(_.getString(0)).toSeq == Seq("dirB"))
      mk("dirB")
      assert(writes == 3)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bts_test")
      spark.conf.unset("spark.graft.btstest.writtenDir")
    }
  }
}
