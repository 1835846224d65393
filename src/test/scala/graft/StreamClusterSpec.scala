package graft

import graft.queries.DedupQueries

/** The size-gated merge-graph routing in q_stream_dedup_cluster must be
  * answer-PRESERVING: the driver union-find (common, delta-sized case)
  * and the distributed alternating-star fallback compute the same
  * component minima. `spark.graft.streamcluster.cap` = 0 forces every
  * non-empty batch down the distributed path.
  */
class StreamClusterSpec extends SparkSpecBase {

  test("driver union-find path ≡ distributed star fallback") {
    def run(): Set[String] = {
      val rows = DedupQueries.queries("q_stream_dedup_cluster")(spark, sf)
        .collect().map(_.toString).toSet
      graft.queries.QueryCaches.releaseAll(spark)
      rows
    }
    val viaUnionFind = run()
    val before = spark.conf.getOption("spark.graft.streamcluster.cap")
    spark.conf.set("spark.graft.streamcluster.cap", "0")
    val viaStar =
      try run()
      finally before match {
        case Some(p) => spark.conf.set("spark.graft.streamcluster.cap", p)
        case None    => spark.conf.unset("spark.graft.streamcluster.cap")
      }
    assert(viaUnionFind == viaStar,
      "merge-graph routing changed the cluster assignments")
    assert(viaUnionFind.nonEmpty)
  }
}
