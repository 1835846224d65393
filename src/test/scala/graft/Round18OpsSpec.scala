package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Independent references for the round-18 operators. */
class Round18OpsSpec extends SparkSpecBase {

  test("stream dedup cluster: incremental per-batch merges converge to the " +
      "batch components, and the merges genuinely cross micro-batches") {
    val stream = DedupQueries.queries("q_stream_dedup_cluster")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = DedupQueries.queries("q_dedup_cluster")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.queries.QueryCaches.releaseAll(spark)
    assert(stream.toSet == batch.toSet,
      "streamed incremental clustering diverged from batch connected components")
    assert(stream.length == batch.length, "duplicate cluster rows in the stream state")
    // the chunking interleaves ids mod 6, so every multi-node chain
    // (consecutive ids) spans multiple chunk files — i.e. every
    // non-singleton cluster was assembled by CROSS-batch merges; if the
    // tree ever degenerated to one file (glob break, chunk collapse),
    // the incremental path would be bypassed and this stops proving
    // anything. Pin the precondition, not just the result.
    val multi = batch.filter(_._2 > 1)
    assert(multi.nonEmpty, "fixture produced no multi-node clusters")
    multi.foreach { case (cid, n, minId, maxId) =>
      assert((maxId - minId) >= 1 && (minId % 6) != (maxId % 6) || n == 1,
        s"cluster $cid members $minId..$maxId land in one chunk — " +
          "cross-batch merging not exercised")
    }
  }
}
