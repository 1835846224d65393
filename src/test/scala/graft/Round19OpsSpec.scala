package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Independent references for the round-19 work: delta-only stream-
  * cluster state (VERDICT r18 #5), the merge-graph cap audit (#6), the
  * streaming survivor selection (#8), and the r18 ADVICE guards.
  */
class Round19OpsSpec extends SparkSpecBase {

  test("stream-cluster per-batch checkpoint rows equal the arrival delta — " +
      "never the cumulative state (VERDICT r18 #5)") {
    withConf("spark.graft.streamcluster.probe" -> "true") {
      DedupQueries.queries("q_stream_dedup_cluster")(spark, sf).collect()
    }
    graft.queries.QueryCaches.releaseAll(spark)
    val probe = DedupQueries.lastStreamClusterProbe
    assert(probe.size == 6, s"expected 6 micro-batches, got ${probe.size}")
    // expected deltas: chunk b holds the customer keys ≡ b (mod 6)
    val nodes = spark.read.parquet(s"$sf/customer.parquet")
      .select((col("c_custkey") % 6).as("b")).groupBy("b").count()
      .collect().map(r => r.getLong(1)).sorted.toVector
    val ckpt = probe.map(_.ckptRows).sorted
    assert(ckpt == nodes,
      s"per-batch checkpointed rows $ckpt != per-chunk arrival deltas $nodes — " +
        "a full-state rewrite (or a missed delta) crept back in")
    val total = nodes.sum
    assert(probe.map(_.ckptRows).max < total,
      "one batch materialized the whole cumulative state")
  }

  test("stream-cluster compaction cadence: compact_every=2 checkpoints the " +
      "full state exactly on schedule and leaves the answer unchanged") {
    def run(): Set[String] = {
      val r = DedupQueries.queries("q_stream_dedup_cluster")(spark, sf)
        .collect().map(_.toString).toSet
      graft.queries.QueryCaches.releaseAll(spark)
      r
    }
    withConf("spark.graft.streamcluster.probe" -> "true") {
      val base = run()
      val baseDeltas = DedupQueries.lastStreamClusterProbe.map(_.ckptRows)
      val compacted = withConfValue(
        "spark.graft.streamcluster.compact_every" -> "2")(run())
      assert(compacted == base,
        "compaction changed the drained cluster assignments")
      val probe = DedupQueries.lastStreamClusterProbe
      // deltas in batch order (probe batch ids are the arrival order)
      val d = baseDeltas
      val expected = probe.indices.map { k =>
        // sinceCompact hits 2 on every second batch → compaction there
        // checkpoints the cumulative state (sum of deltas so far) on
        // top of the batch's own arrival delta
        if (k % 2 == 1) d(k) + d.take(k + 1).sum else d(k)
      }.toVector
      assert(probe.map(_.ckptRows) == expected,
        s"compaction checkpoint schedule ${probe.map(_.ckptRows)} != $expected")
    }
  }

  /** withConf, but returning the body's value. */
  private def withConfValue[T](kv: (String, String))(body: => T): T = {
    val prev = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None    => spark.conf.unset(kv._1)
    }
  }

  test("q_streamcluster_mergesize equals the probe's observed merge graphs " +
      "and sits far under the production cap") {
    val row = DedupQueries.queries("q_streamcluster_mergesize")(spark, sf)
      .collect().head
    graft.queries.QueryCaches.releaseAll(spark)
    val probe = DedupQueries.lastStreamClusterProbe
    assert(row.getLong(0) == probe.map(_.mergePairs).max)
    assert(row.getLong(1) == probe.count(_.mergePairs > 0).toLong)
    assert(row.getLong(2) == 100000L)
    assert(row.getLong(0) > 0, "audit fixture produced no merges — vacuous")
    assert(row.getLong(0) < row.getLong(2),
      "merge graph at fixture scale exceeds the driver union-find cap")
  }

  test("q_stream_keep_best drains to exactly the batch survivor table, " +
      "with revisions crossing micro-batches (VERDICT r18 #8)") {
    val stream = DedupQueries.queries("q_stream_keep_best")(spark, sf)
      .collect().map(_.toString).toSet
    val batch = DedupQueries.queries("q_dedup_keep_best")(spark, sf)
      .collect().map(_.toString).toSet
    graft.queries.QueryCaches.releaseAll(spark)
    assert(stream.nonEmpty, "no multi-member clusters in the fixture — vacuous")
    assert(stream == batch,
      "incremental survivor state diverged from the batch max_by")
    // cross-batch precondition, pinned at DATA level (equality alone
    // cannot distinguish an incremental drain from a single-batch one):
    // some multi-member cluster must have members in ≥2 distinct chunks
    // (doc_id mod 6), so the 6-file maxFilesPerTrigger=1 source is
    // FORCED to deliver them in different micro-batches and the state
    // genuinely revises
    val crossChunk = graft.text.Corpus.withDuplicates(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        md5(expr("concat_ws(' ', slice(w, 1, 30))")).as("prefix_key"))
      .groupBy("prefix_key")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id") % 6).as("n_chunks"))
      .filter(col("n") >= 2 && col("n_chunks") >= 2)
      .count()
    graft.queries.QueryCaches.releaseAll(spark)
    assert(crossChunk > 0,
      "no multi-member cluster spans chunks — the stream would resolve " +
        "every survivor within one batch and the incremental path would " +
        "be bypassed")
  }

  test("cursor rejects an empty or duplicate field list (ADVICE r17 #4)") {
    val path = s"$sf/../regions.geojson" // any path: validation precedes IO
    intercept[IllegalArgumentException] {
      graft.sources.GeoJsonSource.cursor(spark, path, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.sources.GeoJsonSource.cursor(spark, path, Seq("code", "code"))
    }
  }

  test("encodePcm refuses a copy index beyond the vetted coefficient table " +
      "instead of silently wrapping (ADVICE r18)") {
    // copy 39 is the last vetted entry (extended for the r20 40× probe);
    // copy 40 must fail loudly
    graft.multimodal.MultimodalOps.encodePcm(39L * 10000000L, bump = false)
    intercept[IllegalArgumentException] {
      graft.multimodal.MultimodalOps.encodePcm(40L * 10000000L, bump = false)
    }
  }

  test("stagedTree republish over an existing tree leaves a complete tree " +
      "and no trash siblings (ADVICE r18)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_staged_spec")
    val out = dir.resolve("store").toString
    def build(n: Int): Unit = graft.queries.SideStores.stagedTree(out + n) { p =>
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve("data.txt"), s"v$n".getBytes)
    }
    build(1)
    // simulate the concurrent-JVM case ensure() hides: call the publish
    // path again with the target already present (fresh key suffix
    // defeats the per-JVM memo; pre-create the target to force move-aside)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out + 2, "stale"))
    build(2)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out + 2, "data.txt")),
      "republished tree is incomplete")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(out + 2, "stale")),
      "old tree contents leaked into the new publish")
    val trash = java.nio.file.Files.list(dir)
    try {
      val leftovers = trash.filter(p => p.getFileName.toString.contains(".trash."))
        .count()
      assert(leftovers == 0, "move-aside trash not cleaned up")
    } finally trash.close()
  }
}
