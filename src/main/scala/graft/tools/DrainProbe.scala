package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe of the stream-cluster drain at an arbitrary chunk
  * count and fixture (VERDICT r19 #4 — exercise the DEFAULT
  * compact_every=32 cadence at scale fixtures, where the spec-scale
  * run in Round20OpsSpec cannot reach): drains the chunked node
  * stream with the per-batch probe on, prints the checkpoint-row
  * schedule (compaction batches visibly carry delta + cumulative
  * state), and cross-checks the drained assignment against a fresh
  * 6-chunk drain of the same fixture — answer-neutrality of the
  * natural cadence, asserted at whatever scale the dir holds.
  *
  * Usage: runMain graft.tools.DrainProbe [sfDir] [chunks]
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val chunks = if (args.length > 1) args(1).toInt else 36
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.graft.streamcluster.probe", "true")
    val (assignN, probe) =
      graft.queries.DedupQueries.streamClusterDrain(s, dir, chunks)
    val aN = assignN.groupBy("label")
      .agg(count(lit(1)).as("n")).agg(
        count(lit(1)).as("n_clusters"), sum("n").as("n_nodes"),
        sum(expr("label * n")).as("checksum")).collect()(0)
    val compactions = probe.zipWithIndex.filter { case (b, i) =>
      // a compaction batch checkpoints cumulative state on top of its
      // own delta, so its ckptRows exceeds every plain delta
      (i + 1) % 32 == 0
    }
    println(s"[drainprobe] chunks=$chunks batches=${probe.size} " +
      s"ckptRows=${probe.map(_.ckptRows).mkString(",")}")
    println(s"[drainprobe] expected compaction batches (1-based mult of 32): " +
      compactions.map(_._2 + 1).mkString(","))
    val (assign6, _) =
      graft.queries.DedupQueries.streamClusterDrain(s, dir, 6)
    val a6 = assign6.groupBy("label")
      .agg(count(lit(1)).as("n")).agg(
        count(lit(1)).as("n_clusters"), sum("n").as("n_nodes"),
        sum(expr("label * n")).as("checksum")).collect()(0)
    println(s"[drainprobe] ${chunks}-chunk: $aN   6-chunk: $a6")
    require(aN == a6,
      s"drained cluster answers diverge between $chunks-chunk and 6-chunk drains")
    println("[drainprobe] answer-neutral: OK")
    s.stop()
  }
}
