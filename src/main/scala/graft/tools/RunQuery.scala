package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one named SparkEntry query against a fixture dir and print its
  * result — the probe half of the 10× scale harness (a full Verify at
  * a 10× fixture would be slow and has no oracle anyway; this answers
  * "what does q_ann_recall actually return at the big corpus").
  *
  * Usage: runMain graft.tools.RunQuery <queryName> <sfDir> [maxRows=100]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <queryName> <sfDir> [maxRows]")
    val (name, dir) = (args(0), args(1))
    val maxRows = if (args.length > 2) args(2).toInt else 100
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = fn(s, dir)
    df.show(maxRows, truncate = false)
    println(f"[runquery] $name on $dir: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    graft.queries.QueryCaches.releaseAll(s)
    s.stop()
  }
}
