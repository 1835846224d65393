package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for q_containment's volume at scale fixtures: shingle
  * rows, df-cap drop-set size, post-cap join input sizes, candidate
  * join rows, and pair-group count — to localize any superlinear wall
  * growth (r13: 20×/10× wall ratio ≈ 2.3 for 2× rows).
  *
  * Usage: runMain graft.tools.ProbeContainment <sfDir>
  */
object ProbeContainment {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val excerpts = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 30)).as("text"))
    val baseShAll = docs
      .select(col("doc_id").as("base_id"),
        explode(graft.text.Corpus.shingles("text")).as("shingle")).cache()
    val dfreq = baseShAll.groupBy("shingle")
      .agg(count(lit(1)).as("df")).cache()
    val drop = dfreq.filter(col("df") > 50)
    val nBase = baseShAll.count()
    val nDrop = drop.count()
    val dropRows = drop.agg(coalesce(sum("df"), lit(0L))).collect()(0).getLong(0)
    val baseSh = baseShAll.join(drop.select("shingle"), Seq("shingle"), "left_anti")
    val exSh = excerpts
      .select(col("doc_id").as("exc_id"),
        explode(graft.text.Corpus.shingles("text")).as("shingle"))
      .join(drop.select("shingle"), Seq("shingle"), "left_anti").cache()
    val nEx = exSh.count()
    val joined = exSh.join(baseSh, "shingle")
    val nJoin = joined.count()
    val nGroups = joined.groupBy("exc_id", "base_id").count().count()
    println(s"[probecont] $dir: baseShingles=$nBase dropKeys=$nDrop " +
      s"dropRows=$dropRows exShingles=$nEx joinRows=$nJoin pairGroups=$nGroups")
    s.stop()
  }
}
