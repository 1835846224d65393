package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: banded-LSH candidate-pair volume of the near-dup corpus
  * at a fixture dir — Σ_key C(n_k, 2) over (band_idx, band_val) keys,
  * plus the hottest keys. Reads like nearDupPairs' blocking stage;
  * used to adjudicate the r13 20× superlinear rows (q_embedding_near_dup
  * 11× wall at 2× rows: fixture-transform × hyperplane-family
  * correlation, see ROUND13_NOTES).
  *
  * Usage: runMain graft.tools.ProbeBands <sfDir>
  */
object ProbeBands {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.plans.VecKernels.register(s)
    val base = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = base.unionByName(base.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val keys = corpus.select(col("vec_id"),
        posexplode(expr("vec_bands(embedding)")).as(Seq("band_idx", "band_val")))
      .groupBy("band_idx", "band_val").agg(count(lit(1)).as("n"))
      .cache()
    val n = corpus.count()
    val stats = keys.agg(
      // integer `div`, not SQL `/` (double): the tool adjudicates
      // superlinear candidate growth at large fixtures, where pair sums
      // can pass 2^53 and double division would lose exactness
      sum(expr("n * (n - 1) div 2")).as("cand_pairs"),
      max(col("n")).as("max_key"),
      count(lit(1)).as("n_keys")).collect()(0)
    println(s"[probebands] $dir: vectors=$n cand_pairs=${stats.get(0)} " +
      s"max_key=${stats.get(1)} n_keys=${stats.get(2)}")
    keys.orderBy(col("n").desc).show(10, truncate = false)
    // capped-candidate volume + planted-pair recall for a range of
    // per-key occupancy caps: a planted exact-copy pair survives a cap
    // iff at least one of its four (shared) band keys stays under it.
    // COPY-AWARE id arithmetic (r13 review): at the Scale10 fixtures,
    // copy i's base vectors live at i·10⁷ + x and its planted dups at
    // i·10⁷ + x + 10⁶, so "planted" means within-copy offset ≥ 10⁶ —
    // the earlier `vec_id >= 10⁶` split counted every copy-1+ base
    // vector as planted and could only ever match copy-0's pairs.
    val CopyBlock = 10000000L
    val bandsDf = corpus.select(col("vec_id"),
        posexplode(expr("vec_bands(embedding)")).as(Seq("band_idx", "band_val")))
    val nPlanted = corpus
      .filter(col("vec_id") % CopyBlock >= 1000000L).count()
    for (cap <- Seq(100, 200, 400)) {
      val kept = keys.filter(col("n") <= cap)
      val cp = kept.agg(sum(expr("n * (n - 1) div 2"))).collect()(0).get(0)
      val planted = bandsDf.filter(col("vec_id") % CopyBlock >= 1000000L)
        .select(col("vec_id").as("dup_id"),
          (col("vec_id") - 1000000L).as("vec_id"),
          col("band_idx"), col("band_val"))
        .join(bandsDf, Seq("vec_id", "band_idx", "band_val"))
        .join(kept.select("band_idx", "band_val"), Seq("band_idx", "band_val"))
        .select("dup_id").distinct().count()
      println(s"[probebands] cap=$cap cand_pairs=$cp " +
        s"planted_recall=$planted/$nPlanted")
    }
    s.stop()
  }
}
