package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Fixed headline subset for the one-line summary. The driver captures only
    * the last ~2000 chars of output, so the printed JSON line must stay well
    * under that; the full per-query map (all ~120 queries) goes to
    * BENCH_DETAIL.json instead. Chosen to span every operator family:
    * agg/join/window, dedup, ANN, text, raster, geo, streaming, sources.
    */
  private val headline = Seq(
    "q_agg_pricing", "q_sql_multi_join", "q_window_rank", "q_rollup",
    "q_join_topk", "q_skew_join_salted", "q_asof_join", "q_range_join",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash_pairs",
    "q_ann_cosine", "q_ann_lsh", "q_ann_ivf",
    "q_tfidf", "q_heavy_hitters", "q_lang_ngram",
    "q_raster_stats", "q_clip_raster", "q_spatial_join", "q_reproject_4326",
    "q_stream_tumbling", "q_stream_stream_join", "q_stream_session",
    "q_feature_source", "q_partitioned_source", "q_product_catalog")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/session init otherwise lands entirely
    // on whichever query happens to iterate first
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    } catch { case _: Throwable => () }
    // (seconds, error-or-null) per query: a broken query must surface as
    // an "err" entry, never as a near-zero wall time flattering the total.
    // Name-sorted so run order (and which query absorbs residual warmup)
    // is stable across rounds — hash-map order reshuffled per build.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      graft.queries.QueryCaches.releaseAll(spark)
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def qmap(rs: Seq[(String, Double, Option[String])], prec: String): String =
      rs.map { case (k, v, _) => "\"" + k + "\":" + prec.format(v) }
        .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + k + "\":" + jstr(e) }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.map(_._2).sum

    // Full per-query detail → file (too large for the driver's tail capture).
    val detailPath = new java.io.File("BENCH_DETAIL.json").getAbsolutePath
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${qmap(results, "%.6f")},"n_err":${errs.size}$errJson,"sf":"$sfDir"}"""
    val w = new java.io.PrintWriter(detailPath, "UTF-8")
    try w.println(detail) finally w.close()

    // Compact summary line (fits the tail): total over ALL queries + a fixed
    // headline subset of per-query times.
    val hl = results.filter { case (k, _, _) => headline.contains(k) }
    println(s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","n_queries":${results.size},"queries":${qmap(hl, "%.3f")},"n_err":${errs.size},"detail":"$detailPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
