package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI entry point (SRC-6; the reference's argparse `main`,
  * ETL.py:505–577): run the composed ETL over an .asc tree.
  *
  * {{{
  * runMain graft.etl.PipelineMain \
  *   --files_input_folder /path/to/asc_tree \
  *   --output_folder_zipped /path/to/out \
  *   [--regions_geojson /path/to/fc.geojson]  // GeoJSON FeatureCollection (SRC-3)
 *   [--regions_json /path/to/regions.json]   // code,name,raw_title,wkt
  *   [--updated_at 2026-01-01T00:00:00Z]
  * }}}
  *
  * Unlike the reference (import-time network/layer side effects,
  * SURVEY.md §3 entry 3), nothing here touches input until the Spark
  * actions run.
  */
object PipelineMain {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val input = opts.getOrElse("files_input_folder",
      sys.error("--files_input_folder is required"))
    val out = opts.getOrElse("output_folder_zipped",
      sys.error("--output_folder_zipped is required"))
    val updatedAt = opts.getOrElse("updated_at",
      java.time.Instant.now().toString)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // no .crc sidecars from Spark's own local writes (see scaladoc)
    graft.sinks.S3Sink.disableLocalWriteChecksums(spark)

    val regions = (opts.get("regions_geojson"), opts.get("regions_json")) match {
      // SRC-3: a GeoJSON FeatureCollection (the feature-service response
      // shape) — attributes + polygon geometry parsed to the region dim
      case (Some(path), _) => graft.sources.GeoJsonSource.regions(spark, path)
      case (_, Some(path)) => spark.read.json(path)
        .select("code", "name", "raw_title", "wkt")
      case _ =>
        import spark.implicits._
        // default: reference region dim with synthetic full-cover boxes
        Lookups.regions.map { case (code, name) =>
          val rawTitle =
            if (code == "99") "Area Outside Region"
            else name.replace("-", " ") + " Region"
          (code, name, rawTitle,
            "POLYGON ((1000000 4700000, 2200000 4700000, 2200000 6300000, 1000000 6300000, 1000000 4700000))")
        }.toDF("code", "name", "raw_title", "wkt")
    }

    val result = Pipeline.run(spark, input, regions, out, updatedAt)
    // the observe() metrics were aggregated during the run's own
    // materialization — no extra count job over the written store
    val m = result.metrics
    println(s"""{"pipeline":"ok","products":${m.getOrElse("n_products", 0L)},""" +
      s""""nonempty_clips":${m.getOrElse("n_nonempty_clips", 0L)},""" +
      s""""source_files":${m.getOrElse("n_source_files", 0L)},"out":"$out"}""")
    spark.stop()
  }
}
