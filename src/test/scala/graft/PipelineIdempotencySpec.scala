package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.etl.{Lookups, Pipeline}
import graft.raster.GridGen

/** Idempotent re-run parity (SURVEY.md §4.1: overwriteOutput=True /
  * makedirs(exist_ok) in the reference): running the pipeline twice
  * into the same output dir must succeed and produce identical
  * catalogs.
  */
class PipelineIdempotencySpec extends SparkSpecBase {

  test("pipeline re-run overwrites cleanly with identical results") {
    val work = Files.createTempDirectory("graft-idem").toString
    val in = Paths.get(work, "in", "05")
    Files.createDirectories(in)
    Files.write(in.resolve("grid_02_NZ_norm_Mean_1991-2020_monthly7.asc"),
      GridGen.genText(0).getBytes(StandardCharsets.UTF_8))

    import spark.implicits._
    val regions = Lookups.regions.take(3).map { case (code, name) =>
      (code, name, name.replace("-", " ") + " Region",
        "POLYGON ((1590000 4990000, 1700000 4990000, 1700000 5100000, 1590000 5100000, 1590000 4990000))")
    }.toDF("code", "name", "raw_title", "wkt")

    def run() = Pipeline.run(spark, s"$work/in", regions, s"$work/out",
      updatedAt = "2026-01-01T00:00:00Z")

    val first = run().catalog
      .select("clipped_name", "n_valid", "metadata_json")
      .orderBy("clipped_name").collect()
    val second = run().catalog
      .select("clipped_name", "n_valid", "metadata_json")
      .orderBy("clipped_name").collect()

    assert(first.nonEmpty && first.sameElements(second))
    // catalog parquet reflects the second run, not an append
    val cat = spark.read.parquet(s"$work/out/catalog.parquet")
    assert(cat.count() == first.length)
  }
}
