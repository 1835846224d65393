package graft

import org.apache.hadoop.fs.Path

import graft.raster.{AsciiGrid, GeoTiff, GridGen}
import graft.sinks.{GeoTiffSink, S3Sink}

/** SNK-1 sink I/O: the standalone GeoTiffSink writes decodable .tif
  * files through the Hadoop FileSystem API — local paths and (via the
  * mock object-store FS) s3a-shaped roots, the same dual-target
  * contract ZipSink/S3Sink carry.
  */
class GeoTiffSinkSpec extends SparkSpecBase {

  private def gridsDf = {
    import spark.implicits._
    (0 until 3)
      .map(k => (s"grid_$k.tif", GridGen.genText(k)))
      .toDF("tif_name", "grid_text")
  }

  test("local root: one decodable GeoTIFF per row, pixels intact") {
    val out = java.nio.file.Files.createTempDirectory("graft-tifsink").toString
    GeoTiffSink.write(gridsDf, out)
    (0 until 3).foreach { k =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, s"grid_$k.tif"))
      assert(bytes.length.toLong ==
        GeoTiff.expectedLength(GridGen.ncols(k), GridGen.nrows(k)), s"k=$k length")
      val p = GeoTiff.read(bytes)
      assert(p.srid == 2193 && p.grid.values.sameElements(GridGen.gen(k).values),
        s"k=$k decode")
    }
  }

  test("object-store root (mock FS): same writer streams remotely") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mock-s3.impl", classOf[MockS3FileSystem].getName)
    try {
      val work = java.nio.file.Files.createTempDirectory("graft-tifsink-s3").toString
      val target = s"mock-s3://$work/tifs"
      GeoTiffSink.write(gridsDf, target, srid = 27200)
      val fs = S3Sink.fileSystemFor(target, S3Sink.fsConfEntries(spark))
      val in = fs.open(new Path(target, "grid_1.tif"))
      val bytes = try in.readAllBytes() finally in.close()
      val p = GeoTiff.read(bytes)
      assert(p.srid == 27200)
      assert(p.grid.values.sameElements(GridGen.gen(1).values))
    } finally hc.unset("fs.mock-s3.impl")
  }

  test("overwrite: re-writing the same name replaces the object") {
    val out = java.nio.file.Files.createTempDirectory("graft-tifsink-ow").toString
    import spark.implicits._
    val v1 = Seq(("g.tif", GridGen.genText(0))).toDF("tif_name", "grid_text")
    val v2 = Seq(("g.tif", GridGen.genText(4))).toDF("tif_name", "grid_text")
    GeoTiffSink.write(v1, out)
    GeoTiffSink.write(v2, out)
    val p = GeoTiff.read(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "g.tif")))
    assert(p.grid.ncols == GridGen.ncols(4) &&
      p.grid.values.sameElements(GridGen.gen(4).values))
  }
}
