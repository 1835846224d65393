package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.raster.{AsciiGrid, GeoTiff, GridGen}

/** Round-trip + layout-arithmetic spec for the pure-JVM GeoTIFF codec
  * (SNK-1). The reader walks the IFD generically by tag id, so these
  * round-trips catch writer layout bugs rather than mirroring them;
  * `expectedLength` is independently re-derived here and also gated
  * through the DuckDB oracle by q_geotiff_catalog.
  */
class GeoTiffSpec extends AnyFunSuite {

  private def roundTrip(g: AsciiGrid, srid: Int = 2193): GeoTiff.Parsed = {
    val bytes = GeoTiff.write(g, srid)
    assert(bytes.length.toLong == GeoTiff.expectedLength(g.ncols, g.nrows),
      s"emitted ${bytes.length} bytes, formula says ${GeoTiff.expectedLength(g.ncols, g.nrows)}")
    GeoTiff.read(bytes)
  }

  test("every GridGen fixture grid round-trips bit-exactly (values are float32-exact)") {
    (0 until 25).foreach { k =>
      val g = GridGen.gen(k)
      val p = roundTrip(g)
      assert(p.grid.ncols == g.ncols && p.grid.nrows == g.nrows, s"k=$k dims")
      assert(p.grid.xllcorner == g.xllcorner, s"k=$k xll")
      assert(p.grid.yllcorner == g.yllcorner, s"k=$k yll")
      assert(p.grid.cellsize == g.cellsize, s"k=$k cellsize")
      assert(p.grid.nodata == g.nodata, s"k=$k nodata")
      assert(p.srid == 2193, s"k=$k srid")
      assert(p.nTiles == GeoTiff.nTiles(g.ncols, g.nrows), s"k=$k ntiles")
      // GridGen values are integers in [-9999, 999] — exact in float32
      assert(p.grid.values.sameElements(g.values), s"k=$k pixels")
    }
  }

  test("multi-tile grids exercise the external offset/count arrays") {
    // 12×9 at 8×8 tiles -> 2×2 = 4 tiles; arrays must go external
    val ks = (0 until 25).filter(k => GeoTiff.nTiles(GridGen.ncols(k), GridGen.nrows(k)) > 1)
    assert(ks.nonEmpty, "fixture set must include a multi-tile grid")
    ks.foreach { k =>
      val g = GridGen.gen(k)
      val p = roundTrip(g)
      assert(p.nTiles > 1 && p.grid.values.sameElements(g.values), s"k=$k")
    }
  }

  test("single-tile grid keeps offsets inline") {
    val g = AsciiGrid(5, 4, 1600000.0, 5400000.0, 500.0, -9999.0,
      Array.tabulate(20)(_.toDouble))
    val p = roundTrip(g)
    assert(p.nTiles == 1)
    assert(p.grid.values.sameElements(g.values))
  }

  test("non-integer pixels survive to float32 precision; srid is a parameter") {
    val vals = Array.tabulate(12)(i => i * 0.125 + 0.0625) // exact in float32
    val g = AsciiGrid(4, 3, 1500000.0, 5000000.0, 250.0, -9999.0, vals)
    val p = roundTrip(g, srid = 2193)
    assert(p.grid.values.sameElements(vals))
    val p49 = GeoTiff.read(GeoTiff.write(g, srid = 27200)) // NZ Map Grid (ETL.py:106)
    assert(p49.srid == 27200)
  }

  test("georeferencing: tiepoint anchors the UPPER-left corner") {
    val g = GridGen.gen(3)
    val bytes = GeoTiff.write(g)
    val p = GeoTiff.read(bytes)
    // reader reconstructs yll from tiepoint - nrows*cellsize; equality
    // proves the tiepoint stored ymax (north-up convention)
    assert(p.grid.yllcorner == g.yllcorner && p.grid.ymax == g.ymax)
  }

  test("header bytes: little-endian magic and fixed IFD offset") {
    val b = GeoTiff.write(GridGen.gen(0))
    assert(b(0) == 'I'.toByte && b(1) == 'I'.toByte)
    assert((b(2) & 0xff) == 42 && b(3) == 0)
    assert((b(4) & 0xff) == 8 && b(5) == 0 && b(6) == 0 && b(7) == 0)
  }

  test("whole-file pixel sum equals plain cell sum (padding written as 0)") {
    (0 until 25).foreach { k =>
      val g = GridGen.gen(k)
      val p = GeoTiff.read(GeoTiff.write(g))
      assert(p.grid.values.sum.toLong == g.values.sum.toLong, s"k=$k")
    }
  }

  test("COG overview chain: every fixture grid's overviews round-trip and equal the downsample kernel") {
    (0 until 25).foreach { k =>
      val g = GridGen.gen(k)
      val lv = GeoTiff.levelDims(g.ncols, g.nrows)
      val p = GeoTiff.read(GeoTiff.write(g))
      assert(p.nIfds == lv.size, s"k=$k nIfds")
      assert(p.overviews.size == lv.size - 1, s"k=$k overview count")
      var prev = g.values.map(_.toFloat.toDouble)
      var pw = g.ncols; var ph = g.nrows
      p.overviews.zipWithIndex.foreach { case (ov, i) =>
        val (w, h) = lv(i + 1)
        assert(ov.ncols == w && ov.nrows == h, s"k=$k level ${i + 1} dims")
        val expect = GeoTiff.downsample(prev, pw, ph, g.nodata)
        assert(ov.values.sameElements(expect), s"k=$k level ${i + 1} pixels")
        prev = expect; pw = w; ph = h
      }
    }
  }

  test("deep pyramid: a 40x28 grid cascades three overview levels bit-exactly") {
    val g = AsciiGrid(40, 28, 1600000.0, 5000000.0, 500.0, -9999.0,
      Array.tabulate(40 * 28)(i => if (i % 11 == 0) -9999.0 else (i * 37 % 1000).toDouble))
    val lv = GeoTiff.levelDims(40, 28)
    assert(lv == Vector((40, 28), (20, 14), (10, 7), (5, 4)))
    val bytes = GeoTiff.write(g)
    assert(bytes.length.toLong == GeoTiff.expectedLength(40, 28))
    val p = GeoTiff.read(bytes)
    assert(p.overviews.size == 3)
    assert(p.grid.values.sameElements(g.values))
    // each stored level is exactly the downsample of the previous one
    var prev = g.values
    var pw = 40; var ph = 28
    p.overviews.zipWithIndex.foreach { case (ov, i) =>
      val (w, h) = lv(i + 1)
      val expect = GeoTiff.downsample(prev, pw, ph, g.nodata)
      assert(ov.values.sameElements(expect), s"level ${i + 1} pixels")
      assert(ov.cellsize == g.cellsize * (1L << (i + 1)), s"level ${i + 1} cellsize")
      prev = expect; pw = w; ph = h
    }
  }

  test("COG byte layout: all IFDs precede pixel data; overview tiles precede full-res tiles") {
    val g = GridGen.gen(3) // 11x9 -> one 6x5 overview
    assert(GeoTiff.levelDims(g.ncols, g.nrows).size == 2)
    val b = GeoTiff.write(g)
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // walk IFD chain manually, collecting each IFD's minimum tile offset
    def tileMin(ifd: Int): (Int, Int) = { // (minTileOffset, nextIfd)
      val n = buf.getShort(ifd) & 0xffff
      var minOff = Int.MaxValue
      (0 until n).foreach { i =>
        val e = ifd + 2 + i * 12
        if ((buf.getShort(e) & 0xffff) == 324) {
          val count = buf.getInt(e + 4)
          if (count == 1) minOff = buf.getInt(e + 8)
          else {
            val arr = buf.getInt(e + 8)
            minOff = (0 until count).map(j => buf.getInt(arr + 4 * j)).min
          }
        }
      }
      (minOff, buf.getInt(ifd + 2 + n * 12))
    }
    val ifd0 = buf.getInt(4)
    val (main0, ifd1) = tileMin(ifd0)
    assert(ifd1 != 0, "overview IFD must be chained")
    val (ov0, next) = tileMin(ifd1)
    assert(next == 0)
    assert(ifd1 < main0 && ifd1 < ov0, "IFDs must precede all pixel data")
    assert(ov0 < main0, "overview tile data must precede full-resolution data (COG order)")
  }

  test("spec-conformant tile sizes (multiples of 16) round-trip with the same layout math") {
    // TIFF 6.0 requires tile dims be multiples of 16; the default 8 is
    // a deliberate fixture-scale choice. The production path (16/256)
    // must round-trip through the SAME tile-size-independent codec.
    val g = AsciiGrid(40, 28, 1600000.0, 5000000.0, 500.0, -9999.0,
      Array.tabulate(40 * 28)(i => if (i % 13 == 0) -9999.0 else (i * 31 % 1000).toDouble))
    for (t <- Seq(16, 256)) {
      val bytes = GeoTiff.write(g, srid = 2193, tw = t, th = t)
      assert(bytes.length.toLong == GeoTiff.expectedLength(40, 28, t, t), s"t=$t length")
      val p = GeoTiff.read(bytes)
      assert(p.tileW == t && p.tileH == t, s"t=$t tile dims")
      assert(p.grid.values.sameElements(g.values), s"t=$t pixels")
      assert(p.overviews.size == GeoTiff.levelDims(40, 28, t, t).size - 1, s"t=$t overviews")
    }
    // 16x16 tiles on 40x28: multi-tile level 0 (3x2) plus a two-level pyramid
    assert(GeoTiff.nTiles(40, 28, 16, 16) == 6)
    assert(GeoTiff.levelDims(40, 28, 16, 16) ==
      Vector((40, 28), (20, 14), (10, 7)))
    // 256x256: single tile, no pyramid
    assert(GeoTiff.levelDims(40, 28, 256, 256) == Vector((40, 28)))
  }

  test("reader rejects a cyclic IFD chain instead of looping forever") {
    val g = GridGen.gen(3) // 11x9 -> has one overview IFD
    val bytes = GeoTiff.write(g)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // corrupt: point the overview IFD's next pointer back at itself
    val ifd0 = buf.getInt(4)
    val n0 = buf.getShort(ifd0) & 0xffff
    val ifd1 = buf.getInt(ifd0 + 2 + n0 * 12)
    assert(ifd1 != 0)
    val n1 = buf.getShort(ifd1) & 0xffff
    buf.putInt(ifd1 + 2 + n1 * 12, ifd1) // self-cycle
    val e = intercept[IllegalArgumentException](GeoTiff.read(buf.array()))
    assert(e.getMessage.contains("cyclic IFD chain"), e.getMessage)
    // and a cycle back to the MAIN IFD is equally rejected
    buf.putInt(ifd1 + 2 + n1 * 12, ifd0)
    val e2 = intercept[IllegalArgumentException](GeoTiff.read(buf.array()))
    assert(e2.getMessage.contains("cyclic IFD chain"), e2.getMessage)
  }

  test("writer refuses rasters past the 2 GiB classic-TIFF offset limit") {
    GeoTiff.checkWritable(8192, 8192) // ~268 MB + pyramid: fine
    val e = intercept[IllegalArgumentException](GeoTiff.checkWritable(40000, 40000))
    assert(e.getMessage.contains("2 GiB"))
    assert(GeoTiff.expectedLength(40000, 40000) > Int.MaxValue.toLong)
  }

  test("GridGen invariant: cell values are non-negative integers or the nodata sentinel") {
    // q_zonal_stats' zone arithmetic and q_geotiff_catalog's float32
    // exactness both lean on this; a GridGen change that breaks it must
    // trip a NAMED check, not N oracle mismatches (ADVICE r9)
    (0 until 25).foreach { k =>
      GridGen.gen(k).values.foreach { v =>
        assert(v == GridGen.Nodata || (v >= 0 && v == math.rint(v) && v < 1000),
          s"k=$k value $v")
      }
    }
  }
}
