package graft.raster

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.geom.prep.PreparedGeometryFactory

/** Raster overlay/statistics kernels (OP-SP-3 / AGG-2).
  *
  * The reference's clip (`arcpy.Clip_management` with
  * `clipping_geometry="ClippingGeometry"`,
  * `maintain_clipping_extent="NO_MAINTAIN_EXTENT"`, ETL.py:303–310)
  * masks cells outside the polygon to NODATA and crops the output
  * extent to the polygon's envelope. This kernel reproduces exactly
  * that: strict cell-center-in-interior test (JTS prepared geometry,
  * robust predicates), then crop to rows/cols whose centers fall
  * strictly inside the envelope.
  *
  * Distribution: one (grid × region) pair per task; PreparedGeometry
  * is built once per call and reused across all cells of the grid —
  * at scale, callers clip a whole partition of grids against a
  * broadcast region list, so preparation amortizes per (partition ×
  * region), not per cell.
  */
object RasterOps {

  /** Clip a grid by a polygon: crop to the polygon envelope, NODATA
    * cells whose center is not strictly inside the polygon.
    */
  def clip(g: AsciiGrid, geom: Geometry): AsciiGrid = {
    val prepared = PreparedGeometryFactory.prepare(geom)
    val env = geom.getEnvelopeInternal
    val factory = new GeometryFactory()
    val cols = (0 until g.ncols).filter { c =>
      val x = g.centerX(c); x > env.getMinX && x < env.getMaxX
    }
    val rows = (0 until g.nrows).filter { r =>
      val y = g.centerY(r); y > env.getMinY && y < env.getMaxY
    }
    if (cols.isEmpty || rows.isEmpty)
      return AsciiGrid(0, 0, g.xllcorner, g.yllcorner, g.cellsize, g.nodata, Array.empty)
    val colMin = cols.min; val colMax = cols.max
    val rowMin = rows.min; val rowMax = rows.max
    val ncolsOut = colMax - colMin + 1
    val nrowsOut = rowMax - rowMin + 1
    val out = new Array[Double](ncolsOut * nrowsOut)
    var r = rowMin
    while (r <= rowMax) {
      var c = colMin
      while (c <= colMax) {
        val v = g.value(r, c)
        val keep = v != g.nodata && prepared.containsProperly(
          factory.createPoint(new Coordinate(g.centerX(c), g.centerY(r))))
        out((r - rowMin) * ncolsOut + (c - colMin)) = if (keep) v else g.nodata
        c += 1
      }
      r += 1
    }
    // new lower-left: x of first kept col, y below last kept row
    val xll = g.xllcorner + colMin * g.cellsize
    val yll = g.yllcorner + (g.nrows - rowMax - 1) * g.cellsize
    AsciiGrid(ncolsOut, nrowsOut, xll, yll, g.cellsize, g.nodata, out)
  }

  final case class Stats(nValid: Long, nNodata: Long, min: Double,
      max: Double, mean: Double, stddev: Double, sum: Double)

  /** Per-grid statistics ignoring NODATA (the sidecar the reference's
    * clip emits as a side effect, ETL.py:5; here an explicit operator).
    * Sample standard deviation (n-1), matching SQL STDDEV.
    */
  def stats(g: AsciiGrid): Stats = {
    var n = 0L; var nNodata = 0L
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var sum = 0.0; var sumSq = 0.0
    var i = 0
    while (i < g.values.length) {
      val v = g.values(i)
      if (v == g.nodata) nNodata += 1
      else {
        n += 1; sum += v; sumSq += v * v
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      i += 1
    }
    val mean = if (n > 0) sum / n else Double.NaN
    val variance = if (n > 1) (sumSq - sum * sum / n) / (n - 1) else 0.0
    Stats(n, nNodata, mn, mx, mean, math.sqrt(math.max(variance, 0.0)), sum)
  }
}
