package graft.geo

import org.locationtech.jts.geom.{Coordinate, Envelope, Geometry, GeometryFactory, Polygon}
import org.locationtech.jts.io.{WKTReader, WKTWriter}

/** Thin JTS 1.20 helpers backing the geometry UDFs (the rebuild of the
  * reference's arcpy geometry surface: extent ETL.py:281,
  * extent.polygon ETL.py:438, vertex walk ETL.py:443–445).
  *
  * JTS objects are not thread-safe to share; factories/readers are
  * cheap, so each helper constructs its own (executor-side, per call —
  * hot paths should hoist per partition).
  */
object Jts {
  private def factory = new GeometryFactory()

  def parseWkt(wkt: String): Geometry = new WKTReader(factory).read(wkt)

  def toWkt(g: Geometry): String = new WKTWriter().write(g)

  /** Bounding box (OP-SP-4; ETL.py:281). */
  def envelope(g: Geometry): Envelope = g.getEnvelopeInternal

  /** Envelope as a closed polygon (ETL.py:438 `extent.polygon`). */
  def envelopePolygon(g: Geometry): Geometry =
    factory.toGeometry(g.getEnvelopeInternal)

  /** Exterior-ring coordinates of a polygon as (x, y) pairs
    * (AGG-3; ETL.py:443–445 `getPart(0)` walk).
    */
  def exteriorRing(g: Geometry): Array[(Double, Double)] = g match {
    case p: Polygon => p.getExteriorRing.getCoordinates.map(c => (c.x, c.y))
    case other      => other.getCoordinates.map(c => (c.x, c.y))
  }

  /** Reproject every vertex NZTM→WGS84 (OP-SP-5; ETL.py:437–439). */
  def reprojectToWgs84(g: Geometry): Geometry = {
    val coords = g.getCoordinates.map { c =>
      val (lat, lon) = Transform.inverse(c.x, c.y)
      new Coordinate(lon, lat)
    }
    g match {
      case _: Polygon => factory.createPolygon(coords)
      case _          => factory.createLineString(coords)
    }
  }

  /** GeoJSON Polygon document from an exterior ring (OP-SP-6;
    * ETL.py:451), with fixed one-decimal formatting so the string is
    * bit-stable across engines.
    */
  def toGeoJson(g: Geometry, decimals: Int = 1): String = {
    val fmt = s"%.${decimals}f"
    val ring = exteriorRing(g)
      .map { case (x, y) => s"[${fmt.format(x)}, ${fmt.format(y)}]" }
      .mkString("[", ", ", "]")
    s"""{"type": "Polygon", "coordinates": [$ring]}"""
  }
}
