package graft.geo

/** Datum transformations for the OP-SP-5 reprojection path. The
  * reference configures the `New_Zealand_1949_To_NZGD_2000_3_NTv2`
  * grid transform (ETL.py:301); the grid file itself is not
  * redistributable, so — as SURVEY §7.6 pre-declares — the library
  * substitutes the published 7-parameter similarity transformation,
  * whose deviation from the grid is the EPSG-stated ≤ ~2 m across New
  * Zealand (vs ~5 m for the 3-parameter fallback). All constants are
  * public EPSG/LINZ values; TransformSpec pins the implementation
  * against both parameter sets and the documented bound.
  */
object Datum {

  /** Published accuracy of the 7-param NZGD49→NZGD2000 similarity
    * transformation relative to the NTv2 distortion grid (EPSG tfm
    * 1564 accuracy statement) — THE documented deviation of this
    * library's datum path from the reference's.
    */
  val DocumentedGridDeviationM = 2.0

  /** Ellipsoid (a, 1/f). */
  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
  }

  /** International 1924 (NZGD49's ellipsoid). */
  val International1924: Ellipsoid = Ellipsoid(6378388.0, 297.0)

  /** GRS80 (NZGD2000's ellipsoid). */
  val Grs80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)

  /** 7-parameter similarity transform, POSITION-VECTOR rotation
    * convention (EPSG method 9606): translations in metres, rotations
    * in arc-seconds, scale in ppm.
    */
  final case class Helmert7(tx: Double, ty: Double, tz: Double,
      rxAs: Double, ryAs: Double, rzAs: Double, dsPpm: Double) {
    private val as2rad = math.Pi / (180.0 * 3600.0)
    private val rx = rxAs * as2rad
    private val ry = ryAs * as2rad
    private val rz = rzAs * as2rad
    private val m = 1.0 + dsPpm * 1e-6

    /** Apply to a geocentric XYZ (small-angle position-vector form). */
    def apply(x: Double, y: Double, z: Double): (Double, Double, Double) = (
      tx + m * (x - rz * y + ry * z),
      ty + m * (rz * x + y - rx * z),
      tz + m * (-ry * x + rx * y + z))
  }

  /** NZGD49 → NZGD2000, LINZ/EPSG 7-parameter set (EPSG tfm 1564;
    * stated accuracy 2 m). EPSG publishes it under the COORDINATE-
    * FRAME rotation method (9607) as (−0.470″, +0.100″, −1.024″);
    * stored here with flipped signs because Helmert7 applies the
    * position-vector (9606) form — the conventions differ only in
    * rotation sign. (Empirically pinned: this orientation agrees with
    * the independent 3-param set to 1–4 m over the NZ land mass; the
    * wrong sign puts them ~30 m apart.)
    */
  val Nzgd49ToNzgd2000H7: Helmert7 =
    Helmert7(59.47, -5.04, 187.44, 0.470, -0.100, 1.024, -4.5993)

  /** NZGD49 → NZGD2000, 3-parameter geocentric set (EPSG tfm 1701;
    * stated accuracy 5 m) — the coarse fallback the spec compares
    * against.
    */
  val Nzgd49ToNzgd2000H3: Helmert7 =
    Helmert7(54.4, -20.1, 183.1, 0.0, 0.0, 0.0, 0.0)

  /** Geodetic (deg, deg, m) → geocentric XYZ on `ell`. */
  def toGeocentric(ell: Ellipsoid, latDeg: Double, lonDeg: Double,
      h: Double = 0.0): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val sinLat = math.sin(lat); val cosLat = math.cos(lat)
    val nu = ell.a / math.sqrt(1 - ell.e2 * sinLat * sinLat)
    ((nu + h) * cosLat * math.cos(lon),
      (nu + h) * cosLat * math.sin(lon),
      (nu * (1 - ell.e2) + h) * sinLat)
  }

  /** Geocentric XYZ → geodetic (deg, deg, m) on `ell` (Bowring-start
    * fixed-point iteration; sub-millimetre in a handful of rounds).
    */
  def toGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double)
      : (Double, Double, Double) = {
    val p = math.hypot(x, y)
    var lat = math.atan2(z, p * (1 - ell.e2))
    var i = 0
    var nu = ell.a
    while (i < 8) {
      val s = math.sin(lat)
      nu = ell.a / math.sqrt(1 - ell.e2 * s * s)
      lat = math.atan2(z + ell.e2 * nu * s, p)
      i += 1
    }
    val h = p / math.cos(lat) - nu
    (math.toDegrees(lat), math.toDegrees(math.atan2(y, x)), h)
  }

  /** NZGD49 geodetic → NZGD2000 geodetic via the given similarity
    * transform (ellipsoid change included).
    */
  def nzgd49ToNzgd2000(latDeg: Double, lonDeg: Double,
      h7: Helmert7 = Nzgd49ToNzgd2000H7): (Double, Double) = {
    val (x, y, z) = toGeocentric(International1924, latDeg, lonDeg)
    val (x2, y2, z2) = h7(x, y, z)
    val (lat2, lon2, _) = toGeodetic(Grs80, x2, y2, z2)
    (lat2, lon2)
  }

  /** Ground distance (m) between two geodetic points on GRS80 — small-
    * separation planar approximation, plenty for metre-scale bounds.
    */
  def groundDistanceM(lat1: Double, lon1: Double, lat2: Double, lon2: Double)
      : Double = {
    val latR = math.toRadians((lat1 + lat2) / 2)
    val s = math.sin(latR)
    val nu = Grs80.a / math.sqrt(1 - Grs80.e2 * s * s)
    val m = Grs80.a * (1 - Grs80.e2) / math.pow(1 - Grs80.e2 * s * s, 1.5)
    val dNorth = math.toRadians(lat2 - lat1) * m
    val dEast = math.toRadians(lon2 - lon1) * nu * math.cos(latR)
    math.hypot(dNorth, dEast)
  }
}
