package graft.geo

/** Transverse Mercator projection for NZTM2000 (EPSG:2193) ↔
  * WGS84/NZGD2000 geodetic (EPSG:4326).
  *
  * The reference delegates this to `arcpy.Project_management`
  * (ETL.py:437–439); no PROJ/GDAL exists in this image, so this is the
  * exact Krüger series (6th order in the third flattening n, after
  * Karney 2011, "Transverse Mercator with an accuracy of a few
  * nanometers" — public formulas), with the GRS80/NZTM parameters that
  * appear verbatim in the reference's own WKT (ETL.py:299):
  * a=6378137.0, 1/f=298.257222101, k0=0.9996, λ0=173°E,
  * FE=1,600,000 m, FN=10,000,000 m.
  *
  * Truncation error of the order-6 series is nanometers within
  * Δλ ≤ 10° of the central meridian — far tighter than NZ's extent.
  * NZGD2000 ≈ WGS84 (null datum transform, standard practice; the NTv2
  * grid shift the reference applies is ≤ ~2 m and unreproducible
  * without the grid file — documented deviation, SURVEY.md §7.6.1).
  */
object Transform {

  // GRS80 ellipsoid + NZTM2000 parameters (reference WKT, ETL.py:299)
  private val a  = 6378137.0
  private val f  = 1.0 / 298.257222101
  private val k0 = 0.9996
  private val lam0 = math.toRadians(173.0)
  private val fe = 1600000.0
  private val fn = 10000000.0

  private val e2 = f * (2 - f)
  private val e1 = math.sqrt(e2) // first eccentricity
  private val n = f / (2 - f)    // third flattening
  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
  private val n5 = n4 * n; private val n6 = n5 * n

  // Rectifying radius
  private val bigA = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)

  // Krüger α (forward) and β (inverse) coefficients, order n^6
  private val alpha = Array(
    n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
    13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
    61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
    49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
    34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
    212378941.0 / 319334400 * n6)

  private val beta = Array(
    n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
    1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
    17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
    4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
    4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
    20648693.0 / 638668800 * n6)

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1))

  /** Geodetic (lat, lon in degrees) → NZTM2000 (easting, northing in m). */
  def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val dLam = math.toRadians(lonDeg) - lam0
    val sinPhi = math.sin(phi)
    // conformal latitude via tau/tau'
    val t = math.sinh(atanh(sinPhi) - e1 * atanh(e1 * sinPhi))
    val xiP = math.atan2(t, math.cos(dLam))
    val etaP = asinh(math.sin(dLam) / math.sqrt(t * t + math.cos(dLam) * math.cos(dLam)))
    var xi = xiP; var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
      eta += alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
      j += 1
    }
    (fe + k0 * bigA * eta, fn + k0 * bigA * xi)
  }

  /** NZTM2000 (easting, northing in m) → geodetic (lat, lon in degrees). */
  def inverse(easting: Double, northing: Double): (Double, Double) = {
    val xi = (northing - fn) / (k0 * bigA)
    val eta = (easting - fe) / (k0 * bigA)
    var xiP = xi; var etaP = eta
    var j = 1
    while (j <= 6) {
      xiP -= beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
      etaP -= beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
      j += 1
    }
    val sinhEtaP = math.sinh(etaP)
    val cosXiP = math.cos(xiP)
    val tauP = math.sin(xiP) / math.sqrt(sinhEtaP * sinhEtaP + cosXiP * cosXiP)
    // invert tau' → tau by Newton iteration (Karney 2011 eq. 19–21)
    def sigma(tau: Double): Double =
      math.sinh(e1 * atanh(e1 * tau / math.sqrt(1 + tau * tau)))
    def tauPrimeOf(tau: Double): Double = {
      val s = sigma(tau)
      tau * math.sqrt(1 + s * s) - s * math.sqrt(1 + tau * tau)
    }
    var tau = tauP / (1 - e2) // first guess
    var i = 0
    while (i < 7) {
      val tp = tauPrimeOf(tau)
      val dTau = (tauP - tp) * (1 + (1 - e2) * tau * tau) /
        ((1 - e2) * math.sqrt(1 + tau * tau) * math.sqrt(1 + tp * tp))
      tau += dTau
      i += 1
    }
    val phi = math.atan(tau)
    val lam = lam0 + math.atan2(sinhEtaP, cosXiP)
    (math.toDegrees(phi), math.toDegrees(lam))
  }

  /** Array form for generated code (graft.plans.NztmToWgs84's codegen
    * calls this via the object's static forwarder): [lat, lon].
    */
  def inverseArr(easting: Double, northing: Double): Array[Double] = {
    val (lat, lon) = inverse(easting, northing)
    Array(lat, lon)
  }
}
