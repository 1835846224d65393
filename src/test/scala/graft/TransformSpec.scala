package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Transform

class TransformSpec extends AnyFunSuite {

  // Order-6 Krüger series: truncation is nanometers within Δλ≤10°, so
  // the round-trip tolerance is dominated by double rounding only.
  test("forward∘inverse is identity within 1e-11° across NZ extent") {
    for {
      lat <- BigDecimal(-47.5) to BigDecimal(-34.0) by BigDecimal(0.7)
      lon <- BigDecimal(166.0) to BigDecimal(179.0) by BigDecimal(0.9)
    } {
      val (e, n) = Transform.forward(lat.toDouble, lon.toDouble)
      val (lat2, lon2) = Transform.inverse(e, n)
      assert(math.abs(lat2 - lat.toDouble) < 1e-11, s"lat roundtrip at ($lat,$lon)")
      assert(math.abs(lon2 - lon.toDouble) < 1e-11, s"lon roundtrip at ($lat,$lon)")
    }
  }

  test("inverse∘forward is identity within 1e-6 m over the projected rectangle") {
    for {
      ei <- 0 to 13; e = 1100000.0 + ei * 73000.0
      ni <- 0 to 13; n = 4750000.0 + ni * 111000.0
    } {
      val (lat, lon) = Transform.inverse(e, n)
      val (e2, n2) = Transform.forward(lat, lon)
      assert(math.abs(e2 - e) < 1e-6, s"easting roundtrip at ($e,$n)")
      assert(math.abs(n2 - n) < 1e-6, s"northing roundtrip at ($e,$n)")
    }
  }

  test("projection origin maps to false easting/northing") {
    // λ0=173°E on the equator: M(0)=0, so (lat=0, lon=λ0) → (FE, FN).
    val (e, n) = Transform.forward(0.0, 173.0)
    assert(math.abs(e - 1600000.0) < 1e-6)
    assert(math.abs(n - 10000000.0) < 1e-6)
  }

  test("central-meridian scale factor ≈ 0.9996") {
    // Two points 1″ apart on the central meridian: projected distance /
    // ellipsoidal meridian arc ≈ k0.
    val lat = -41.0
    val dLat = 1.0 / 3600.0
    val (_, n1) = Transform.forward(lat, 173.0)
    val (_, n2) = Transform.forward(lat + dLat, 173.0)
    val projected = n2 - n1
    val a = 6378137.0; val f = 1 / 298.257222101; val e2 = f * (2 - f)
    val s = math.sin(math.toRadians(lat))
    val m = a * (1 - e2) / math.pow(1 - e2 * s * s, 1.5)
    val arc = m * math.toRadians(dLat)
    assert(math.abs(projected / arc - 0.9996) < 1e-6)
  }

  test("Wellington lands in the right NZTM neighborhood") {
    // Wellington ≈ (-41.29, 174.78) → NZTM ≈ (1749000 E, 5427000 N).
    val (e, n) = Transform.forward(-41.29, 174.78)
    assert(e > 1700000 && e < 1800000, s"easting $e")
    assert(n > 5400000 && n < 5460000, s"northing $n")
  }
}
