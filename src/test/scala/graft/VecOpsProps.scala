package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Property tests for the native vector kernels (graft.plans.VecOps)
  * against independently-written references over random 64-dim float
  * vectors — the kernels run inside generated code, so these are the
  * guards that the hand-rolled loops implement the algebra they claim.
  */
object VecOpsProps extends Properties("vecops") {

  private val vec64: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](64, Gen.chooseNum(-8.0f, 8.0f))

  private def arr(a: Array[Float]) =
    new GenericArrayData(a.map(x => x: Any))

  property("dot equals index-order fold, symmetric") =
    Prop.forAll(vec64, vec64) { (a, b) =>
      val d = graft.plans.VecOps.dot(arr(a), arr(b))
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      d == ref && d == graft.plans.VecOps.dot(arr(b), arr(a))
    }

  property("dot(v, v) is non-negative") =
    Prop.forAll(vec64) { v =>
      graft.plans.VecOps.dot(arr(v), arr(v)) >= 0.0
    }

  property("bands: band 0's low byte equals the 8-bit bucket (shared weight family)") =
    Prop.forAll(vec64) { v =>
      val bands = graft.plans.VecOps.bands(arr(v))
      (bands.getLong(0) & 0xffL) == graft.plans.VecOps.bucket(arr(v))
    }

  property("bands: sign flip of the vector flips every decided hyperplane bit") =
    Prop.forAll(vec64) { v =>
      // Σ w·v > 0 ⇔ Σ w·(−v) < 0: a bit set for v must be clear for −v.
      // (A plane can be unset for both only when the sum is exactly 0.)
      val pos = graft.plans.VecOps.bands(arr(v))
      val neg = graft.plans.VecOps.bands(arr(v.map(-_)))
      (0 until 4).forall(j => (pos.getLong(j) & neg.getLong(j)) == 0L)
    }

  property("bands agree with the published weight formula") =
    Prop.forAll(vec64) { v =>
      val bands = graft.plans.VecOps.bands(arr(v))
      val expected = Array.fill(4)(0L)
      for (h <- 0 until 64) {
        var s = 0.0
        for (d <- 0 until 64)
          s += (if (((h * 64 + d) * 37) % 97 < 48) 1.0 else -1.0) * v(d).toDouble
        if (s > 0) expected(h >> 4) |= (1L << (h & 15))
      }
      (0 until 4).forall(j => bands.getLong(j) == expected(j))
    }
}
