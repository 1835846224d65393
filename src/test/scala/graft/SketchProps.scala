package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{KmvAgg, VecSumAgg}

/** Property tests for the sketch Aggregators: any partitioning/order of
  * the input must produce the same result as the serial reference —
  * that associativity IS the map-side-combine correctness claim.
  * (Plain ScalaCheck `Properties`, same as RoundTripProps — the
  * scalatest↔scalacheck bridge artifact is not in the offline cache.)
  */
object SketchProps extends Properties("sketches") {

  private val values: Gen[List[Double]] =
    Gen.listOf(Gen.chooseNum(0.0, 1.0)).map(_.take(100))

  property("kmv.mergedPartitionsEqualSerialTopK") =
    Prop.forAll(values, Gen.chooseNum(1, 5)) { (xs: List[Double], nParts: Int) =>
      val k = 8
      val agg = new KmvAgg(k)
      val expected = xs.distinct.sorted.take(k)
      // arbitrary partitioning: reduce each slice, merge in a fold
      val parts = xs.grouped(math.max(1, xs.length / math.max(nParts, 1))).toList
      val merged = parts
        .map(p => p.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
        .foldLeft(agg.zero)((a, b) => agg.merge(a, b))
      agg.finish(merged) == expected
    }

  property("kmv.duplicatesOccupyOneSlot") = Prop {
    val agg = new KmvAgg(4)
    val b = Seq(0.5, 0.5, 0.1, 0.1, 0.9, 0.3, 0.3, 0.2)
      .foldLeft(agg.zero)((buf, x) => agg.reduce(buf, x))
    agg.finish(b) == Seq(0.1, 0.2, 0.3, 0.5)
  }

  private val vecs: Gen[List[List[Float]]] =
    Gen.listOf(Gen.listOfN(8, Gen.chooseNum(-10f, 10f))).map(_.take(30))

  property("vecsum.mergedPartitionsEqualSerialSum") =
    Prop.forAll(vecs, Gen.chooseNum(1, 4)) { (vs: List[List[Float]], nParts: Int) =>
      vs.isEmpty || {
        val expected = (0 until 8).map(d => vs.map(_(d).toDouble).sum)
        val parts = vs.grouped(math.max(1, vs.length / nParts)).toList
        val merged = parts
          .map(p => p.foldLeft(VecSumAgg.zero)((b, v) => VecSumAgg.reduce(b, v)))
          .foldLeft(VecSumAgg.zero)((a, b) => VecSumAgg.merge(a, b))
        // double addition is not associative across groupings — compare
        // with a tolerance scaled to the magnitude
        VecSumAgg.finish(merged).zip(expected).forall { case (got, exp) =>
          math.abs(got - exp) <= 1e-9 * math.max(1.0, math.abs(exp))
        }
      }
    }

  // ragged inputs: mixed lengths must grow the buffer, zero-fill the
  // tail, and never truncate — same contract as VecSumAgg, double input
  private val raggedD: Gen[List[List[Double]]] =
    Gen.listOf(Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)))).map(_.take(30))

  property("vecsumd.raggedMergeEqualsSerialZeroPadded") =
    Prop.forAll(raggedD, Gen.chooseNum(1, 4)) { (vs: List[List[Double]], nParts: Int) =>
      import graft.functions.VecSumDoubleAgg
      val width = (0 :: vs.map(_.length)).max
      val expected = (0 until width).map(d =>
        vs.map(v => if (d < v.length) v(d) else 0.0).sum)
      val parts = vs.grouped(math.max(1, vs.length / nParts)).toList
      val merged = parts
        .map(p => p.foldLeft(VecSumDoubleAgg.zero)((b, v) => VecSumDoubleAgg.reduce(b, v)))
        .foldLeft(VecSumDoubleAgg.zero)((a, b) => VecSumDoubleAgg.merge(a, b))
      VecSumDoubleAgg.finish(merged).zip(expected).forall { case (got, exp) =>
        math.abs(got - exp) <= 1e-9 * math.max(1.0, math.abs(exp))
      }
    }
}
