package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property tests for the winnowing fingerprint kernel
  * (graft.plans.TextOps) against an independently-written naive
  * reference: full-polynomial hashing per position (BigInt, no
  * stepwise mod), window minima via `sliding`, distinct via Seq. The
  * kernel uses stepwise `(h·131+c) mod m` and a hand-rolled window
  * scan — the reference deliberately shares neither.
  */
object FingerprintProps extends Properties("fingerprints") {

  private val K = 5
  private val W = 4
  private val Mod = 2147483647L

  /** Naive reference — the formulation the DuckDB oracle uses. */
  private def reference(text: String): Seq[Int] = {
    if (text.length < K) return Seq.empty
    val hashes = text.toSeq.sliding(K).map { gram =>
      gram.foldLeft(BigInt(0))((acc, c) => acc * 131 + c.toInt).mod(Mod).toLong
    }.toSeq
    if (hashes.length < W) Seq.empty
    else hashes.sliding(W).map(_.min).toSeq.distinct.sorted.map(_.toInt)
  }

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.alphaLowerChar), (2, Gen.const(' ')), (1, Gen.numChar)))
        .map(_.mkString))

  property("kernel equals the naive polynomial/sliding reference") =
    Prop.forAll(asciiText) { text =>
      graft.plans.TextOps.fingerprints(text).toSeq == reference(text)
    }

  property("short texts (< k+w-1 chars) have no fingerprints") =
    Prop.forAll(Gen.chooseNum(0, K + W - 2).flatMap(n =>
      Gen.listOfN(n, Gen.alphaChar).map(_.mkString))) { text =>
      graft.plans.TextOps.fingerprints(text).isEmpty
    }

  property("fingerprints are distinct, ascending, and drawn from the position hashes") =
    Prop.forAll(asciiText) { text =>
      val fp = graft.plans.TextOps.fingerprints(text)
      val sortedDistinct = fp.toSeq == fp.toSeq.distinct.sorted
      val fromHashes = text.length < K || {
        val all = text.toSeq.sliding(K).map(
          _.foldLeft(0L)((acc, c) => (acc * 131 + c.toInt) % Mod)).toSet
        fp.forall(h => all.contains(h.toLong))
      }
      sortedDistinct && fromHashes
    }

  property("appending a tail preserves most fingerprints of a long base text") = {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val a = graft.plans.TextOps.fingerprints(base).toSet
    val b = graft.plans.TextOps.fingerprints(base + " zzz tail").toSet
    (a.intersect(b).size.toDouble / a.size > 0.8) :| "tail-extended twin overlap"
  }
}
