package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the native MinHash banding kernel
  * (graft.plans.MinhashOps) against an independently-written
  * reference: per-seed md5 over the CONCATENATED "seed:shingle"
  * String, hex via format, minimum by STRING comparison of lowercase
  * hex (== unsigned byte order for equal-length digests). The kernel
  * deliberately shares none of that — it digests prefix bytes then
  * reused shingle bytes and compares raw digests bytewise — so
  * agreement here pins the optimization, not a shared formulation.
  * NativeExprSpec covers the Spark-plan path; this covers the kernel
  * on arbitrary inputs including nulls and non-ASCII.
  */
object MinhashProps extends Properties("minhash_bands") {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Naive reference — mirrors the legacy UDF's formulation, with a
    * null shingle stringified by Scala concat ("<seed>:null").
    */
  private def reference(shingles: Seq[String]): Seq[String] = {
    val sig = (0 until 8).map { seed =>
      if (shingles.isEmpty) ""
      else shingles.map(sh => md5hex(seed + ":" + sh)).min
    }
    (0 until 4).map(b => md5hex(sig(2 * b) + sig(2 * b + 1)))
  }

  private def kernel(shingles: Seq[String]): Seq[String] = {
    val in: ArrayData = new GenericArrayData(
      shingles.map(s => if (s == null) null else UTF8String.fromString(s)).toArray[Any])
    val out = graft.plans.MinhashOps.bands(in)
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  // printable BMP chars below the surrogate range: lone surrogates
  // round-trip differently through UTF8String vs String.getBytes and
  // are not a case the column can contain
  private val shingle: Gen[String] = Gen.frequency(
    (8, Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.choose(' ', '⿿')).map(_.mkString))),
    (1, Gen.const(null: String)))

  private val shingles: Gen[List[String]] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, shingle))

  property("kernel equals the concat-string reference") =
    Prop.forAll(shingles) { sh => kernel(sh) == reference(sh) }

  property("always 4 band keys of 32 lowercase hex chars") =
    Prop.forAll(shingles) { sh =>
      val out = kernel(sh)
      out.length == 4 && out.forall(_.matches("[0-9a-f]{32}"))
    }

  // the permutation seed comes from the GENERATOR so a failing case
  // replays exactly under ScalaCheck's seed — a global-RNG shuffle
  // would make any counterexample non-reproducible
  property("band keys depend only on the shingle SET order-insensitively " +
    "(min is order-free)") =
    Prop.forAll(Gen.zip(shingles, Gen.long)) { case (sh, seed) =>
      kernel(sh) == kernel(new scala.util.Random(seed).shuffle(sh))
    }
}
