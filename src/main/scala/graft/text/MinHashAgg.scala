package graft.text

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.10's reserved `Aggregator` slot): a MinHash
  * sketch over GROUPS of documents — per seed, the minimum
  * md5("<seed>:<shingle>") across every shingle of every doc in the
  * group. MinHash minima are associative/commutative, so the sketch
  * merges like any distributive aggregate: partial sketches per
  * partition, elementwise-min on merge — the map-side-combine shape
  * that makes corpus-level signatures feasible at 100 TB.
  *
  * The estimate use: two groups' sketches agree on k of 8 positions →
  * Jaccard ≈ k/8 between their shingle sets.
  */
object MinHashAgg extends Aggregator[Seq[String], Array[String], Seq[String]] {

  val NumHashes = 8

  private val Hex = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def zero: Array[String] = new Array[String](NumHashes)

  override def reduce(buf: Array[String], shingles: Seq[String]): Array[String] = {
    val md = MessageDigest.getInstance("MD5")
    var seed = 0
    while (seed < NumHashes) {
      val prefix = seed.toString + ":"
      var min = buf(seed)
      shingles.foreach { sh =>
        val h = md5Hex(md, prefix + sh)
        if (min == null || h < min) min = h
      }
      buf(seed) = min
      seed += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < NumHashes) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    Encoders.javaSerialization[Array[String]]

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
