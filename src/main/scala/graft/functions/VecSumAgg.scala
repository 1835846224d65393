package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise vector-sum Aggregator — the reduction inside a k-means /
  * IVF centroid update (M-step): per cell, the sum of all member
  * embeddings, merged elementwise. As a typed Aggregator this is a true
  * map-side combine: each partition reduces its members into ONE
  * 64-double buffer and only buffers cross the wire — the alternative
  * (posexplode to (cell, dim, x) rows) shuffles |vectors|·dims rows.
  * The mean is taken by the caller (sum ÷ count) so the buffer stays
  * associative.
  */
object VecSumAgg extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
    val b = if (buf.length == 0) new Array[Double](v.length) else buf
    var i = 0
    val n = math.min(b.length, v.length)
    while (i < n) { b(i) += v(i).toDouble; i += 1 }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    Encoders.javaSerialization[Array[Double]]

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
