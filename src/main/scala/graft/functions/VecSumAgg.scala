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

  // Ragged inputs (mixed dimensionality) are handled by growing the
  // buffer to the longest vector seen, treating absent trailing
  // dimensions as 0 — never silently truncating, never indexing past
  // the shorter side (a first-seen short vector must not crash merge).
  private def grown(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)

  override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
    val b = grown(buf, v.length)
    var i = 0
    while (i < v.length) { b(i) += v(i).toDouble; i += 1 }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = grown(a, b.length)
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    Encoders.javaSerialization[Array[Double]]

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

/** Long-input twin of [[VecSumAgg]] for INTEGER-EXACT moment sums.
  * Integer addition is associative and commutative with NO rounding, so
  * the reduction is order-independent across partitions and bit-identical
  * to any other engine summing the same integers — which is what makes a
  * quantized covariance/gram pass hash-comparable against a DuckDB
  * oracle (double sums are partition-order dependent; these are not).
  * Same ragged-growth and map-side-combine contract as the siblings.
  * Overflow headroom: callers quantize inputs so a worst-case entry is
  * ≤2^39; 2^63 capacity leaves ~2^24 ≈ 16M rows per PARTIAL buffer and
  * the merge tree adds log₂(partitions) bits — at 100 TB the quantizer
  * scale (not this buffer) is the knob to turn first.
  */
object VecSumLongAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def grown(buf: Array[Long], n: Int): Array[Long] =
    if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    val b = grown(buf, v.length)
    var i = 0
    while (i < v.length) { b(i) += v(i); i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = grown(a, b.length)
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.javaSerialization[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** Double-input twin of [[VecSumAgg]], for reducing per-row DERIVED
  * vectors (outer-product triangles, pre-widened moments) where a
  * float buffer would lose the precision the derivation just paid for.
  * Same ragged-growth contract; same map-side-combine shape — a
  * dims²/2-double buffer per partition is all that crosses the wire,
  * which is what makes a corpus-wide covariance/gram reduce a single
  * cheap stage at 100 TB (vs exploding |rows|·dims² cells).
  */
object VecSumDoubleAgg extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def grown(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)

  override def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] = {
    val b = grown(buf, v.length)
    var i = 0
    while (i < v.length) { b(i) += v(i); i += 1 }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = grown(a, b.length)
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    Encoders.javaSerialization[Array[Double]]

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
