package graft.geo

/** Z-order (Morton) curve interval algebra for space-filling-curve
  * range queries: decompose a grid-aligned bbox into a bounded list of
  * zkey intervals that a SORTED-by-zkey columnar layout can skip
  * against (parquet row-group min/max stats), with the exact gx/gy
  * predicate re-applied post-scan — the standard two-phase
  * coarse-prune / exact-refine shape of every curve-indexed store.
  *
  * The cover is deliberately OVERAPPROXIMATE at block granularity:
  * recursing to single cells would produce O(perimeter) intervals
  * (hundreds of OR'd BETWEENs in the pushed filter — slower to
  * evaluate than the IO it saves), while aligned 2^blockBits-square
  * blocks bound the interval count by the block-grid area of the bbox
  * and bound the false-positive area by the block perimeter padding.
  * The refine filter restores exactness regardless.
  */
object ZCurve {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) — the Morton code of grid cell (x, y).
    */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Z-interval cover of [gx0,gx1]×[gy0,gy1] on a 2^bits grid at
    * 2^blockBits-aligned block granularity: every block touching the
    * bbox contributes its full (contiguous) z-interval, adjacent
    * intervals merge. Returned sorted ascending, pairwise disjoint.
    * A key property the spec pins: a block's cells are EXACTLY one
    * contiguous zkey interval because low 2·blockBits z-bits enumerate
    * the within-block cells for a fixed block prefix.
    */
  def ranges(gx0: Long, gx1: Long, gy0: Long, gy1: Long,
      bits: Int, blockBits: Int): Seq[(Long, Long)] = {
    require(blockBits >= 0 && blockBits <= bits)
    val span = 1L << (2 * blockBits)
    val raw =
      for (bx <- (gx0 >> blockBits) to (gx1 >> blockBits);
           by <- (gy0 >> blockBits) to (gy1 >> blockBits)) yield {
        val base = interleave(bx, by, bits - blockBits) * span
        (base, base + span - 1)
      }
    raw.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
      case ((plo, phi) :: rest, (lo, hi)) if lo == phi + 1 =>
        (plo, hi) :: rest
      case (acc, r) => r :: acc
    }.reverse
  }
}
