package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.ZCurve

/** Properties of the z-interval bbox cover backing q_zrange_search:
  * soundness (every bbox cell's zkey is inside some interval — a miss
  * would silently drop result rows, which the exact refine filter
  * cannot repair) and block-tightness (an interval never reaches
  * outside the block-aligned padding of the bbox — the
  * overapproximation is bounded by construction, not accidental).
  */
class ZCurveProps extends AnyFunSuite {

  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L; var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  test("interleave and deinterleave are inverse on the full 6-bit grid") {
    for (x <- 0L until 64L; y <- 0L until 64L) {
      assert(deinterleave(ZCurve.interleave(x, y, 6), 6) === ((x, y)))
    }
  }

  test("random bboxes: cover is sound, block-tight, sorted, disjoint") {
    val rnd = new scala.util.Random(7)
    val (bits, blockBits) = (6, 2)
    val n = 1 << bits
    val pad = (1L << blockBits) - 1
    for (_ <- 1 to 60) {
      val x0 = rnd.nextInt(n).toLong
      val x1 = x0 + rnd.nextInt(n - x0.toInt)
      val y0 = rnd.nextInt(n).toLong
      val y1 = y0 + rnd.nextInt(n - y0.toInt)
      val ranges = ZCurve.ranges(x0, x1, y0, y1, bits, blockBits)
      // sorted ascending, pairwise disjoint, merged (gap ≥ 2)
      ranges.sliding(2).foreach {
        case Seq((_, phi), (lo, _)) => assert(lo >= phi + 2)
        case _ => ()
      }
      ranges.foreach { case (lo, hi) => assert(lo <= hi) }
      // soundness: every bbox cell's zkey lands in some interval
      for (x <- x0 to x1; y <- y0 to y1) {
        val z = ZCurve.interleave(x, y, bits)
        assert(ranges.exists { case (lo, hi) => z >= lo && z <= hi },
          s"cell ($x,$y) z=$z escaped the cover of [$x0,$x1]x[$y0,$y1]")
      }
      // block-tightness: every covered zkey decodes inside the
      // block-aligned padding of the bbox
      for ((lo, hi) <- ranges; z <- lo to hi) {
        val (x, y) = deinterleave(z, bits)
        assert(x >= (x0 & ~pad) && x <= (x1 | pad) &&
          y >= (y0 & ~pad) && y <= (y1 | pad),
          s"z=$z → ($x,$y) outside padded [$x0,$x1]x[$y0,$y1]")
      }
    }
  }
}
