package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for Bench's prev-base parsing (no SparkSession needed).
  *
  * The r12 hole this guards: the driver committed a detail file whose
  * own gate had flagged it `"unadjudicated": true` (load_ratio 3.06,
  * medians ~18% inflated). Bench then adopted it as the regression
  * base — checking only the `sf` field — which would have made real
  * regressions up to the inflation factor invisible on the next run.
  * parsePrevBase must refuse such a file, loudly, in code rather than
  * by docs convention.
  */
class BenchBaseSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  private def detail(unadj: Boolean, sfDir: String = sf): String =
    s"""{"metric":"total","value":127.2,"unit":"sec","unadjudicated":$unadj,""" +
      s""""disp_frac2":0.0000,"queries":{"q_agg_pricing":0.345,"q_tfidf":0.5},""" +
      s""""warm":{"q_agg_pricing":0.999,"q_tfidf":0.999},"sf":"$sfDir"}"""

  test("an adjudicated same-sf detail parses to its medians map") {
    val r = Bench.parsePrevBase(detail(unadj = false), sf)
    assert(r == Right(Map("q_agg_pricing" -> 0.345, "q_tfidf" -> 0.5)))
  }

  test("an unadjudicated detail is REFUSED as a regression base") {
    val r = Bench.parsePrevBase(detail(unadj = true), sf)
    assert(r.isLeft)
    assert(r.left.exists(_.contains("unadjudicated")),
      s"the refusal must name the flag so the operator knows why: $r")
  }

  test("the unadjudicated check tolerates whitespace around the colon") {
    val txt = detail(unadj = false)
      .replace("\"unadjudicated\":false", "\"unadjudicated\" : true")
    assert(Bench.parsePrevBase(txt, sf).isLeft)
  }

  test("a detail measured at another sf dir is refused (not like-for-like)") {
    val r = Bench.parsePrevBase(detail(unadj = false, sfDir = "/tmp/sf0.001"), sf)
    assert(r.isLeft)
  }

  test("medians come from the queries object, not the warm map") {
    // both maps share key names; the parse must scope to "queries"
    val r = Bench.parsePrevBase(detail(unadj = false), sf)
    assert(r.exists(_("q_agg_pricing") == 0.345))
  }
}
