package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Session extension installer (SURVEY.md §7.3): registers graft's
  * native expressions so any session — including pure-SQL users —
  * gets them at builder time:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT nztm_to_wgs84(e, n) FROM points")
  * }}}
  *
  * (Custom Rule/SparkStrategy injection is intentionally absent:
  * Catalyst's built-in rules cover every rewrite the parity pipeline
  * needs — SURVEY.md §4.3 — and the reserved slot for a grid-
  * partitioned spatial-join strategy only pays off beyond broadcast
  * region cardinalities.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("nztm_to_wgs84"),
      NztmToWgs84.info,
      NztmToWgs84.build))
  }
}
