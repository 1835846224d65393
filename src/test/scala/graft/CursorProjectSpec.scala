package graft

import graft.sources.GeoJsonSource

/** SRC-4 (ETL.py:265–267): the projected cursor scan. The reference's
  * SearchCursor materializes ONLY its field list; Spark's JSON reader
  * does not nested-prune through explode (SchemaPruning covers
  * Parquet/ORC), so GeoJsonSource.cursor declares the pruned schema at
  * the reader — these tests pin that the scan's ReadSchema is exactly
  * the cursor's field list (PartitionPruningSpec's plan-string
  * approach) and that the cursored values match the full parse.
  */
class CursorProjectSpec extends SparkSpecBase {

  private def readSchemaOf(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan.linesIterator.find(_.trim.startsWith("ReadSchema:"))
      .getOrElse(fail(s"no ReadSchema line in plan:\n$plan"))
  }

  test("3-field cursor prunes the type members out of the scan schema") {
    val c = GeoJsonSource.cursor(spark, GeoJsonSource.fixturePath,
      Seq("code", "raw_title", "wkt"))
    val rs = readSchemaOf(c)
    assert(rs.contains("REGC_code") && rs.contains("REGC_name_ascii")
      && rs.contains("coordinates"), rs)
    // the unrequested feature `type` and geometry `type` never reach the
    // parser — the whole point of the cursor projection
    assert(!rs.contains("type"), rs)
  }

  test("attribute-only cursor never parses geometry at all") {
    val c = GeoJsonSource.cursor(spark, GeoJsonSource.fixturePath,
      Seq("code", "raw_title"))
    val rs = readSchemaOf(c)
    assert(rs.contains("REGC_code") && rs.contains("REGC_name_ascii"), rs)
    assert(!rs.contains("geometry") && !rs.contains("coordinates"), rs)
  }

  test("cursor values match the full FeatureCollection parse") {
    val full = GeoJsonSource.features(spark, GeoJsonSource.fixturePath)
      .select("code", "raw_title", "wkt").orderBy("code").collect()
    val cur = GeoJsonSource.cursor(spark, GeoJsonSource.fixturePath,
      Seq("code", "raw_title", "wkt")).orderBy("code").collect()
    assert(cur.length == 17)
    assert(cur.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("cursor field order follows the request and unknown fields fail") {
    val c = GeoJsonSource.cursor(spark, GeoJsonSource.fixturePath,
      Seq("wkt", "code"))
    assert(c.columns.toSeq == Seq("wkt", "code"))
    val ex = intercept[IllegalArgumentException] {
      GeoJsonSource.cursor(spark, GeoJsonSource.fixturePath, Seq("SHAPE@"))
    }
    assert(ex.getMessage.contains("SHAPE@"))
  }
}
