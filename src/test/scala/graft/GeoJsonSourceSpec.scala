package graft

import org.apache.spark.sql.functions._
import graft.sources.GeoJsonSource

/** SRC-3: FeatureCollection parse — schema'd read, HOF ring→WKT, region
  * dim derivation, and the full pipeline running off the GeoJSON dim.
  */
class GeoJsonSourceSpec extends SparkSpecBase {

  test("fixture parses to 17 features with closed 5-vertex rings") {
    val f = GeoJsonSource.features(spark, GeoJsonSource.fixturePath)
    assert(f.count() == 17)
    val row = f.filter(col("code") === "01").head()
    assert(row.getAs[String]("gtype") == "Polygon")
    assert(row.getAs[Long]("n_rings") == 1L)
    assert(row.getAs[Long]("n_vertices") == 5L)
    val wkt = row.getAs[String]("wkt")
    assert(wkt.startsWith("POLYGON ((") && wkt.endsWith("))"), wkt)
    // closed ring: first point == last point
    val pts = wkt.stripPrefix("POLYGON ((").stripSuffix("))").split(", ")
    assert(pts.head == pts.last)
    // the WKT is JTS-parseable (feeds the clip path downstream)
    assert(graft.geo.Jts.parseWkt(wkt).getArea > 0)
  }

  test("regions() joins the lookup name and keeps service titles") {
    val r = GeoJsonSource.regions(spark, GeoJsonSource.fixturePath)
    assert(r.columns.toSeq == Seq("code", "name", "raw_title", "wkt"))
    val m = r.collect().map(x => x.getString(0) -> (x.getString(1), x.getString(2))).toMap
    assert(m("06") == ("Hawkes-Bay", "Hawkes Bay Region"))
    assert(m("99")._2 == "Area Outside Region")
  }

  test("URL location resolves through the injectable fetcher (offline mock)") {
    val fixtureBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(GeoJsonSource.fixturePath))
    var asked = List.empty[String]
    val r = GeoJsonSource.withFetcher(url => {
      asked ::= url
      new java.io.ByteArrayInputStream(fixtureBytes)
    }) {
      GeoJsonSource.regions(spark,
        "https://services.example.invalid/regions/FeatureServer/0/query?f=geojson")
    }
    assert(asked ==
      List("https://services.example.invalid/regions/FeatureServer/0/query?f=geojson"))
    assert(r.count() == 17)
    assert(r.filter(col("code") === "06").head().getString(1) == "Hawkes-Bay")
  }

  test("opt-in: the DEFAULT fetcher works against a live endpoint (GRAFT_ONLINE=1)") {
    // The sandbox has no egress, so the default URL path can only be
    // exercised end-to-end where the operator opts in. Any https URL
    // returning a GeoJSON FeatureCollection works; default is the
    // public Stats NZ regional-council service the reference consumes
    // (ETL.py:184–187). Offline (the normal case) this test is skipped.
    assume(sys.env.get("GRAFT_ONLINE").contains("1"),
      "set GRAFT_ONLINE=1 (and optionally GRAFT_ONLINE_URL) to run the live-fetch test")
    val url = sys.env.getOrElse("GRAFT_ONLINE_URL",
      "https://raw.githubusercontent.com/datasets/geo-countries/master/data/countries.geojson")
    // materialize() is the path that has never run online: default
    // fetcher (with its 30 s timeouts) → temp file
    val local = GeoJsonSource.materialize(url)
    val bytes = java.nio.file.Files.size(java.nio.file.Paths.get(local))
    assert(bytes > 0, s"live endpoint $url produced an empty document")
    // any FeatureCollection must parse as json with a features array
    val n = spark.read.option("multiLine", true).json(local)
      .selectExpr("size(features) AS n").head().getInt(0)
    assert(n > 0, s"live endpoint $url returned no features")
  }

  test("local paths bypass the fetcher entirely") {
    GeoJsonSource.withFetcher(_ =>
      fail("fetcher must not be consulted for a local path")) {
      assert(GeoJsonSource.features(spark, GeoJsonSource.fixturePath).count() == 17)
    }
  }

  test("PipelineMain's --regions_geojson accepts the URL shape (mocked)") {
    // the CLI passes the location string straight to
    // GeoJsonSource.regions, so the URL-or-path contract is the same
    // hook; this pins the end-to-end shape PipelineMain documents
    val fixtureBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(GeoJsonSource.fixturePath))
    GeoJsonSource.withFetcher(_ => new java.io.ByteArrayInputStream(fixtureBytes)) {
      val work = java.nio.file.Files.createTempDirectory("graft-geojson-url").toString
      val in = java.nio.file.Paths.get(work, "in", "05")
      java.nio.file.Files.createDirectories(in)
      java.nio.file.Files.writeString(
        in.resolve("grid_02_NZ_norm_Mean_1991-2020_monthly7.asc"),
        graft.raster.GridGen.genText(0))
      val regions = GeoJsonSource.regions(spark, "https://example.invalid/fc.geojson")
      val res = graft.etl.Pipeline.run(spark, s"$work/in", regions,
        s"$work/out", updatedAt = "2026-01-01T00:00:00Z")
      assert(res.catalog.count() == 16)
    }
  }

  test("pipeline runs end-to-end off the GeoJSON region dim") {
    val work = java.nio.file.Files.createTempDirectory("graft-geojson-pipe").toString
    val in = java.nio.file.Paths.get(work, "in", "05")
    java.nio.file.Files.createDirectories(in)
    java.nio.file.Files.writeString(
      in.resolve("grid_02_NZ_norm_Mean_1991-2020_monthly7.asc"),
      graft.raster.GridGen.genText(0))
    val regions = GeoJsonSource.regions(spark, GeoJsonSource.fixturePath)
    val res = graft.etl.Pipeline.run(spark, s"$work/in", regions,
      s"$work/out", updatedAt = "2026-01-01T00:00:00Z")
    // 16 regions after the code-99 drop; region 18's far-away box clips empty
    assert(res.catalog.count() == 16)
    assert(res.catalog.filter(col("region_code") === "18")
      .head().getAs[Long]("n_valid") == 0L)
  }
}
