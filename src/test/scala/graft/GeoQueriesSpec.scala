package graft

import org.apache.spark.sql.functions._
import graft.queries.GeoQueries

class GeoQueriesSpec extends SparkSpecBase {

  test("every geo query runs and returns rows at sf0.001") {
    GeoQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("envelope matches closed form for nation 3") {
    val r = GeoQueries.queries("q_extent_envelope")(spark, sf)
      .filter(col("n_nationkey") === 3).head()
    // k=3: x0=1627000, y0=5021000, w=4500, h=3200
    assert(r.getAs[Double]("xmin") == 1627000.0)
    assert(r.getAs[Double]("ymin") == 5021000.0)
    assert(r.getAs[Double]("xmax") == 1631500.0)
    assert(r.getAs[Double]("ymax") == 5024200.0)
  }

  test("geojson ring is closed and 5 points") {
    val g = GeoQueries.queries("q_geojson_polygon")(spark, sf)
      .filter(col("n_nationkey") === 0).head().getAs[String]("geojson")
    assert(g.startsWith("""{"type": "Polygon", "coordinates": [["""))
    val pts = g.count(_ == '[') - 2 // outer two brackets
    assert(pts == 5, s"expected closed 5-point ring in $g")
  }

  test("reprojected bbox is inside NZ lat/lon ranges and ordered") {
    GeoQueries.queries("q_reproject_4326")(spark, sf).collect().foreach { r =>
      val latMin = r.getAs[Double]("lat_min"); val latMax = r.getAs[Double]("lat_max")
      val lonMin = r.getAs[Double]("lon_min"); val lonMax = r.getAs[Double]("lon_max")
      assert(latMin < latMax && lonMin < lonMax)
      assert(latMin > -47 && latMax < -40, s"lat range ($latMin,$latMax)")
      assert(lonMin > 172 && lonMax < 176, s"lon range ($lonMin,$lonMax)")
    }
  }

  test("spatial join only pairs points strictly inside triangles") {
    val df = GeoQueries.queries("q_spatial_join")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Int]("n_nationkey").toDouble
      val px = r.getAs[Double]("px"); val py = r.getAs[Double]("py")
      val x0 = 1600000.0 + 9000 * k; val y0 = 5000000.0 + 7000 * k
      val w = 3000.0 + 500 * k; val h = 2000.0 + 400 * k
      // envelope is a necessary condition for triangle membership
      assert(px > x0 && px < x0 + w && py > y0 && py < y0 + h)
    }
  }

  test("spatial join broadcasts the region side") {
    val plan = GeoQueries.queries("q_spatial_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
