package graft

import org.apache.spark.sql.functions._

/** Spark 4.1's native geospatial surface (SURVEY.md §7.0: GeometryType
  * plus exactly ST_GeomFromWKB / ST_GeogFromWKB / ST_AsBinary /
  * ST_SetSrid / ST_Srid) interoperating with the JTS kernel this engine
  * uses for everything the built-ins lack: JTS writes WKB, Spark's
  * GEOMETRY column carries it with an SRID, and ST_AsBinary returns the
  * identical bytes.
  */
class StNativeSpec extends SparkSpecBase {

  // GEOMETRY/GEOGRAPHY + ST functions ship dark in 4.1 behind this flag.
  // The SRID registry is also closed (EPSG:2193/NZTM is rejected), so the
  // round-trip pins 4326; NZTM semantics stay on the JTS/WKT path.
  private def enableGeo(): Unit =
    spark.conf.set("spark.sql.geospatial.enabled", "true")

  private def wkbOf(wkt: String): Array[Byte] = {
    val geom = graft.geo.Jts.parseWkt(wkt)
    new org.locationtech.jts.io.WKBWriter().write(geom)
  }

  test("JTS WKB → ST_GeomFromWKB → ST_SetSrid → ST_Srid/ST_AsBinary round-trip") {
    import spark.implicits._
    enableGeo()
    val wkt = "POLYGON ((1600000 5000000, 1603000 5001000, 1601000 5002000, 1600000 5000000))"
    val df = Seq(Tuple1(wkbOf(wkt))).toDF("wkb")
      .withColumn("geom", expr("st_setsrid(st_geomfromwkb(wkb), 4326)"))
      .select(expr("st_srid(geom)").as("srid"),
        expr("st_asbinary(geom)").as("wkb_out"), col("wkb"))
    val r = df.head()
    assert(r.getAs[Int]("srid") === 4326)
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("wkb_out"),
      r.getAs[Array[Byte]]("wkb")))
  }

  test("WKB binary columns are the storage path; GEOMETRY is in-flight only") {
    import spark.implicits._
    enableGeo()
    // 4.1's parquet writer rejects GeometryType (INTERNAL_ERROR
    // "Unsupported data type GeometryType"), so geometries persist as
    // WKB binary (st_asbinary before write, st_geomfromwkb after read)
    // — the convention this engine's sources/sinks already use.
    val dir = java.nio.file.Files.createTempDirectory("graft-geom").toString
    val wkts = Seq(
      "POINT (1600000 5000000)",
      "POLYGON ((0 0, 1 0, 1 1, 0 0))")
    wkts.map(w => Tuple1(wkbOf(w))).toDF("wkb")
      .withColumn("geom", expr("st_setsrid(st_geomfromwkb(wkb), 4326)"))
      .select(expr("st_asbinary(geom)").as("wkb"))
      .write.mode("overwrite").parquet(s"$dir/geoms")
    val back = spark.read.parquet(s"$dir/geoms")
      .withColumn("geom", expr("st_setsrid(st_geomfromwkb(wkb), 4326)"))
      .select(expr("st_srid(geom)").as("srid"),
        expr("st_asbinary(geom)").as("wkb"))
      .collect()
    assert(back.length === 2)
    assert(back.forall(_.getAs[Int]("srid") === 4326))
    val reader = new org.locationtech.jts.io.WKBReader()
    val got = back.map(r => reader.read(r.getAs[Array[Byte]]("wkb")).toText).sorted
    assert(got.toSeq === wkts.map(w => graft.geo.Jts.parseWkt(w).toText).sorted)
  }
}
