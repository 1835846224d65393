package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.GeoUdfs

/** Geospatial operator queries (SURVEY.md §2.8) over deterministic
  * synthetic NZTM geometries derived from the nation/customer keys, so
  * the DuckDB oracle can recompute every figure arithmetically while
  * the Spark side exercises the real JTS machinery (WKT parse,
  * envelope, containment, ring walk).
  *
  * Geometry synthesis (both engines):
  *   - per nation k: triangle A=(x0,y0), B=(x0+w, y0+h/2),
  *     C=(x0+1000+100k, y0+h), with x0=1600000+9000k, y0=5000000+7000k,
  *     w=3000+500k, h=2000+400k  (all integer-valued doubles → exact);
  *   - per customer c: probe point (1600000 + (37c mod 250000) + 0.5,
  *     5000000 + (53c mod 180000) + 0.5) — the 0.5 offsets guarantee no
  *     point ever lies on an integer envelope boundary, so JTS's strict
  *     interior semantics and the oracle's strict inequalities agree.
  *
  * Scale posture: regions are a broadcast dim (16–25 rows), so the
  * spatial join is a BroadcastNestedLoopJoin with a cheap per-pair
  * predicate — the same shape the parity pipeline needs (JOIN-3). For
  * region counts beyond broadcast reach, the documented path is a grid
  * cell key (floor(x/cell), floor(y/cell)) on both sides + equi-join on
  * cell then exact predicate — turning the cross product into a
  * shuffle-partitioned join (SURVEY.md §7.6.4); not needed at parity
  * cardinalities.
  */
object GeoQueries {

  /** nation rows + triangle vertex/envelope columns (closed form). */
  private def nationTriangles(s: SparkSession, dir: String): DataFrame = {
    val k = col("n_nationkey").cast("double")
    s.read.parquet(s"$dir/nation.parquet")
      .withColumn("x0", lit(1600000.0) + lit(9000.0) * k)
      .withColumn("y0", lit(5000000.0) + lit(7000.0) * k)
      .withColumn("w", lit(3000.0) + lit(500.0) * k)
      .withColumn("h", lit(2000.0) + lit(400.0) * k)
      .withColumn("apex_x", col("x0") + lit(1000.0) + lit(100.0) * k)
      .withColumn("wkt", concat(
        lit("POLYGON (("),
        format_string("%.1f %.1f", col("x0"), col("y0")), lit(", "),
        format_string("%.1f %.1f", col("x0") + col("w"), col("y0") + col("h") / 2), lit(", "),
        format_string("%.1f %.1f", col("apex_x"), col("y0") + col("h")), lit(", "),
        format_string("%.1f %.1f", col("x0"), col("y0")),
        lit("))")))
  }

  /** Grid cell size for the partitioned spatial join (meters). Chosen
    * so a triangle bbox overlaps ≤ ~9 cells at fixture scale.
    */
  private val CellM = 8192.0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // OP-SP-4: envelope of each triangle via JTS (ETL.py:281).
    "q_extent_envelope" -> ((s, dir) =>
      nationTriangles(s, dir)
        .withColumn("env", GeoUdfs.st_envelope(col("wkt")))
        .select(col("n_nationkey"), col("n_name"),
          col("env._1").as("xmin"), col("env._2").as("ymin"),
          col("env._3").as("xmax"), col("env._4").as("ymax"))
        .orderBy("n_nationkey")),

    // OP-SP-6 + ETL.py:438: envelope→polygon→GeoJSON ring document.
    "q_geojson_polygon" -> ((s, dir) =>
      nationTriangles(s, dir)
        .select(col("n_nationkey"),
          GeoUdfs.st_envelope_geojson(col("wkt")).as("geojson"))
        .orderBy("n_nationkey")),

    // OP-SP-5: NZTM2000 → WGS84 corner reprojection via the NATIVE
    // Catalyst expression nztm_to_wgs84 (graft.plans.NztmToWgs84,
    // codegen'd — no UDF boundary). Not DuckDB-expressible (trig
    // series) → no oracle; bounds asserted in TransformSpec /
    // NativeExprSpec.
    "q_reproject_4326" -> ((s, dir) => {
      graft.plans.NztmToWgs84.register(s)
      nationTriangles(s, dir)
        .withColumn("env", GeoUdfs.st_envelope(col("wkt")))
        .withColumn("llmin", expr("nztm_to_wgs84(env._1, env._2)"))
        .withColumn("llmax", expr("nztm_to_wgs84(env._3, env._4)"))
        .select(col("n_nationkey"),
          round(col("llmin.lat"), 6).as("lat_min"),
          round(col("llmin.lon"), 6).as("lon_min"),
          round(col("llmax.lat"), 6).as("lat_max"),
          round(col("llmax.lon"), 6).as("lon_max"))
        .orderBy("n_nationkey")
    }),

    // JOIN-3: spatial containment join — customer probe points ×
    // broadcast nation triangles (BroadcastNestedLoopJoin, no shuffle).
    "q_spatial_join" -> ((s, dir) => {
      val pts = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"),
          (lit(1600000.0) + (col("c_custkey") * 37 % 250000).cast("double") + lit(0.5)).as("px"),
          (lit(5000000.0) + (col("c_custkey") * 53 % 180000).cast("double") + lit(0.5)).as("py"))
      // closed-form bbox prefilter: eliminates ~99% of pairs with a
      // codegen'd comparison before the (cached-prepared-geometry) UDF
      // runs; the bbox is a superset of the triangle, so semantics are
      // unchanged
      val tris = broadcast(nationTriangles(s, dir).select(
        col("n_nationkey"), col("wkt"),
        col("x0"), col("y0"), (col("x0") + col("w")).as("x1"),
        (col("y0") + col("h")).as("y1")))
      pts.crossJoin(tris)
        .filter(col("px") > col("x0") && col("px") < col("x1") &&
          col("py") > col("y0") && col("py") < col("y1"))
        .filter(GeoUdfs.st_contains_point(col("wkt"), col("px"), col("py")))
        .select(col("c_custkey"), col("n_nationkey"), col("px"), col("py"))
        .orderBy("c_custkey", "n_nationkey")
    }),

    // JOIN-3 at 100 TB: the GRID-PARTITIONED spatial join (SURVEY.md
    // §7.6.4). Both sides get a space-grid cell key — points one cell,
    // polygons every cell their bbox overlaps — the join becomes a
    // plain shuffle equi-join on the cell, and only same-cell pairs
    // run the exact predicate. No broadcast required, so it scales to
    // region counts far beyond autoBroadcastJoinThreshold; results are
    // identical to q_spatial_join (deduped, since a pair can meet in
    // one cell only — points live in exactly one cell).
    "q_spatial_join_grid" -> ((s, dir) => {
      val pts = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"),
          (lit(1600000.0) + (col("c_custkey") * 37 % 250000).cast("double") + lit(0.5)).as("px"),
          (lit(5000000.0) + (col("c_custkey") * 53 % 180000).cast("double") + lit(0.5)).as("py"))
        .withColumn("cx", floor(col("px") / CellM).cast("bigint"))
        .withColumn("cy", floor(col("py") / CellM).cast("bigint"))
      val tris = nationTriangles(s, dir)
        .select(col("n_nationkey"), col("wkt"), col("x0"), col("y0"),
          (col("x0") + col("w")).as("x1"), (col("y0") + col("h")).as("y1"))
        .withColumn("cx", explode(sequence(
          floor(col("x0") / CellM).cast("bigint"),
          floor(col("x1") / CellM).cast("bigint"))))
        .withColumn("cy", explode(sequence(
          floor(col("y0") / CellM).cast("bigint"),
          floor(col("y1") / CellM).cast("bigint"))))
      pts.join(tris, Seq("cx", "cy"))
        .filter(col("px") > col("x0") && col("px") < col("x1") &&
          col("py") > col("y0") && col("py") < col("y1"))
        .filter(GeoUdfs.st_contains_point(col("wkt"), col("px"), col("py")))
        .select(col("c_custkey"), col("n_nationkey"), col("px"), col("py"))
        .orderBy("c_custkey", "n_nationkey")
    }),

    // Measurement functions over the JTS kernel: planar area (shoelace),
    // perimeter, centroid — per-feature scalar geometry math, the
    // ST_Area/ST_Length/ST_Centroid surface. The oracle recomputes each
    // in closed form from the triangle parameters; all inputs are
    // integer-valued doubles, keeping both engines' arithmetic exact
    // enough that 2–4-decimal rounding is stable.
    // Distance-bounded nearest-neighbor spatial join — "the closest
    // facility within R" (service-area assignment, store matching).
    // The SCALABLE form of spatial kNN: an unbounded nearest join
    // cannot be grid-blocked (the nearest point may sit arbitrarily
    // far away), but with a radius bound R ≤ the blocking cell size,
    // a point's 3×3 cell neighborhood provably contains every
    // candidate — so the join is a (cx, cy) equi-join, never a
    // product. Squared distances are exact int64 (both point lattices
    // sit on half-integer coords, so the deltas are integers), ranking
    // ties on supplier key, and the DuckDB oracle computes the FULL
    // pairwise nearest — equality proves the blocking loses nothing.
    "q_geo_nearest" -> ((s, dir) => {
      val cell = 8000.0
      val r2 = 64000000L // R = 8000 m = cell size
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_custkey") % 20 === 0)
        .select(col("c_custkey"),
          (lit(1600000.0) + (col("c_custkey") * 37 % 250000).cast("double") + 0.5).as("px"),
          (lit(5000000.0) + (col("c_custkey") * 53 % 180000).cast("double") + 0.5).as("py"))
      val supp = s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"),
          (lit(1600000.0) + (col("s_suppkey") * 41 % 250000).cast("double") + 0.5).as("sx"),
          (lit(5000000.0) + (col("s_suppkey") * 59 % 180000).cast("double") + 0.5).as("sy"))
        .withColumn("cx", floor(col("sx") / cell).cast("bigint"))
        .withColumn("cy", floor(col("sy") / cell).cast("bigint"))
      val probes = cust
        .withColumn("dx", explode(expr("sequence(-1, 1)")))
        .withColumn("dy", explode(expr("sequence(-1, 1)")))
        .withColumn("cx", (floor(col("px") / cell) + col("dx")).cast("bigint"))
        .withColumn("cy", (floor(col("py") / cell) + col("dy")).cast("bigint"))
      val cand = probes.join(supp, Seq("cx", "cy"))
        .withColumn("d2", expr(
          "CAST(px - sx AS BIGINT) * CAST(px - sx AS BIGINT) + " +
            "CAST(py - sy AS BIGINT) * CAST(py - sy AS BIGINT)"))
        .filter(col("d2") <= r2)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_custkey")).orderBy(col("d2"), col("s_suppkey"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_custkey"), col("s_suppkey"), col("d2"))
        .orderBy("c_custkey")
    }),

    "q_geo_measures" -> ((s, dir) => {
      val measures = udf { (wkt: String) =>
        val g = graft.geo.Jts.parseWkt(wkt)
        val c = g.getCentroid
        (g.getArea, g.getLength, c.getX, c.getY)
      }
      nationTriangles(s, dir)
        .withColumn("m", measures(col("wkt")))
        .select(col("n_nationkey"),
          round(col("m._1"), 2).as("area"),
          round(col("m._2"), 4).as("perimeter"),
          round(col("m._3"), 4).as("centroid_x"),
          round(col("m._4"), 4).as("centroid_y"))
        .orderBy("n_nationkey")
    }),

    // Z-order (Morton) spatial partition key: interleave the bits of
    // the 10-bit grid coordinates via the classic shift-mask spreading
    // (5 codegen'd integer ops per axis, no UDF, no loop). zcell
    // (a prefix of the curve) is the partition/sort key that keeps
    // spatially-near points in the same partition — the layout key
    // you'd repartitionByRange + sortWithinPartitions on before
    // writing 100 TB of points, so bbox queries prune file ranges.
    // Z-order RANGE QUERY — the consumer that makes q_zorder_key's
    // curve key an INDEX: a bbox query against a zkey-SORTED persisted
    // layout, pruned by a driver-side z-interval decomposition
    // (graft.geo.ZCurve: block-granular overapproximate cover, merged
    // intervals — a bounded artifact like the ANN codebooks), with the
    // exact gx/gy predicate re-applied post-scan. The interval
    // BETWEENs push to parquet (pinned), and because the layout is
    // range-sorted by zkey, row-group min/max stats skip everything
    // outside the ~25 block intervals — the two-phase shape every
    // curve-indexed store (lakehouse Z-ORDER clustering) runs at
    // 100 TB. Oracle = the direct bbox filter (the q_dedup_bloom
    // precedent: the index changes the plan, not the answer).
    "q_zrange_search" -> ((s, dir) => {
      def spread(c: Column): Column = {
        val a = c.bitwiseAND(lit(65535L))
        val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(16711935L))
        val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(252645135L))
        val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(858993459L))
        e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(1431655765L))
      }
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_zidx_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      SideStores.ensure(out) {
        s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey"),
            (col("c_custkey") * 37 % 1024).as("gx"),
            (col("c_custkey") * 53 % 1024).as("gy"))
          .withColumn("zkey", spread(col("gx"))
            .bitwiseOR(shiftleft(spread(col("gy")), 1)))
          .repartitionByRange(8, col("zkey"))
          .sortWithinPartitions("zkey")
          .write.mode("overwrite").parquet(out)
      }
      val (x0, x1, y0, y1) = (100L, 199L, 300L, 399L)
      val ranges = graft.geo.ZCurve.ranges(x0, x1, y0, y1,
        bits = 10, blockBits = 5)
      val zpred = ranges.map { case (lo, hi) =>
        col("zkey").between(lo, hi) }.reduce(_ || _)
      s.read.schema("c_custkey BIGINT, gx BIGINT, gy BIGINT, zkey BIGINT")
        .parquet(out)
        .filter(zpred) // coarse: pushed + row-group-skipped
        .filter(col("gx").between(x0, x1) && col("gy").between(y0, y1))
        .agg(count(lit(1)).as("n_points"),
          min(col("c_custkey")).as("min_key"),
          max(col("c_custkey")).as("max_key"),
          sum(col("c_custkey")).as("key_sum"))
    }),

    "q_zorder_key" -> ((s, dir) => {
      def spread(c: Column): Column = {
        val a = c.bitwiseAND(lit(65535L))
        val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(16711935L))
        val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(252645135L))
        val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(858993459L))
        e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(1431655765L))
      }
      s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"),
          (col("c_custkey") * 37 % 1024).as("gx"),
          (col("c_custkey") * 53 % 1024).as("gy"))
        .withColumn("zkey", spread(col("gx"))
          .bitwiseOR(shiftleft(spread(col("gy")), 1)))
        .withColumn("zcell", shiftright(col("zkey"), 10))
        .orderBy("c_custkey")
    }),
  )

  // Envelope corner ring order follows JTS GeometryFactory.toGeometry:
  // (minX,minY) → (minX,maxY) → (maxX,maxY) → (maxX,minY) → close.
  private val geojsonSql =
    """'{"type": "Polygon", "coordinates": [[' ||
      |  '[' || CAST(CAST(x0 AS DECIMAL(12,1)) AS VARCHAR) || ', ' || CAST(CAST(y0 AS DECIMAL(12,1)) AS VARCHAR) || '], ' ||
      |  '[' || CAST(CAST(x0 AS DECIMAL(12,1)) AS VARCHAR) || ', ' || CAST(CAST(y0 + h AS DECIMAL(12,1)) AS VARCHAR) || '], ' ||
      |  '[' || CAST(CAST(x0 + w AS DECIMAL(12,1)) AS VARCHAR) || ', ' || CAST(CAST(y0 + h AS DECIMAL(12,1)) AS VARCHAR) || '], ' ||
      |  '[' || CAST(CAST(x0 + w AS DECIMAL(12,1)) AS VARCHAR) || ', ' || CAST(CAST(y0 AS DECIMAL(12,1)) AS VARCHAR) || '], ' ||
      |  '[' || CAST(CAST(x0 AS DECIMAL(12,1)) AS VARCHAR) || ', ' || CAST(CAST(y0 AS DECIMAL(12,1)) AS VARCHAR) || ']' ||
      |  ']]}'""".stripMargin

  private val triCte =
    """tri AS (
      |  SELECT n_nationkey, n_name,
      |         1600000.0 + 9000.0 * n_nationkey AS x0,
      |         5000000.0 + 7000.0 * n_nationkey AS y0,
      |         3000.0 + 500.0 * n_nationkey AS w,
      |         2000.0 + 400.0 * n_nationkey AS h
      |  FROM nation
      |)""".stripMargin

  /** DuckDB oracle for the inverse Krüger transform: the same series as
    * graft.geo.Transform.inverse, operation for operation, with every
    * derived constant computed HERE by the identical Scala arithmetic
    * and inlined as a shortest-repr double literal (round-trips to the
    * same IEEE double in DuckDB's parser). DuckDB has no sinh/cosh/
    * atanh — inlined exp/ln forms differ from java.lang.Math by ≤ a few
    * ulp, noise at the 1e-6-degree output rounding. Newton's 7
    * iterations unroll into chained CTEs.
    */
  private val reprojectOracle: String = {
    val ff = 1.0 / 298.257222101
    val k0 = 0.9996
    val e2v = ff * (2 - ff)
    val e1v = math.sqrt(e2v)
    val nn = ff / (2 - ff)
    val n2 = nn * nn; val n3 = n2 * nn; val n4 = n3 * nn
    val n5 = n4 * nn; val n6 = n5 * nn
    val bigA = 6378137.0 / (1 + nn) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    val beta = Array(
      nn / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
      1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
      17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
      4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
      4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
      20648693.0 / 638668800 * n6)
    val k0A = k0 * bigA
    val lam0 = math.toRadians(173.0)
    val pi = math.Pi

    def lit(d: Double): String = {
      val s = d.toString
      if (s.contains('.') || s.contains('E') || s.contains('e')) s else s + ".0"
    }
    def sinhS(x: String) = s"((exp($x) - exp(-($x))) / 2)"
    def coshS(x: String) = s"((exp($x) + exp(-($x))) / 2)"
    def atanhS(x: String) = s"(0.5 * ln((1 + $x) / (1 - $x)))"

    val xipTerms = (1 to 6).map(j =>
      s" - (${lit(beta(j - 1))} * sin(${2 * j} * xi) * ${coshS(s"${2 * j} * eta")})").mkString
    val etapTerms = (1 to 6).map(j =>
      s" - (${lit(beta(j - 1))} * cos(${2 * j} * xi) * ${sinhS(s"${2 * j} * eta")})").mkString

    val iters = (1 to 7).map { i =>
      val p = s"tau${i - 1}"
      val sg = sinhS(s"${lit(e1v)} * ${atanhS(s"${lit(e1v)} * $p / sqrt(1 + $p * $p)")}")
      s"""it$i AS (
         |  SELECT n_nationkey, corner, sinh_etap, cos_xip, taup,
         |         $p + (taup - tp$i) * (1 + ${lit(1 - e2v)} * $p * $p) /
         |           (${lit(1 - e2v)} * sqrt(1 + $p * $p) * sqrt(1 + tp$i * tp$i)) AS tau$i
         |  FROM (
         |    SELECT n_nationkey, corner, sinh_etap, cos_xip, taup, $p,
         |           $p * sqrt(1 + sg$i * sg$i) - sg$i * sqrt(1 + $p * $p) AS tp$i
         |    FROM (SELECT *, $sg AS sg$i FROM it${i - 1})
         |  )
         |)""".stripMargin
    }.mkString(",\n")

    s"""WITH $triCte,
       |corners AS (
       |  SELECT n_nationkey, 0 AS corner, x0 AS e_m, y0 AS n_m FROM tri
       |  UNION ALL
       |  SELECT n_nationkey, 1, x0 + w, y0 + h FROM tri
       |),
       |k1 AS (
       |  SELECT n_nationkey, corner,
       |         (n_m - 10000000.0) / ${lit(k0A)} AS xi,
       |         (e_m - 1600000.0) / ${lit(k0A)} AS eta
       |  FROM corners
       |),
       |k2 AS (
       |  SELECT n_nationkey, corner,
       |         xi$xipTerms AS xip,
       |         eta$etapTerms AS etap
       |  FROM k1
       |),
       |k3 AS (
       |  SELECT n_nationkey, corner,
       |         ${sinhS("etap")} AS sinh_etap, cos(xip) AS cos_xip, sin(xip) AS sin_xip
       |  FROM k2
       |),
       |it0 AS (
       |  SELECT n_nationkey, corner, sinh_etap, cos_xip, taup,
       |         taup / ${lit(1 - e2v)} AS tau0
       |  FROM (SELECT *, sin_xip / sqrt(sinh_etap * sinh_etap + cos_xip * cos_xip) AS taup FROM k3)
       |),
       |$iters,
       |latlon AS (
       |  SELECT n_nationkey, corner,
       |         atan(tau7) * 180.0 / ${lit(pi)} AS lat,
       |         (${lit(lam0)} + atan2(sinh_etap, cos_xip)) * 180.0 / ${lit(pi)} AS lon
       |  FROM it7
       |)
       |SELECT n_nationkey,
       |       round(min(CASE WHEN corner = 0 THEN lat END), 6) AS lat_min,
       |       round(min(CASE WHEN corner = 0 THEN lon END), 6) AS lon_min,
       |       round(min(CASE WHEN corner = 1 THEN lat END), 6) AS lat_max,
       |       round(min(CASE WHEN corner = 1 THEN lon END), 6) AS lon_max
       |FROM latlon GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    // full pairwise nearest (no blocking) — equality with the Spark
    // plan's 3x3-cell candidate set proves the bound is lossless
    "q_geo_nearest" ->
      """WITH cust AS (
        |  SELECT c_custkey,
        |         1600000 + (c_custkey * 37 % 250000) + 0.5 AS px,
        |         5000000 + (c_custkey * 53 % 180000) + 0.5 AS py
        |  FROM customer WHERE c_custkey % 20 = 0
        |),
        |supp AS (
        |  SELECT s_suppkey,
        |         1600000 + (s_suppkey * 41 % 250000) + 0.5 AS sx,
        |         5000000 + (s_suppkey * 59 % 180000) + 0.5 AS sy
        |  FROM supplier
        |),
        |cand AS (
        |  SELECT c.c_custkey, s.s_suppkey,
        |         CAST(c.px - s.sx AS BIGINT) * CAST(c.px - s.sx AS BIGINT)
        |       + CAST(c.py - s.sy AS BIGINT) * CAST(c.py - s.sy AS BIGINT) AS d2
        |  FROM cust c, supp s
        |),
        |ranked AS (
        |  SELECT c_custkey, s_suppkey, d2,
        |         row_number() OVER (PARTITION BY c_custkey
        |                            ORDER BY d2, s_suppkey) AS rn
        |  FROM cand WHERE d2 <= 64000000
        |)
        |SELECT c_custkey, s_suppkey, d2 FROM ranked WHERE rn = 1
        |ORDER BY c_custkey""".stripMargin,
    "q_reproject_4326" -> reprojectOracle,
    "q_extent_envelope" ->
      s"""WITH $triCte
         |SELECT n_nationkey, n_name, x0 AS xmin, y0 AS ymin,
         |       x0 + w AS xmax, y0 + h AS ymax
         |FROM tri ORDER BY n_nationkey""".stripMargin,

    "q_geojson_polygon" ->
      s"""WITH $triCte
         |SELECT n_nationkey, $geojsonSql AS geojson
         |FROM tri ORDER BY n_nationkey""".stripMargin,

    "q_spatial_join" ->
      s"""WITH $triCte,
         |pts AS (
         |  SELECT c_custkey,
         |         1600000.0 + (c_custkey * 37 % 250000) + 0.5 AS px,
         |         5000000.0 + (c_custkey * 53 % 180000) + 0.5 AS py
         |  FROM customer
         |)
         |SELECT p.c_custkey, t.n_nationkey, p.px, p.py
         |FROM pts p CROSS JOIN tri t
         |WHERE -- strict point-in-triangle via half-plane sign tests
         |      -- vertices: A=(x0,y0) B=(x0+w, y0+h/2) C=(x0+1000+100*n_nationkey, y0+h)
         |      ((t.x0 + t.w - t.x0) * (p.py - t.y0) - (t.y0 + t.h/2 - t.y0) * (p.px - t.x0)) > 0
         |  AND ((t.x0 + 1000 + 100*t.n_nationkey - (t.x0 + t.w)) * (p.py - (t.y0 + t.h/2))
         |       - (t.y0 + t.h - (t.y0 + t.h/2)) * (p.px - (t.x0 + t.w))) > 0
         |  AND ((t.x0 - (t.x0 + 1000 + 100*t.n_nationkey)) * (p.py - (t.y0 + t.h))
         |       - (t.y0 - (t.y0 + t.h)) * (p.px - (t.x0 + 1000 + 100*t.n_nationkey))) > 0
         |ORDER BY p.c_custkey, t.n_nationkey""".stripMargin,

    // identical RESULT to q_spatial_join — the grid keying is a pure
    // execution-strategy change, which is exactly the point
    "q_spatial_join_grid" ->
      s"""WITH $triCte,
         |pts AS (
         |  SELECT c_custkey,
         |         1600000.0 + (c_custkey * 37 % 250000) + 0.5 AS px,
         |         5000000.0 + (c_custkey * 53 % 180000) + 0.5 AS py
         |  FROM customer
         |)
         |SELECT p.c_custkey, t.n_nationkey, p.px, p.py
         |FROM pts p CROSS JOIN tri t
         |WHERE ((t.x0 + t.w - t.x0) * (p.py - t.y0) - (t.y0 + t.h/2 - t.y0) * (p.px - t.x0)) > 0
         |  AND ((t.x0 + 1000 + 100*t.n_nationkey - (t.x0 + t.w)) * (p.py - (t.y0 + t.h/2))
         |       - (t.y0 + t.h - (t.y0 + t.h/2)) * (p.px - (t.x0 + t.w))) > 0
         |  AND ((t.x0 - (t.x0 + 1000 + 100*t.n_nationkey)) * (p.py - (t.y0 + t.h))
         |       - (t.y0 - (t.y0 + t.h)) * (p.px - (t.x0 + 1000 + 100*t.n_nationkey))) > 0
         |ORDER BY p.c_custkey, t.n_nationkey""".stripMargin,

    // closed forms for triangle A=(x0,y0) B=(x0+w,y0+h/2)
    // C=(x0+apex,y0+h): area = (w·h − (h/2)·apex)/2 (shoelace, exact
    // integer arithmetic in both engines); perimeter sums the segment
    // sqrts in ring order (sqrt is correctly rounded IEEE → bit-equal);
    // centroid = vertex mean
    "q_geo_measures" ->
      s"""WITH $triCte
         |SELECT n_nationkey,
         |       round((w * h - (h / 2) * (1000.0 + 100.0 * n_nationkey)) / 2, 2) AS area,
         |       round(sqrt(w * w + (h / 2) * (h / 2))
         |             + sqrt(((1000.0 + 100.0 * n_nationkey) - w) * ((1000.0 + 100.0 * n_nationkey) - w)
         |                    + (h / 2) * (h / 2))
         |             + sqrt((1000.0 + 100.0 * n_nationkey) * (1000.0 + 100.0 * n_nationkey) + h * h), 4)
         |         AS perimeter,
         |       round(x0 + (w + 1000.0 + 100.0 * n_nationkey) / 3, 4) AS centroid_x,
         |       round(y0 + h / 2, 4) AS centroid_y
         |FROM tri ORDER BY n_nationkey""".stripMargin,

    // the oracle answers the bbox question directly — the z-interval
    // pruning must not change the result
    "q_zrange_search" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |         (c_custkey * 37) % 1024 AS gx, (c_custkey * 53) % 1024 AS gy
        |  FROM customer
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_points,
        |       min(c_custkey) AS min_key,
        |       max(c_custkey) AS max_key,
        |       CAST(sum(c_custkey) AS BIGINT) AS key_sum
        |FROM pts
        |WHERE gx BETWEEN 100 AND 199 AND gy BETWEEN 300 AND 399""".stripMargin,

    "q_zorder_key" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |         (c_custkey * 37) % 1024 AS gx, (c_custkey * 53) % 1024 AS gy
        |  FROM customer WHERE c_custkey % 10 = 0
        |),
        |s1 AS (
        |  SELECT *, ((gx | (gx << 8)) & 16711935) AS ax,
        |            ((gy | (gy << 8)) & 16711935) AS ay FROM pts
        |),
        |s2 AS (
        |  SELECT *, ((ax | (ax << 4)) & 252645135) AS bx,
        |            ((ay | (ay << 4)) & 252645135) AS by_ FROM s1
        |),
        |s3 AS (
        |  SELECT *, ((bx | (bx << 2)) & 858993459) AS cx,
        |            ((by_ | (by_ << 2)) & 858993459) AS cy FROM s2
        |),
        |s4 AS (
        |  SELECT *, ((cx | (cx << 1)) & 1431655765) AS dx,
        |            ((cy | (cy << 1)) & 1431655765) AS dy FROM s3
        |)
        |SELECT c_custkey, gx, gy,
        |       (dx | (dy << 1)) AS zkey,
        |       ((dx | (dy << 1)) >> 10) AS zcell
        |FROM s4 ORDER BY c_custkey""".stripMargin,
  )
}
