package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.Jts
import graft.raster.{AsciiGrid, GeoTiff, GridGen, RasterOps}

/** Raster kernel queries (OP-SP-2/3, AGG-2): ASCII-grid parsing, per-
  * grid statistics, and polygon clip-mask — the reference's
  * CopyRaster/Clip pipeline re-expressed as typed columnar operators.
  *
  * Each query *parses grid text inside the plan* (GridGen.genText →
  * AsciiGrid.parse in a UDF), exactly the shape a
  * `spark.read.format("binaryFile")` source produces at scale: one
  * row per raster, pixel work distributed per-file, no driver-side
  * loops. The clip is one task per (grid × region) pair — the
  * embarrassing parallelism the reference runs serially
  * (BASELINE.md: 4 352 serial clip tasks).
  */
object RasterQueries {

  private val statsUdf = udf { (text: String) =>
    val s = RasterOps.stats(AsciiGrid.parse(text))
    (s.nValid, s.nNodata, s.min, s.max, s.mean, s.stddev, s.sum)
  }

  private val clipStatsUdf = udf { (text: String, wkt: String) =>
    val clipped = RasterOps.clip(AsciiGrid.parse(text), Jts.parseWkt(wkt))
    val s = RasterOps.stats(clipped)
    (clipped.ncols, clipped.nrows, s.nValid, s.nNodata, s.sum)
  }

  private val genTextUdf = udf { (k: Int) => GridGen.genText(k) }

  /** nation + grid text + clip triangle WKT (same triangles as
    * GeoQueries, same anchor as the grid).
    */
  private def gridsWithRegions(s: SparkSession, dir: String): DataFrame = {
    val k = col("n_nationkey").cast("double")
    s.read.parquet(s"$dir/nation.parquet")
      .withColumn("grid_text", genTextUdf(col("n_nationkey")))
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

  /** Shared stencil base for the focal map-algebra queries (slope,
    * flow direction): every non-nodata cell of every grid keyed
    * (n_nationkey, r, c). Cached — the neighbor shifts re-scan it up
    * to 8 times, and each shift is a narrow projection of this frame.
    */
  private def stencilCells(s: SparkSession, dir: String): DataFrame = {
    val parseRC = udf { (text: String) =>
      val g = AsciiGrid.parse(text)
      (0 until g.nrows * g.ncols).map { i =>
        (i, i / g.ncols, i % g.ncols, g.value(i / g.ncols, i % g.ncols))
      }
    }
    QueryCaches.cache(gridsWithRegions(s, dir)
      .withColumn("cell", explode(parseRC(col("grid_text"))))
      .select(col("n_nationkey"), col("cell._1").cast("bigint").as("cell_idx"),
        col("cell._2").cast("bigint").as("r"), col("cell._3").cast("bigint").as("c"),
        col("cell._4").as("value"))
      .filter(col("value") =!= GridGen.Nodata))
  }

  /** D8 neighbor table shared by the flow-direction query and its
    * oracle: code k -> (dr, dc) with the row index growing SOUTHWARD
    * (row 0 is the grid's top edge), so 1=E 2=SE 3=S 4=SW 5=W 6=NW
    * 7=N 8=NE.
    */
  private val d8: Seq[(Int, (Int, Int))] = Seq(
    1 -> ((0, 1)), 2 -> ((1, 1)), 3 -> ((1, 0)), 4 -> ((1, -1)),
    5 -> ((0, -1)), 6 -> ((-1, -1)), 7 -> ((-1, 0)), 8 -> ((-1, 1)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // AGG-2: per-raster statistics (parse → single-pass stats).
    "q_raster_stats" -> ((s, dir) =>
      gridsWithRegions(s, dir)
        .withColumn("st", statsUdf(col("grid_text")))
        .select(col("n_nationkey"),
          col("st._1").as("n_valid"), col("st._2").as("n_nodata"),
          col("st._3").as("vmin"), col("st._4").as("vmax"),
          round(col("st._5"), 4).as("vmean"),
          round(col("st._6"), 4).as("vstddev"),
          round(col("st._7"), 2).as("vsum"))
        .orderBy("n_nationkey")),

    // OP-SP-3: clip grid by triangle — crop to envelope, NODATA-mask
    // cells whose center is outside the polygon interior.
    "q_clip_raster" -> ((s, dir) =>
      gridsWithRegions(s, dir)
        .withColumn("cl", clipStatsUdf(col("grid_text"), col("wkt")))
        .select(col("n_nationkey"),
          col("cl._1").cast("bigint").as("ncols_out"),
          col("cl._2").cast("bigint").as("nrows_out"),
          col("cl._3").as("n_valid"), col("cl._4").as("n_nodata"),
          round(col("cl._5"), 2).as("sum_valid"))
        .orderBy("n_nationkey")),

    // Pyramid building: 2×2 block downsample (mean of valid cells,
    // NODATA-aware) — the overview-level generation step every tiled
    // raster store runs. One task per raster; block means of ≤4
    // integer-valued cells are exact rationals, so the oracle's
    // AVG FILTER reproduces them bit-for-bit.
    "q_raster_downsample" -> ((s, dir) => {
      val downUdf = udf { (text: String) =>
        val g = AsciiGrid.parse(text)
        val bc = (g.ncols + 1) / 2
        val br = (g.nrows + 1) / 2
        (0 until br * bc).map { bi =>
          val r0 = (bi / bc) * 2; val c0 = (bi % bc) * 2
          var sum = 0.0; var n = 0L
          var r = r0
          while (r < math.min(r0 + 2, g.nrows)) {
            var c = c0
            while (c < math.min(c0 + 2, g.ncols)) {
              val v = g.value(r, c)
              if (v != g.nodata) { sum += v; n += 1 }
              c += 1
            }
            r += 1
          }
          (bi, n, if (n == 0) None else Some(sum / n))
        }
      }
      gridsWithRegions(s, dir)
        .withColumn("blk", explode(downUdf(col("grid_text"))))
        .select(col("n_nationkey"), col("blk._1").cast("bigint").as("block_idx"),
          col("blk._2").as("n_valid"), round(col("blk._3"), 4).as("block_mean"))
        .orderBy("n_nationkey", "block_idx")
    }),

    // Cells as a relation: parse → posexplode → per-cell coordinates.
    // The exploded form is what a grid-partitioned 100 TB spatial join
    // keys on (cell → partition), so it's a first-class query.
    "q_grid_cells" -> ((s, dir) => {
      val parseCells = udf { (text: String) =>
        val g = AsciiGrid.parse(text)
        (0 until g.nrows * g.ncols).map { i =>
          val r = i / g.ncols; val c = i % g.ncols
          (i, g.centerX(c), g.centerY(r), g.value(r, c))
        }
      }
      gridsWithRegions(s, dir)
        .withColumn("cell", explode(parseCells(col("grid_text"))))
        .select(col("n_nationkey"), col("cell._1").cast("bigint").as("cell_idx"),
          col("cell._2").as("cx"), col("cell._3").as("cy"),
          col("cell._4").as("value"))
        .filter(col("value") =!= GridGen.Nodata)
        .orderBy("n_nationkey", "cell_idx")
    }),

    // ZONAL statistics — reclassify + per-zone aggregate, the
    // ZonalStatistics half of the reference's toolbox family (the
    // other half, per-raster stats, is AGG-2 above): each valid cell
    // maps to an elevation band (value div 100 — the reclassification)
    // and every band reduces to count/min/max/sum. All integer-exact
    // (cell values are integer-valued doubles by construction). Scale
    // shape: zone assignment is a projection on the cell stream, the
    // aggregate is ONE hash aggregate keyed (raster, zone) with
    // map-side combine — at 100 TB no join and a single exchange of
    // O(rasters × bands) rows, regardless of pixel count.
    // zone id via SHIFTED truncating division: Spark `div` truncates
    // toward zero while the oracle's `//` floors — equal only on
    // non-negative operands, which cell values are today by GridGen
    // construction. The +10⁶ shift (subtracted back) makes both sides
    // compute the mathematical floor for any value ≥ −10⁶, so a future
    // fixture with negative elevations cannot diverge (same discipline
    // as the PQ pack's pqShiftedQv). Oracle applies the identical
    // shift; results are bit-unchanged for current data.
    "q_zonal_stats" -> ((s, dir) =>
      stencilCells(s, dir)
        .withColumn("zone",
          expr("(CAST(value AS BIGINT) + 1000000L) div 100 - 10000L"))
        .groupBy("n_nationkey", "zone")
        .agg(count(lit(1)).as("n_cells"),
          min(expr("CAST(value AS BIGINT)")).as("vmin"),
          max(expr("CAST(value AS BIGINT)")).as("vmax"),
          sum(expr("CAST(value AS BIGINT)")).as("vsum"))
        .orderBy("n_nationkey", "zone")),

    // FOCAL map algebra — slope/gradient by central differences, the
    // neighborhood-stencil operator every DEM pipeline runs after the
    // ETL this library reproduces. Relationally a stencil IS a set of
    // equi-joins: each interior cell meets its E/W/N/S neighbors on
    // (grid, row, col±1)/(row±1, col), so the shuffle keys on the grid
    // id and a 100 TB raster lake runs it tile-parallel with no
    // cross-grid traffic (halo exchange only at tile borders — here
    // whole grids are single rows, so there is none). Gradients stay
    // in exact integer-valued doubles (cell values are integers by
    // construction; differences and squares stay exact), so the gate
    // needs no rounding guard. Cells with any missing or nodata
    // neighbor are excluded — the standard edge contract.
    "q_raster_slope" -> ((s, dir) => {
      val cells = stencilCells(s, dir)
      def nbr(alias: String, dr: Int, dc: Int) = cells
        .select(col("n_nationkey"), (col("r") + dr).as("r"), (col("c") + dc).as("c"),
          col("value").as(alias))
      cells
        .join(nbr("ze", 0, -1), Seq("n_nationkey", "r", "c"))
        .join(nbr("zw", 0, 1), Seq("n_nationkey", "r", "c"))
        .join(nbr("zn", 1, 0), Seq("n_nationkey", "r", "c"))
        .join(nbr("zs", -1, 0), Seq("n_nationkey", "r", "c"))
        .select(col("n_nationkey"), col("cell_idx"),
          (col("ze") - col("zw")).cast("bigint").as("dzdx"),
          (col("zn") - col("zs")).cast("bigint").as("dzdy"))
        .withColumn("grad2",
          col("dzdx") * col("dzdx") + col("dzdy") * col("dzdy"))
        .orderBy("n_nationkey", "cell_idx")
    }),

    // D8 flow direction — hydrology's steepest-descent operator, the
    // second focal map-algebra kernel after slope. Per cell, the flow
    // goes to whichever of the 8 neighbors maximizes drop/distance;
    // with distances only 1 and sqrt(2), comparing 2*drop^2 (cardinal)
    // vs drop^2 (diagonal) over POSITIVE drops is the exact integer
    // equivalent, so the whole selection is int64 arithmetic. The
    // argmax packs score*16 + (8-k) into one bigint so a single
    // greatest() resolves both the max score and the smallest-code
    // tie-break; cells with no downhill neighbor (pits, flats, nodata-
    // ringed) emit direction 0. Scale shape: same as slope — 8 equi-
    // joins keyed (grid, row, col), tile-parallel, no products; at
    // 100 TB of tiles each join co-partitions on the grid key and the
    // stencil never leaves the executor holding the tile.
    "q_flow_direction" -> ((s, dir) => {
      val cells = stencilCells(s, dir)
      val joined = d8.foldLeft(cells) { case (df, (k, (dr, dc))) =>
        df.join(cells.select(col("n_nationkey"),
            (col("r") - dr).as("r"), (col("c") - dc).as("c"),
            col("value").cast("bigint").as(s"v$k")),
          Seq("n_nationkey", "r", "c"), "left")
      }
      val packed = d8.map { case (k, (dr, dc)) =>
        val mult = if (dr == 0 || dc == 0) 2L else 1L
        expr(s"CASE WHEN v$k IS NOT NULL AND CAST(value AS BIGINT) - v$k > 0 " +
          s"THEN (CAST(value AS BIGINT) - v$k) * (CAST(value AS BIGINT) - v$k)" +
          s" * $mult * 16 + ${8 - k} ELSE -1 END")
      }
      joined.withColumn("best", greatest(packed: _*))
        .select(col("n_nationkey"), col("cell_idx"),
          expr("CASE WHEN best < 0 THEN 0 ELSE 8 - best % 16 END")
            .as("flow_dir"),
          expr("CASE WHEN best < 0 THEN 0 ELSE best div 16 END")
            .as("drop2x"))
        .orderBy("n_nationkey", "cell_idx")
    }),

    // SNK-1 catalog gate: encode every grid with the pure-JVM COG
    // writer, decode it back with the independent IFD-chain-walking
    // reader, and gate the EMITTED BYTES arithmetically — the oracle
    // computes the writer's closed-form layout length (header + main
    // IFD + overview IFDs + geo tags + tile arrays + Σ ntiles·tile
    // bytes, with the 2× pyramid reproduced by a recursive CTE), the
    // full-res pixel sum (padding writes 0.0f, so it equals the plain
    // cell-value sum; GridGen values are integers, exact in float32),
    // AND the overview pixel sum: each overview pixel is the NODATA-
    // aware 2×2 block mean cast to float32 (q_raster_downsample's
    // math), which the oracle reproduces with AVG FILTER + CAST AS
    // REAL — block means of ≤4 integer cells round identically in
    // both engines, and a sum of ≤35 float32 values is exact in
    // double, so the DOUBLE column hash-matches bit-for-bit. A writer
    // layout bug, tile-addressing bug, broken overview chain, or
    // georeferencing drop shows up as a hash mismatch here, not just
    // in the JVM spec. One task per raster, no shuffle — at 100 TB
    // this is the same embarrassingly-parallel per-file shape as the
    // reference's CopyRaster loop (ETL.py:259).
    "q_geotiff_catalog" -> ((s, dir) => {
      val metaUdf = udf { (k: Int) =>
        val bytes = GeoTiff.write(GridGen.gen(k))
        val p = GeoTiff.read(bytes)
        (bytes.length.toLong, p.nTiles.toLong, p.grid.ncols.toLong,
          p.grid.nrows.toLong, p.srid.toLong, p.grid.values.sum.toLong,
          p.nIfds.toLong, p.overviews.map(_.values.sum).sum)
      }
      s.read.parquet(s"$dir/nation.parquet")
        .withColumn("m", metaUdf(col("n_nationkey")))
        .select(col("n_nationkey"),
          col("m._1").as("n_bytes"), col("m._2").as("n_tiles"),
          col("m._3").as("width"), col("m._4").as("height"),
          col("m._5").as("srid"), col("m._6").as("px_sum"),
          col("m._7").as("n_ifds"), col("m._8").as("ov_px_sum"))
        .orderBy("n_nationkey")
    }),
  )

  /** Shared pyramid-layout CTE fragment (lvls → lmeta → layout): the
    * COG writer's 2× halve-ceiling overview chain and per-level tile
    * counts, parameterized on the dims CTE name (must expose
    * n_nationkey, nc, nr). ONE source of truth for both byte-length
    * oracles (q_geotiff_catalog here, q_stream_cog_convert in
    * EtlQueries) — a writer-layout change edits GeoTiff.scala plus
    * exactly this fragment. Compose under WITH RECURSIVE.
    */
  private[queries] def pyramidCtes(dimsCte: String): String =
    s"""lvls AS (
       |  SELECT n_nationkey, 0 AS lvl, nc AS w, nr AS h FROM $dimsCte
       |  UNION ALL
       |  SELECT n_nationkey, lvl + 1, (w + 1) // 2, (h + 1) // 2
       |  FROM lvls WHERE w > 8 OR h > 8
       |),
       |lmeta AS (
       |  SELECT n_nationkey, lvl,
       |         ((w + 7) // 8) * ((h + 7) // 8) AS nt
       |  FROM lvls
       |),
       |layout AS (
       |  SELECT n_nationkey,
       |         count(*) AS n_levels,
       |         sum(nt) AS nt_all,
       |         sum(CASE WHEN nt > 1 THEN 8 * nt ELSE 0 END) AS arr_bytes,
       |         max(CASE WHEN lvl = 0 THEN nt END) AS nt0
       |  FROM lmeta GROUP BY 1
       |)""".stripMargin

  /** The closed-form whole-file byte length over a `layout` row aliased
    * `l` — header 8 + main IFD 186 + 150 per overview IFD + 110 geo
    * externals + offset/count arrays + 256 bytes per 8×8 float32 tile.
    */
  private[queries] val pyramidBytesSql: String =
    "8 + 186 + (l.n_levels - 1) * 150 + 110 + l.arr_bytes + 256 * l.nt_all"

  /** Shared oracle CTE: the same cells by pure arithmetic. */
  private val cellsCte =
    """dims AS (
      |  SELECT n_nationkey,
      |         8 + n_nationkey % 5 AS nc,
      |         6 + n_nationkey % 4 AS nr,
      |         1600000.0 + 9000.0 * n_nationkey AS xll,
      |         5000000.0 + 7000.0 * n_nationkey AS yll,
      |         3000.0 + 500.0 * n_nationkey AS w,
      |         2000.0 + 400.0 * n_nationkey AS h,
      |         1000.0 + 100.0 * n_nationkey AS apex_off
      |  FROM nation
      |),
      |cells AS (
      |  SELECT n_nationkey, nc, nr, xll, yll, w, h, apex_off, i,
      |         xll + ((i % nc) + 0.5) * 500.0 AS cx,
      |         yll + (nr - (i // nc) - 0.5) * 500.0 AS cy,
      |         CASE WHEN (13 * i + 7 * n_nationkey) % 11 = 0 THEN -9999.0
      |              ELSE CAST((37 * i + 17 * n_nationkey) % 1000 AS DOUBLE) END AS value
      |  FROM (SELECT *, unnest(generate_series(0, nc * nr - 1)) AS i FROM dims)
      |)""".stripMargin

  // strict half-plane point-in-triangle (same triangle as GeoQueries):
  // A=(xll,yll) B=(xll+w, yll+h/2) C=(xll+apex_off, yll+h)
  private val inTriangle =
    """(  (w) * (cy - yll) - (h/2) * (cx - xll) > 0
      |  AND (apex_off - w) * (cy - (yll + h/2)) - (h/2) * (cx - (xll + w)) > 0
      |  AND (-apex_off) * (cy - (yll + h)) + h * (cx - (xll + apex_off)) > 0 )""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_raster_stats" ->
      s"""WITH $cellsCte
         |SELECT n_nationkey,
         |       count(*) FILTER (WHERE value <> -9999.0) AS n_valid,
         |       count(*) FILTER (WHERE value = -9999.0) AS n_nodata,
         |       min(value) FILTER (WHERE value <> -9999.0) AS vmin,
         |       max(value) FILTER (WHERE value <> -9999.0) AS vmax,
         |       round(avg(value) FILTER (WHERE value <> -9999.0), 4) AS vmean,
         |       round(stddev_samp(value) FILTER (WHERE value <> -9999.0), 4) AS vstddev,
         |       round(sum(value) FILTER (WHERE value <> -9999.0), 2) AS vsum
         |FROM cells GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin,

    "q_clip_raster" ->
      s"""WITH $cellsCte,
         |cropped AS (
         |  SELECT * FROM cells
         |  WHERE cx > xll AND cx < xll + w AND cy > yll AND cy < yll + h
         |)
         |SELECT n_nationkey,
         |       count(DISTINCT cx) AS ncols_out,
         |       count(DISTINCT cy) AS nrows_out,
         |       count(*) FILTER (WHERE value <> -9999.0 AND $inTriangle) AS n_valid,
         |       count(*) - count(*) FILTER (WHERE value <> -9999.0 AND $inTriangle) AS n_nodata,
         |       round(coalesce(sum(value) FILTER (WHERE value <> -9999.0 AND $inTriangle), 0.0), 2) AS sum_valid
         |FROM cropped GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin,

    "q_grid_cells" ->
      s"""WITH $cellsCte
         |SELECT n_nationkey, i AS cell_idx, cx, cy, value
         |FROM cells WHERE value <> -9999.0
         |ORDER BY n_nationkey, cell_idx""".stripMargin,

    "q_zonal_stats" ->
      s"""WITH $cellsCte
         |SELECT n_nationkey,
         |       CAST((CAST(value AS BIGINT) + 1000000) // 100 - 10000 AS BIGINT) AS zone,
         |       count(*) AS n_cells,
         |       CAST(min(CAST(value AS BIGINT)) AS BIGINT) AS vmin,
         |       CAST(max(CAST(value AS BIGINT)) AS BIGINT) AS vmax,
         |       CAST(sum(CAST(value AS BIGINT)) AS BIGINT) AS vsum
         |FROM cells WHERE value <> -9999.0
         |GROUP BY 1, 2 ORDER BY n_nationkey, zone""".stripMargin,

    // the COG writer's deterministic layout in SQL: a recursive CTE
    // rebuilds the 2× pyramid (halve-ceiling until the level fits one
    // 8×8 tile), then n_bytes = 8 header + 186 main IFD + 150 per
    // overview IFD + 110 geo/nodata externals + per-level offset/count
    // arrays (8·nt, only when nt > 1 overflows the inline slots) +
    // 256 bytes per tile across ALL levels. px_sum = plain full-res
    // cell sum (tile padding is written as 0.0f); ov_px_sum = the
    // level-1 overview's pixel sum, reproduced as the NODATA-aware 2×2
    // block mean cast to float32 (nodata blocks store -9999) — at
    // fixture sizes the pyramid never exceeds 2 levels (deeper
    // cascades are spec-tested JVM-side in GeoTiffSpec).
    "q_geotiff_catalog" ->
      s"""WITH RECURSIVE $cellsCte,
         |${pyramidCtes("dims")},
         |sums AS (
         |  SELECT n_nationkey, CAST(sum(value) AS BIGINT) AS px_sum
         |  FROM cells GROUP BY 1
         |),
         |blocks AS (
         |  SELECT n_nationkey,
         |         ((i // nc) // 2) * ((nc + 1) // 2) + (i % nc) // 2 AS block_idx,
         |         CAST(CAST(avg(value) FILTER (WHERE value <> -9999.0) AS REAL)
         |              AS DOUBLE) AS bm
         |  FROM cells GROUP BY 1, 2
         |),
         |ovsum AS (
         |  SELECT n_nationkey, sum(COALESCE(bm, -9999.0)) AS ov_sum
         |  FROM blocks GROUP BY 1
         |)
         |SELECT d.n_nationkey,
         |       CAST($pyramidBytesSql AS BIGINT) AS n_bytes,
         |       CAST(l.nt0 AS BIGINT) AS n_tiles,
         |       CAST(d.nc AS BIGINT) AS width,
         |       CAST(d.nr AS BIGINT) AS height,
         |       CAST(2193 AS BIGINT) AS srid,
         |       s.px_sum,
         |       CAST(l.n_levels AS BIGINT) AS n_ifds,
         |       CASE WHEN l.n_levels > 1 THEN o.ov_sum ELSE 0.0 END AS ov_px_sum
         |FROM dims d
         |JOIN layout l USING (n_nationkey)
         |JOIN sums s USING (n_nationkey)
         |JOIN ovsum o USING (n_nationkey)
         |ORDER BY d.n_nationkey""".stripMargin,

    "q_raster_slope" ->
      s"""WITH $cellsCte,
         |good AS (
         |  SELECT n_nationkey, i, i // nc AS r, i % nc AS c, value
         |  FROM cells WHERE value <> -9999.0
         |)
         |SELECT g.n_nationkey, g.i AS cell_idx,
         |       CAST(e.value - w.value AS BIGINT) AS dzdx,
         |       CAST(n.value - s.value AS BIGINT) AS dzdy,
         |       CAST((e.value - w.value) * (e.value - w.value)
         |          + (n.value - s.value) * (n.value - s.value) AS BIGINT) AS grad2
         |FROM good g
         |JOIN good e ON e.n_nationkey = g.n_nationkey AND e.r = g.r AND e.c = g.c + 1
         |JOIN good w ON w.n_nationkey = g.n_nationkey AND w.r = g.r AND w.c = g.c - 1
         |JOIN good n ON n.n_nationkey = g.n_nationkey AND n.c = g.c AND n.r = g.r - 1
         |JOIN good s ON s.n_nationkey = g.n_nationkey AND s.c = g.c AND s.r = g.r + 1
         |ORDER BY g.n_nationkey, cell_idx""".stripMargin,

    "q_raster_downsample" ->
      s"""WITH $cellsCte
         |SELECT n_nationkey,
         |       ((i // nc) // 2) * ((nc + 1) // 2) + (i % nc) // 2 AS block_idx,
         |       count(*) FILTER (WHERE value <> -9999.0) AS n_valid,
         |       round(avg(value) FILTER (WHERE value <> -9999.0), 4) AS block_mean
         |FROM cells
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_flow_direction" -> {
      val joins = d8.map { case (k, (dr, dc)) =>
        s"LEFT JOIN good n$k ON n$k.n_nationkey = g.n_nationkey " +
          s"AND n$k.r = g.r + ($dr) AND n$k.c = g.c + ($dc)"
      }.mkString("\n")
      val cases = d8.map { case (k, (dr, dc)) =>
        val mult = if (dr == 0 || dc == 0) 2 else 1
        s"CASE WHEN n$k.z IS NOT NULL AND g.z - n$k.z > 0 " +
          s"THEN (g.z - n$k.z) * (g.z - n$k.z) * $mult * 16 + ${8 - k} " +
          "ELSE -1 END"
      }.mkString(",\n")
      s"""WITH $cellsCte,
         |good AS (
         |  SELECT n_nationkey, i, i // nc AS r, i % nc AS c,
         |         CAST(value AS BIGINT) AS z
         |  FROM cells WHERE value <> -9999.0
         |),
         |best AS (
         |  SELECT g.n_nationkey, g.i AS cell_idx, greatest(
         |$cases) AS best
         |  FROM good g
         |$joins
         |)
         |SELECT n_nationkey, cell_idx,
         |       CAST(CASE WHEN best < 0 THEN 0 ELSE 8 - best % 16 END AS BIGINT)
         |         AS flow_dir,
         |       CAST(CASE WHEN best < 0 THEN 0 ELSE best // 16 END AS BIGINT)
         |         AS drop2x
         |FROM best ORDER BY n_nationkey, cell_idx""".stripMargin
    },
  )
}
