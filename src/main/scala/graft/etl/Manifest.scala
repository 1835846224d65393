package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic file manifest, the rebuild's stand-in for the
  * reference's `os.walk` input listing (ETL.py:198–208).
  *
  * The driver's correctness oracle is DuckDB over the same Parquet
  * fixtures, so the manifest is derived purely from the `part` table by
  * modular arithmetic on `p_partkey` — both engines rebuild the exact
  * same listing, and every downstream filename-algebra query becomes
  * hash-checkable.
  *
  * Filename grammar (SURVEY.md §1.3; decode sites ETL.py:244–251):
  * {{{
  * grid_<paramCode>_NZ_norm_<statistic>_1991-2020_<periodToken><ext>
  *        parts[1]           parts[4]              parts[-1]
  * }}}
  * and the parent directory name encodes a region code (ETL.py:234).
  *
  * Scale note: this is a row-per-file catalog. At 100 TB the real
  * listing comes from `spark.read.format("binaryFile")` with
  * `pathGlobFilter` (scan-level pushdown, SRC-1) — the manifest shape
  * (path, base_name, region dir) is identical, so every query below
  * transfers unchanged.
  */
object Manifest {

  /** Columns: file_id, pidx, tidx, ridx, sidx, region_code, base_name,
    * ext, file_name, path.
    */
  def build(spark: SparkSession, sfDir: String): DataFrame = {
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val pDim = broadcast(Lookups.parameterDim(spark).select(
      col("idx").as("pidx"), col("code").as("param_code")))
    val tDim = broadcast(Lookups.periodDim(spark).select(
      col("idx").as("tidx"), col("code").as("period_token")))
    val rDim = broadcast(Lookups.regionDim(spark).select(
      col("idx").as("ridx"), col("code").as("region_code")))
    val sDim = {
      import spark.implicits._
      broadcast(Lookups.statistics.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("sidx", "statistic"))
    }

    part
      .select(
        col("p_partkey").as("file_id"),
        (col("p_partkey") % 16).as("pidx"),
        (col("p_partkey") % 17).as("tidx"),
        (floor(col("p_partkey") / 17.0).cast("bigint") % 17).as("ridx"),
        (col("p_partkey") % 3).as("sidx"),
        when(col("p_partkey") % 5 === 0, lit(".txt")).otherwise(lit(".asc")).as("ext"),
      )
      .join(pDim, "pidx")
      .join(tDim, "tidx")
      .join(rDim, "ridx")
      .join(sDim, "sidx")
      .withColumn("base_name",
        concat_ws("_", lit("grid"), col("param_code"), lit("NZ"), lit("norm"),
          col("statistic"), lit("1991-2020"), col("period_token")))
      .withColumn("file_name", concat(col("base_name"), col("ext")))
      .withColumn("path",
        concat_ws("/", lit("/data/asc"), col("region_code"), col("file_name")))
      .select("file_id", "pidx", "tidx", "ridx", "sidx", "region_code",
        "base_name", "ext", "file_name", "path")
  }

  /** The same manifest as a DuckDB CTE. Compose as
    * `WITH ${Manifest.cte} SELECT ... FROM manifest`.
    * `FLOOR(/17.0)` instead of integer division: DuckDB `CAST(x AS INT)`
    * rounds while Spark truncates, so both sides floor explicitly.
    */
  // NOTE: no line in this fragment may *start* with "||" — the oracle
  // strings that interpolate it run .stripMargin, which would eat the
  // first pipe. Concatenation operators stay at line ends.
  val cte: String =
    s"""${Lookups.parameterCte},
       |${Lookups.periodCte},
       |${Lookups.regionCte},
       |${Lookups.statisticCte},
       |manifest0 AS (
       |  SELECT p.p_partkey AS file_id,
       |         p.p_partkey % 16 AS pidx,
       |         p.p_partkey % 17 AS tidx,
       |         CAST(FLOOR(p.p_partkey / 17.0) AS BIGINT) % 17 AS ridx,
       |         p.p_partkey % 3 AS sidx,
       |         rd.code AS region_code,
       |         'grid_' || pd.code || '_NZ_norm_' || sd.stat || '_1991-2020_' || td.code AS base_name,
       |         CASE WHEN p.p_partkey % 5 = 0 THEN '.txt' ELSE '.asc' END AS ext
       |  FROM part p
       |  JOIN parameter_dim pd ON pd.idx = p.p_partkey % 16
       |  JOIN period_dim td ON td.idx = p.p_partkey % 17
       |  JOIN region_dim rd ON rd.idx = CAST(FLOOR(p.p_partkey / 17.0) AS BIGINT) % 17
       |  JOIN stat_dim sd ON sd.idx = p.p_partkey % 3
       |),
       |manifest AS (
       |  SELECT file_id, pidx, tidx, ridx, sidx, region_code, base_name, ext,
       |         base_name || ext AS file_name,
       |         '/data/asc/' || region_code || '/' || base_name || ext AS path
       |  FROM manifest0
       |)""".stripMargin
}
