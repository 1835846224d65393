package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's filename algebra as pure Column expressions
  * (SURVEY.md §1.3; parse sites ETL.py:243–255, 417–425).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * — no UDFs — so the whole decode stays inside whole-stage codegen and
  * filters over decoded fields can still be pushed around by Catalyst.
  */
object Filenames {

  /** `parts = base_name.split("_")` (ETL.py:244). */
  def parts(base: Column): Column = split(base, "_")

  /** `parameter_code = parts[1]` (ETL.py:246). element_at is 1-based. */
  def parameterCode(base: Column): Column = element_at(parts(base), 2)

  /** `statistic = parts[4]` (ETL.py:251). */
  def statistic(base: Column): Column = element_at(parts(base), 5)

  /** `parts[-1]`, the period token (ETL.py:248). */
  def periodToken(base: Column): Column = element_at(parts(base), -1)

  /** Region code from the parent directory of a path (ETL.py:234:
    * `os.path.basename(os.path.dirname(file_path))`).
    */
  def regionCodeFromPath(path: Column): Column =
    element_at(split(path, "/"), -2)

  /** `new_file_name` recomposition (ETL.py:251):
    * `{parameter_name}_{statistic}_1991-2020_{period_name}`.
    * Takes already-decoded display names (from the dim joins).
    */
  def newFileName(parameterName: Column, statistic: Column,
      periodName: Column): Column =
    concat_ws("_", parameterName, statistic, lit("1991-2020"), periodName)

  /** Clipped-raster name (ETL.py:290–293):
    * `{new_file_name}_{region_name}.tif`.
    */
  def clippedName(newFileName: Column, regionName: Column): Column =
    concat(concat_ws("_", newFileName, regionName), lit(".tif"))

  /** Title normalization (ETL.py:276–279): strip a trailing " Region",
    * then map any "Area…" remainder to "Chatham Islands".
    */
  def normalizeTitle(rawTitle: Column): Column = {
    val stripped = element_at(split(rawTitle, " Region"), 1)
    when(stripped.startsWith("Area"), lit("Chatham Islands")).otherwise(stripped)
  }

  /** Dash→space display form (ETL.py:421). */
  def dashToSpace(c: Column): Column = translate(c, "-", " ")

  /** S3 object key (ETL.py:389–393): for a truthy prefix,
    * `f"{prefix.strip('/')}/{file_name}"`; else the bare file name.
    * Faithful to the Python even for the degenerate prefix "/" (strips
    * to empty but still yields a leading-slash key, because the branch
    * tests the ORIGINAL prefix).
    */
  def s3Key(prefix: Column, fileName: Column): Column = {
    val stripped = trim(prefix, "/")
    when(length(coalesce(prefix, lit(""))) > 0,
      concat(stripped, lit("/"), fileName)).otherwise(fileName)
  }
}
