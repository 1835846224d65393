package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DedupQueries, EtlQueries, EventQueries, GeoQueries, MultimodalQueries, RasterQueries, RelationalQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query packs register here; each pack pairs DataFrame plans with
  * DuckDB oracle SQL over the same parquet fixtures (column names
  * aligned on both sides — the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (EtlQueries.queries, EtlQueries.oracles),
      (RelationalQueries.queries, RelationalQueries.oracles),
      (GeoQueries.queries, GeoQueries.oracles),
      (RasterQueries.queries, RasterQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (SimilarityQueries.queries, SimilarityQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (MultimodalQueries.queries, MultimodalQueries.oracles),
      (EventQueries.queries, EventQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The §7.4 product catalog: scan → decode → rename → filter →
    * cross-join regions → metadata projection.
    */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.queries("q_product_catalog")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.iterator.flatMap(_._2).toMap
}
