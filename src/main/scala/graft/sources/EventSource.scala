package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source for the `events` fixture, whose parquet column is
  * INT64 TIMESTAMP(NANOS) — a type Spark 4.1 refuses outright
  * (PARQUET_TYPE_ILLEGAL). Reading goes through the legacy
  * `nanosAsLong` escape hatch and rebuilds a proper µs TimestampType
  * column (`timestamp_micros(ns div 1000)` — truncation, matching how
  * Spark truncates µs-precision sources).
  *
  * Centralized so batch queries and streaming readers share one ts
  * semantics; the conversion is a projection (codegen'd, no UDF).
  */
object EventSource {

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  // schema-by-path cache: streaming readers need an explicit schema, and
  // deriving it costs a footer read per call — 12+ stream queries × a
  // per-query listing adds up in the bench; fixture schemas never change
  // within a session
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def convert(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  def batch(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set(NanosConf, "true")
    convert(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Streaming variant over the same file (static source → finite
    * stream; processAllAvailable drains it).
    */
  def stream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set(NanosConf, "true")
    val path = s"$dir/events.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    // FileStreamSource requires a directory or glob, not a plain file
    convert(spark.readStream.schema(schema).parquet(s"$path*"))
  }
}
