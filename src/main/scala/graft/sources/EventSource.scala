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
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource requires a directory or glob, not a plain file
    convert(spark.readStream.schema(schema).parquet(s"$dir/events.parquet*"))
  }
}
