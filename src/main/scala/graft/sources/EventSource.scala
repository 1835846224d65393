package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Source for the `events` fixture. The fixture's `ts` physical type
  * has drifted across regenerations — INT64 TIMESTAMP(NANOS) (which
  * Spark 4.1 refuses outright unless read as a raw BIGINT via the
  * legacy `nanosAsLong` escape hatch), then TIMESTAMP_MICROS with
  * isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Rather than assume
  * one encoding, `convert` branches on the dtype the scan actually
  * produced and normalizes every variant to a session-TZ µs
  * TimestampType column:
  *
  *   - BIGINT (legacy nanos-as-long): `timestamp_micros(ts div 1000)`
  *     — truncation, matching how Spark truncates µs-precision sources
  *   - TIMESTAMP_NTZ: `cast(TimestampType)` — value-preserving because
  *     every session in this repo pins spark.sql.session.timeZone=UTC
  *   - TIMESTAMP: passthrough
  *
  * Any other dtype fails loudly with the found-vs-expected types (the
  * fixture-contract tripwire — a regeneration can shift the schema
  * again, and a silent mis-read costs a whole query pack).
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

  private[graft] def convert(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        df
      case other =>
        throw new IllegalStateException(
          s"events fixture contract violated: column `ts` loaded as $other; " +
            "expected BIGINT (legacy nanos), TIMESTAMP_NTZ, or TIMESTAMP. " +
            "The fixture was likely regenerated with a new encoding — " +
            "extend EventSource.convert for it.")
    }

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
