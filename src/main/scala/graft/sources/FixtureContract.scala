package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Fixture-schema tripwire. The driver regenerates the parquet fixtures
  * under /root/testdata between rounds, and an encoding drift (round 8:
  * events.ts INT64-nanos → TIMESTAMP_MICROS/NTZ) silently zeroed a
  * 31-query pack because every query failed individually instead of one
  * check failing loudly. This object pins the *loaded* Spark dtype of
  * every fixture column the library depends on; Verify/Bench/specs call
  * it once at startup so drift surfaces as ONE named failure with a
  * found-vs-expected message naming the fixture file.
  *
  * The contract accepts every encoding the sources are known to handle
  * (e.g. events.ts may be BIGINT legacy-nanos, TIMESTAMP_NTZ, or
  * TIMESTAMP — EventSource.convert normalizes all three); anything else
  * is a violation, by design, even if some queries would survive it.
  */
object FixtureContract {

  private val tsLike: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val floatArr: Set[DataType] =
    Set(ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false))

  private def one(dt: DataType*): Set[DataType] = dt.toSet

  /** table → (column → acceptable loaded dtypes). Columns absent from
    * the map are unconstrained (new fixture columns are not drift).
    */
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Map(
      "n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Map(
      "c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Map(
      "p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> tsLike, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> tsLike),
    "events" -> Map(
      "event_id" -> one(LongType), "ts" -> (tsLike + LongType),
      "user_id" -> one(LongType), "event_type" -> one(StringType),
      "value" -> one(DoubleType), "props" -> one(StringType)),
    "documents" -> Map(
      "doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Map(
      "vec_id" -> one(LongType), "embedding" -> floatArr,
      "label" -> one(IntegerType)))

  /** All contract violations for the fixtures under `dir` (footer reads
    * only — cheap). Empty = contract holds.
    */
  def violations(spark: SparkSession, dir: String): Seq[String] = {
    // the legacy INT64-nanos events encoding is only *readable* under
    // the escape hatch; scope it to the schema probe so the check never
    // reports "unreadable" for an encoding EventSource supports
    val nanosConf = "spark.sql.legacy.parquet.nanosAsLong"
    val prevNanos = spark.conf.getOption(nanosConf)
    spark.conf.set(nanosConf, "true")
    try {
      expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
        val path = s"$dir/$table.parquet"
        if (!new java.io.File(path).exists())
          Seq(s"$path: fixture file missing")
        else
          (try Right(spark.read.parquet(path).schema)
           catch { case e: Exception => Left(e) }) match {
            case Left(e) =>
              Seq(s"$path: unreadable (${e.getClass.getSimpleName}: ${e.getMessage.take(200)})")
            case Right(sc) =>
              val byName = sc.fields.map(f => f.name -> f.dataType).toMap
              cols.toSeq.sortBy(_._1).flatMap { case (c, ok) =>
                byName.get(c) match {
                  case None =>
                    Some(s"$path: column `$c` missing " +
                      s"(found: ${sc.fieldNames.mkString(", ")})")
                  case Some(dt) if !ok(dt) =>
                    Some(s"$path: column `$c` loaded as ${dt.simpleString}, " +
                      s"expected one of {${ok.map(_.simpleString).toSeq.sorted.mkString(", ")}} " +
                      "— fixture regenerated with a new encoding?")
                  case _ => None
                }
              }
          }
      }
    } finally prevNanos match {
      case Some(v) => spark.conf.set(nanosConf, v)
      case None    => spark.conf.unset(nanosConf)
    }
  }

  /** Throws one IllegalStateException listing every violation. */
  def assertOk(spark: SparkSession, dir: String): Unit = {
    val v = violations(spark, dir)
    if (v.nonEmpty) throw new IllegalStateException(
      s"FIXTURE CONTRACT VIOLATED (${v.size} problem(s)) under $dir:\n  " +
        v.mkString("\n  "))
  }
}
