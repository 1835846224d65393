package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Malformed-input handling — at 100 TB corrupt rows are a certainty,
  * and the three CSV parser modes are the contract a pipeline chooses
  * from: PERMISSIVE quarantines (null row + `_corrupt_record`),
  * DROPMALFORMED silently filters, FAILFAST aborts the job.
  */
class BadRecordsSpec extends SparkSpecBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-badrec")
    Files.writeString(d.resolve("data.csv"),
      """id,qty,name
        |1,10,alpha
        |2,notanumber,beta
        |3,30,gamma
        |4,,delta
        |5,50,epsilon
        |""".stripMargin)
    d.toString
  }

  private val schema = "id BIGINT, qty BIGINT, name STRING, _corrupt_record STRING"

  test("PERMISSIVE quarantines corrupt rows into _corrupt_record") {
    val df = spark.read.option("header", "true").option("mode", "PERMISSIVE")
      .schema(schema).csv(dir)
      // corrupt-record column access requires materialization first
      .cache()
    try {
      assert(df.count() == 5, "every physical row survives")
      val bad = df.filter(col("_corrupt_record").isNotNull).collect()
      assert(bad.map(_.getAs[String]("_corrupt_record")).toSeq ==
        Seq("2,notanumber,beta"), "only the unparseable row is quarantined")
      // missing value (row 4) is a legal null, NOT corrupt
      assert(df.filter(col("id") === 4 && col("qty").isNull &&
        col("_corrupt_record").isNull).count() == 1)
      val good = df.filter(col("_corrupt_record").isNull)
      assert(good.agg(sum(col("qty"))).head().getLong(0) == 90L)
    } finally df.unpersist()
  }

  // NOTE (pruning trap): parser modes only fire for columns that are
  // actually READ — count() prunes to zero parsed columns, so corrupt
  // rows are neither dropped nor fatal under it. Every assertion below
  // materializes all columns; a real quarantine/validation job must do
  // the same or malformed rows silently pass the "row count" check.
  test("DROPMALFORMED filters corrupt rows out (when columns are parsed)") {
    val df = spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .schema("id BIGINT, qty BIGINT, name STRING").csv(dir)
    // count() alone reads no columns and still sees 5 physical rows
    assert(df.count() == 5, "pruned count does not parse, nothing drops")
    val rows = df.select("id", "qty", "name").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 3L, 4L, 5L))
  }

  test("FAILFAST aborts on the first corrupt row (when columns are parsed)") {
    val e = intercept[Exception] {
      spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema("id BIGINT, qty BIGINT, name STRING").csv(dir)
        .select("id", "qty", "name").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("FAILFAST") || m.contains("Malformed")),
      messages(e).mkString(" | "))
  }
}
