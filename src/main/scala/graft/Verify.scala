package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query subset for local iteration
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // no .crc sidecars from Spark's own local writes (see scaladoc)
    graft.sinks.S3Sink.disableLocalWriteChecksums(spark)
    new java.io.File(outDir).mkdirs()
    // fixture-schema tripwire: a regenerated fixture with a drifted
    // encoding must surface as ONE named problem here, not as N
    // individually-erroring queries downstream
    val contractViolations =
      graft.sources.FixtureContract.violations(spark, sfDir)
    contractViolations.foreach(v =>
      System.err.println(s"[verify] FIXTURE CONTRACT: $v"))
    // a typo'd subset name must not silently verify nothing
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[verify] WARNING: unknown query in subset: $n")))
    val selected = only match {
      case Some(set) => SparkEntry.queries.filter { case (k, _) => set(k) }
      case None      => SparkEntry.queries
    }
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
      }
      // drop per-query caches (band tables, bucketed embeddings, …) so a
      // 100-query dump doesn't accumulate storage across queries
      graft.queries.QueryCaches.releaseAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // self-contained error record: a green-row-only correctness report
    // can mask a zeroed pack (round 8) — errors.json names every query
    // that threw, plus any fixture-contract violations, so the dump is
    // auditable standalone
    val errJson =
      (contractViolations.zipWithIndex.map { case (v, i) =>
        s"${q(s"_fixture_contract_$i")}: ${q(v)}" } ++
       failures.map { case (k, v) => s"${q(k)}: ${q(v)}" })
        .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    val nBad = failures.size + contractViolations.size
    if (nBad > 0)
      System.err.println(s"[verify] $nBad problem(s): " +
        s"${failures.size} failing quer(ies), " +
        s"${contractViolations.size} fixture-contract violation(s) — see $outDir/errors.json")
    spark.stop()
    // strict mode (tools/preflight.sh): any throw or contract violation
    // fails the process — default stays exit-0 for driver compatibility
    if (nBad > 0 && sys.env.get("SPARK_GRAFT_STRICT").contains("1"))
      sys.exit(1)
  }
}
