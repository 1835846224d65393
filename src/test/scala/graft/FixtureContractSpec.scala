package graft

import org.apache.spark.sql.functions._

/** The fixture-schema tripwire itself: the real fixtures must satisfy
  * the contract, and a deliberately perturbed schema must fail it with
  * a message naming the fixture, the column, and found-vs-expected
  * types (round 8: silent drift on events.ts zeroed a 31-query pack).
  */
class FixtureContractSpec extends SparkSpecBase {

  test("real sf0.001 fixtures satisfy the contract") {
    val v = graft.sources.FixtureContract.violations(spark, sf)
    assert(v.isEmpty, s"unexpected violations:\n  ${v.mkString("\n  ")}")
  }

  test("documents.text is pure ASCII at every fixture scale (byte-kernel contract)") {
    // ADVICE r15: the audio family (q_audio_vad etc.) sums UTF-8 BYTES
    // engine-side while the DuckDB oracle indexes CHARACTERS; one
    // non-ASCII char in a regenerated fixture would silently
    // desynchronize framing and energy between the engines. Pin
    // octet_length == char_length so regeneration fails loudly here
    // instead of surfacing as an unexplained gate mismatch.
    // r17: sf0.1 included — the q_kn_smoothing regime change (ROUND16_NOTES
    // Part 3) showed bench-scale fixtures can drift independently of the
    // gate-scale ones.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                  "/root/testdata/sf0.1")) {
      val bad = spark.read.parquet(s"$d/documents.parquet")
        .filter(octet_length(col("text")) =!= length(col("text"))).count()
      assert(bad == 0L, s"$bad non-ASCII documents in $d/documents.parquet")
    }
  }

  test("documents.doc_id < 1e6 at every fixture scale (dup-offset arithmetic contract)") {
    // ADVICE r16: Corpus.withDuplicates and its consumers
    // (q_simpson_diversity's `doc_id % 1000000` base-doc recovery,
    // q_dedup_ngram's twin-offset windows) assume base doc_ids live
    // strictly below the 1e6 copy offset. A regenerated fixture with
    // larger ids would silently mis-attribute clusters to the wrong
    // base doc; fail loudly here instead.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                  "/root/testdata/sf0.1")) {
      val bad = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("doc_id") >= 1000000L || col("doc_id") < 0L).count()
      assert(bad == 0L,
        s"$bad documents with doc_id outside [0, 1e6) in $d/documents.parquet")
    }
  }

  test("perturbed events.ts dtype fails with a useful message") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_contract").toFile.getAbsolutePath
    try {
      // clone the real fixture set by symlink, then overwrite events
      // with a drifted schema (ts as string)
      val src = new java.io.File(sf)
      src.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(dir, f.getName), f.toPath)
      }
      new java.io.File(s"$dir/events.parquet").delete()
      spark.read.parquet(s"$sf/events.parquet")
        .withColumn("ts", col("ts").cast("string"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

      val v = graft.sources.FixtureContract.violations(spark, dir)
      assert(v.nonEmpty, "perturbed schema passed the contract")
      assert(v.exists(m => m.contains("events.parquet") && m.contains("`ts`")
        && m.contains("string")),
        s"violation message unhelpful:\n  ${v.mkString("\n  ")}")
      val ex = intercept[IllegalStateException] {
        graft.sources.FixtureContract.assertOk(spark, dir)
      }
      assert(ex.getMessage.contains("FIXTURE CONTRACT VIOLATED"))
      assert(ex.getMessage.contains("`ts`"))
    } finally {
      val d = new java.io.File(dir)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
          f.listFiles().foreach(rm)
        f.delete()
      }
      rm(d)
    }
  }

  test("EventSource.convert normalizes every contract-accepted ts encoding") {
    import spark.implicits._
    val tsType = org.apache.spark.sql.types.TimestampType
    // BIGINT legacy-nanos path
    val fromLong = graft.sources.EventSource.convert(
      Seq((1L, 1700000000123456789L)).toDF("event_id", "ts"))
    assert(fromLong.schema("ts").dataType == tsType)
    assert(fromLong.select(unix_timestamp(col("ts"))).head.getLong(0)
      == 1700000000L)
    // TIMESTAMP_NTZ path (UTC session → value-preserving)
    val fromNtz = graft.sources.EventSource.convert(
      Seq((1L, java.time.LocalDateTime.parse("2023-11-14T22:13:20")))
        .toDF("event_id", "ts"))
    assert(fromNtz.schema("ts").dataType == tsType)
    assert(fromNtz.select(unix_timestamp(col("ts"))).head.getLong(0)
      == 1700000000L)
    // TIMESTAMP passthrough
    val fromTs = graft.sources.EventSource.convert(
      Seq((1L, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(1700000000L))))
        .toDF("event_id", "ts"))
    assert(fromTs.schema("ts").dataType == tsType)
    // anything else fails loudly
    val ex = intercept[IllegalStateException] {
      graft.sources.EventSource.convert(
        Seq((1L, "2023-11-14")).toDF("event_id", "ts"))
    }
    assert(ex.getMessage.contains("fixture contract"))
  }
}
