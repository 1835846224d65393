package graft

import graft.streaming.EventStreams

/** Pins for the event-volume-derived streaming state-partition count
  * (r13: the q_stream_session 10× profile showed the scale cost is
  * merge parallelism, so the default scales with the events file —
  * clamp(bytes/1 MiB, 2, cores) — while an explicit conf always wins).
  */
class StatePartitionsSpec extends SparkSpecBase {

  test("explicit conf always wins over the derived default") {
    spark.conf.set("spark.graft.stream.statePartitions", "7")
    try assert(EventStreams.statePartitions(spark, sf) == 7)
    finally spark.conf.unset("spark.graft.stream.statePartitions")
  }

  test("no dir / missing events file derives the floor of 2") {
    assert(EventStreams.statePartitions(spark) == 2)
    assert(EventStreams.statePartitions(spark, "/nonexistent/dir") == 2)
  }

  test("fixture scales stay at the measured-optimal floor; size scales up") {
    // sf0.001 events ≈ 27 KB → floor 2 (the sf0.1 2 MiB file also
    // lands on 2: bench-neutral at every gate scale)
    assert(EventStreams.statePartitions(spark, sf) == 2)
    assert(EventStreams.statePartitions(spark, "/root/testdata/sf0.1") == 2)
    // the derivation is monotone in bytes and capped by cores: a
    // synthetic 10 MiB events file on a small-core session derives
    // min(10, cores) — exercise the clamp arithmetic directly through
    // a temp dir
    val dir = java.nio.file.Files.createTempDirectory("graft_sp_").toFile
    val f = new java.io.File(dir, "events.parquet")
    f.mkdirs()
    val blob = new java.io.File(f, "part-0.bin")
    val out = new java.io.FileOutputStream(blob)
    try out.write(new Array[Byte](10 << 20)) finally out.close()
    val cores = spark.sparkContext.defaultParallelism
    assert(EventStreams.statePartitions(spark, dir.toString) ==
      math.max(2, math.min(10, cores)))
    blob.delete(); f.delete(); dir.delete()
  }
}
