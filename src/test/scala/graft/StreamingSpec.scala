package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

/** Streaming ≡ batch equivalence on a static source: the same plan
  * builders run over read.parquet and readStream.parquet must agree.
  */
class StreamingSpec extends SparkSpecBase {

  private def batchEvents = graft.sources.EventSource.batch(spark, sf)

  test("tumbling window agg: streaming result equals batch result") {
    val batch = EventStreams.tumblingCounts(batchEvents)
      .orderBy("window_start_s", "event_type").collect()
    val streaming = EventStreams.runToCompletion(
      EventStreams.tumblingCounts(EventStreams.eventsStream(spark, sf)),
      "tumbling_mem", OutputMode.Complete())
      .orderBy("window_start_s", "event_type").collect()
    assert(batch.length == streaming.length && batch.length > 0)
    batch.zip(streaming).foreach { case (b, s) => assert(b == s, s"$b != $s") }
  }

  test("stateful mapGroupsWithState: streaming totals equal batch totals") {
    val batch = EventStreams.userTotals(batchEvents)
      .collect().map(t => t.user_id -> ((t.n_events, t.total_value))).toMap
    val streaming = EventStreams.runToCompletion(
      EventStreams.userTotals(EventStreams.eventsStream(spark, sf)).toDF(),
      "totals_mem", OutputMode.Update())
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))).toMap
    assert(batch.nonEmpty && batch == streaming)
  }

  test("watermark drops late events from streaming aggregation state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp

    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("w_start"), col("n"))

    val q = agg.writeStream.format("memory").queryName("late_mem")
      .outputMode("update").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1: establishes watermark = max(ts) - 10min = 09:50
      input.addData((t("2024-01-01 10:00:00"), 1.0), (t("2024-01-01 09:59:00"), 1.0))
      q.processAllAvailable()
      // batch 2: an on-time event and one far behind the watermark
      input.addData((t("2024-01-01 10:01:00"), 1.0), (t("2024-01-01 09:10:00"), 99.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_mem")
      .groupBy("w_start").agg(max(col("n")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // window starts derived from the same Timestamp objects (epoch
    // millis), so the assert is independent of the JVM default tz
    def winStart(s: String) =
      java.sql.Timestamp.valueOf(s).getTime / 1000 / 600 * 600
    val w0910 = winStart("2024-01-01 09:10:00")
    assert(!out.contains(w0910), s"late 09:10 event should be dropped, got $out")
    val w1000 = winStart("2024-01-01 10:00:00")
    assert(out(w1000) == 2L, s"10:00 window should count both on-time events: $out")
  }

  test("session windows stream in append mode: watermark-finalized sessions equal batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp

    def t(s: String) = Timestamp.valueOf(s)
    // two users: u1 has two sessions (>30min gap), u2 one session
    val real = Seq(
      (t("2024-01-01 10:00:00"), 1L, 1.0),
      (t("2024-01-01 10:10:00"), 1L, 2.0),
      (t("2024-01-01 11:30:00"), 1L, 3.0),
      (t("2024-01-01 10:05:00"), 2L, 4.0))

    val input = MemoryStream[(Timestamp, Long, Double)]
    val sessions = EventStreams.sessionCounts(
      input.toDF().toDF("ts", "user_id", "value"))
    val q = sessions.writeStream.format("memory").queryName("sess_mem")
      .outputMode("append").start()
    try {
      input.addData(real: _*)
      q.processAllAvailable()
      // sentinel a day later pushes the watermark past every real
      // session; append mode then finalizes and emits them
      input.addData((t("2024-01-02 12:00:00"), 999L, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sess_mem")
      .filter(col("user_id") =!= 999L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val batch = EventStreams.sessionCounts(real.toDF("ts", "user_id", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(streamed === batch, s"streamed=$streamed batch=$batch")
    assert(batch.size === 3) // u1 × 2 sessions + u2 × 1
  }

  test("stateful totals agree with a plain aggregation") {
    val fromState = EventStreams.userTotals(batchEvents)
      .collect().map(t => t.user_id -> t.n_events).toMap
    val fromAgg = batchEvents.groupBy("user_id").count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(fromState == fromAgg)
  }

  test("foreachBatch parquet sink: exactly-once across checkpointed restart") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // The streaming SINK side of §2.9: foreachBatch + an idempotent,
    // batchId-keyed overwrite gives exactly-once file output — a
    // re-executed micro-batch (crash between write and commit)
    // overwrites its own directory instead of appending duplicates,
    // and the checkpoint prevents committed batches from re-running.
    val work = java.nio.file.Files.createTempDirectory("graft-febatch").toString
    val input = MemoryStream[(Long, Double)]
    def start() = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.write.mode("overwrite").parquet(s"$work/out/batch=$batchId")
      }
      .start()

    val q1 = start()
    input.addData((1L, 1.0), (2L, 2.0))
    try q1.processAllAvailable() finally q1.stop()

    val q2 = start() // same checkpoint: batch 0 must NOT re-emit
    input.addData((3L, 3.0))
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(s"$work/out")
    assert(out.count() == 3, "each input row lands exactly once")
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("custom EWMA ring state: stream output equals the batch lag plan") {
    val batch = graft.queries.EventQueries.queries("q_ewma_dyadic")(spark, sf)
      .collect().toSeq
    val stream = graft.queries.EventQueries.queries("q_stream_ewma")(spark, sf)
      .collect().toSeq
    assert(batch.nonEmpty, "batch EWMA produced no rows")
    assert(stream == batch,
      s"stream/batch divergence:\n  batch=${batch.take(5)}\n  stream=${stream.take(5)}")
  }
}
