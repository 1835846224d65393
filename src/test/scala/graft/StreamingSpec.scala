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

  test("stateful totals agree with a plain aggregation") {
    val fromState = EventStreams.userTotals(batchEvents)
      .collect().map(t => t.user_id -> t.n_events).toMap
    val fromAgg = batchEvents.groupBy("user_id").count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(fromState == fromAgg)
  }
}
