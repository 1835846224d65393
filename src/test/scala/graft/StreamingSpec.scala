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

  test("stateful totals agree with a plain aggregation") {
    val fromState = EventStreams.userTotals(batchEvents)
      .collect().map(t => t.user_id -> t.n_events).toMap
    val fromAgg = batchEvents.groupBy("user_id").count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(fromState == fromAgg)
  }
}
