package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2.9/§7.5 stretch): the
  * batch event-time operators re-run as streams, plus a custom
  * stateful operator via mapGroupsWithState.
  *
  * Design: every builder takes a *source* DataFrame, so the identical
  * plan runs batch (read.parquet) or streaming (readStream.parquet) —
  * that equivalence is the correctness check (StreamingSpec runs both
  * with Trigger-less processAllAvailable and compares).
  */
object EventStreams {

  /** Streaming source over the events parquet directory (ns-timestamp
    * handling centralized in EventSource).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    graft.sources.EventSource.stream(spark, dir)

  /** Tumbling 1-hour counts per event type; with a 1-hour watermark
    * when the source is streaming.
    */
  def tumblingCounts(events: DataFrame): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start_s"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Sliding 2-hour windows advancing hourly (each event in 2 windows);
    * DECIMAL-exact sum (see EventQueries q_window_sliding for the
    * rounding-boundary trap that forces it).
    */
  def slidingCounts(events: DataFrame): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(24,6)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start_s"),
        col("n"), col("sum_value"))
  }

  /** Session windows (30-min inactivity gap) per user. Streaming
    * session aggregation supports update/append only (no Complete);
    * with the whole static source in one micro-batch, update mode
    * emits each final session exactly once.
    */
  def sessionCounts(events: DataFrame): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    src.groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start_s"),
        (unix_timestamp(col("w.end")) - 1800).as("session_end_s"),
        col("n_events"), col("sum_value"))
  }

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful operator: per-user running totals via
    * mapGroupsWithState (KeyValueGroupedDataset) — the §2.10 surface
    * Spark's built-ins don't cover. In batch mode Spark executes the
    * same function with per-group state confined to the batch, so
    * batch output == streaming output after processAllAvailable on a
    * static source.
    */
  def userTotals(events: DataFrame): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    val typed = events.select(col("user_id"), col("value")).as[UserEvent]
    typed.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          // state keeps the exact running sum; rounding happens only on
          // emission (rounding state would compound across batches)
          state.update(UserTotals(uid, n, tot))
          UserTotals(uid, n, math.rint(tot * 100) / 100)
      }
  }

  /** Run a streaming DataFrame to completion against a static source
    * and return the materialized result (memory sink).
    */
  def runToCompletion(df: DataFrame, name: String, outputMode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }

  /** Stateful streaming queries pay a per-state-partition cost every
    * micro-batch (one HDFS-backed store instance + commit each): with
    * the session's CPU-count shuffle partitions that overhead dwarfs
    * the actual aggregation at fixture group counts. Pin the state
    * partitioning to a small constant while a streaming query starts —
    * state cardinality, not input size, is what this knob should track
    * (on a cluster you'd size it to peak state, set once per query at
    * first start; it is frozen into the checkpoint thereafter).
    */
  def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }
}
