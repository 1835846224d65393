package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations over `events` (SURVEY.md §2.9 —
  * absent from the reference; §7.5 extension surface): tumbling,
  * sliding, and session windows, batch-first (the same `window()`/
  * `session_window()` operators run unchanged under Structured
  * Streaming — see graft.streaming and StreamingSpec).
  *
  * Cross-engine note: the fixture's `ts` encoding has drifted across
  * regenerations (INT64 nanos, then TIMESTAMP_MICROS/NTZ —
  * EventSource.convert normalizes all variants). Raw timestamps never
  * appear in output regardless — windows are emitted as epoch-second
  * longs, so sub-second precision differences between Spark and the
  * DuckDB oracle can never cross a boundary and both engines agree.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    graft.sources.EventSource.batch(s, dir)

  /** Shared scaffold for the stream-stream click/purchase joins:
    * both sides over ONE shared file subscription, joined on user with
    * the 1-hour attribution range.
    *
    * `flush = true` (left_outer): results that depend on the ABSENCE
    * of a match only materialize once the watermark proves no match
    * can still arrive, and a drained static file never advances it
    * past its own tail — so each side gets a control MemoryStream and
    * one far-future sentinel advances both watermarks (global
    * watermark = min over inputs) after the files drain. The sentinel
    * pair (which matches itself — equal far timestamps, gap 0) is
    * filtered from the returned table.
    *
    * `flush = false` (inner/left_semi shapes): presence-only results
    * emit eagerly in the micro-batch where the match arrives, so the
    * sentinel round would only pay an extra micro-batch for state
    * cleanup the result never sees.
    */
  private def sentinelStreamJoin(s: SparkSession, dir: String,
      joinType: String, name: String, flush: Boolean): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // sentinel machinery exists ONLY on the flush path — and so does
    // the sentinel-id filter below: filtering the id unconditionally
    // would silently drop a legitimate event with that user_id from
    // the non-flush variants while their oracles keep it
    val sentinels = if (flush) Some((
      org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)],
      org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)])) else None
    // one shared file source for both sides (self-join subscription)
    val base = graft.sources.EventSource.stream(s, dir)
    val rawClicks = base
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val rawPurchases = base
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    val clicks = sentinels.fold(rawClicks) { case (sentC, _) =>
      rawClicks.unionByName(sentC.toDF().toDF("click_id", "user_id", "click_ts"))
    }.withWatermark("click_ts", "2 hours")
    val purchases = sentinels.fold(rawPurchases) { case (_, sentP) =>
      rawPurchases.unionByName(sentP.toDF().toDF("purchase_id", "p_user_id", "purchase_ts"))
    }.withWatermark("purchase_ts", "2 hours")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      joinType)
    // enqueue the sentinels BEFORE start: MemoryStream buffers pre-start
    // rows, so the first micro-batch carries files + sentinels together
    // and ONE drain suffices — the far-future event time lands in batch
    // 0's max, the engine's trailing no-data batch applies the advanced
    // watermark, and the outer/expired rows flush there
    // (processAllAvailable covers no-data batches; the old shape paid a
    // second full drain round per query for the same effect)
    sentinels.foreach { case (sentC, sentP) =>
      val far = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")
      sentC.addData((999999999L, 999999999L, far))
      sentP.addData((999999999L, 999999999L, far))
    }
    val out = graft.streaming.EventStreams.runToCompletion(joined, name,
      org.apache.spark.sql.streaming.OutputMode.Append())
    // drop sentinel rows from EITHER side: under full_outer the
    // purchase-side sentinel surfaces as a null-extended row whose
    // user_id is NULL (only p_user_id is set), which a bare
    // user_id =!= filter could never catch — and would silently drop
    // every legitimate unmatched-purchase row too (NULL predicate).
    // coalesce(-1) keeps null-extended real rows and kills sentinels.
    if (flush) out.filter(
      coalesce(col("user_id"), lit(-1L)) =!= 999999999L &&
        coalesce(col("p_user_id"), lit(-1L)) =!= 999999999L)
    else out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1-hour windows per event type.
    "q_window_tumbling" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("window_start_s"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start_s", "event_type")),

    // Hour-of-day seasonal profile per event type — the seasonal-index
    // step of time-series decomposition (is 14:00 traffic above or
    // below this type's uniform-rate expectation?). ONE corpus-pass
    // hash aggregate at (type, hour); the per-type totals are a
    // RE-aggregation of that ≤|types|·24-row frame (the margin trick:
    // the "second pass" never touches the corpus), joined back
    // type-keyed — a bounded frame AQE broadcasts. The index is the
    // all-integer per-mille quotient n·24·1000 div total (non-negative
    // operands, so Spark `div` ≡ DuckDB `//`); 1000 = flat.
    "q_seasonality" -> ((s, dir) => {
      val byHour = ev(s, dir)
        .groupBy(col("event_type"), hour(col("ts")).cast("bigint").as("hr"))
        .agg(count(lit(1)).as("n"))
      val totals = byHour.groupBy("event_type").agg(sum("n").as("total"))
      byHour.join(totals, "event_type")
        .select(col("event_type"), col("hr"), col("n"),
          expr("n * 24 * 1000 div total").as("idx_pt"))
        .orderBy("event_type", "hr")
    }),

    // CUSUM change-point detection over the daily event-count series
    // per type — "did this feed's volume shift level, and when" (the
    // ingest-monitoring primitive behind alerting and backfill
    // triage). ONE corpus pass builds the daily counts; everything
    // after runs on the bounded |types|·|days| frame, where window
    // functions are safe (per-type partitions are ≤|days| rows — the
    // "window over a bounded re-aggregation" pattern, not a corpus
    // window). The CUSUM statistic is kept EXACT by scaling out the
    // mean: sᵢ = n·prefixᵢ − i·total (all int64), so the argmax is
    // engine-stable with no float tolerance; the peak day splits the
    // series at the maximum-|s| point, ties to the earliest day.
    // Before/after means are integer per-mille with a nullif guard.
    "q_changepoint" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val wOrd = Window.partitionBy("event_type").orderBy("day")
      val wAll = Window.partitionBy("event_type")
      val cum = daily
        .withColumn("i", row_number().over(wOrd).cast("bigint"))
        .withColumn("pre", sum("x").over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("tot", sum(col("x")).over(wAll))
        .withColumn("s_abs",
          abs(col("n") * col("pre") - col("i") * col("tot")))
      val pick = Window.partitionBy("event_type")
        .orderBy(col("s_abs").desc, col("day").asc)
      cum.withColumn("rk", row_number().over(pick))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          col("tot").as("total"), col("day").cast("string").as("cp_day"),
          col("s_abs").as("cusum_peak"),
          expr("pre * 1000 div i").as("mean_before_pt"),
          expr("(tot - pre) * 1000 div nullif(n - i, 0)").as("mean_after_pt"))
        .orderBy("event_type")
    }),

    // Sequential pattern mining, the PrefixSpan/GSP 2-sequence step:
    // which event-type TRANSITIONS recur across many users' journeys
    // (order matters — the difference from q_freq_itemsets' unordered
    // baskets, and from q_funnel's FIXED pattern). One corpus shuffle
    // keyed on user_id builds each user's journey (array_sort over
    // (ts, event_id, type) structs — event_id breaks ts ties, so the
    // order is total and engine-stable); adjacent pairs come from ONE
    // HOF pass; array_distinct makes the explode per-user-unique, so
    // plain count(*) IS user support — never a count-distinct over an
    // exploded corpus. Patterns are bounded by |types|², users by the
    // user space: everything after the first shuffle is tiny.
    "q_seq_patterns" -> ((s, dir) => {
      val seqs = ev(s, dir)
        .groupBy("user_id")
        .agg(array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
        .select(col("user_id"),
          expr("transform(evs, e -> e.event_type)").as("tps"))
      val nu = seqs.agg(count(lit(1)).as("n_users"))
      seqs.select(col("user_id"), explode(expr(
          """array_distinct(transform(slice(tps, 1, greatest(size(tps) - 1, 0)),
            |  (x, i) -> concat(x, '>', element_at(tps, i + 2))))"""
            .stripMargin)).as("pattern"))
        .groupBy("pattern").agg(count(lit(1)).as("support"))
        .crossJoin(broadcast(nu))
        .filter(col("support") * 4 >= col("n_users")) // 25% min support
        .select(col("pattern"), col("support"),
          expr("support * 1000 div n_users").as("support_pm"))
        .orderBy(col("support").desc, col("pattern"))
    }),

    // Inter-arrival time distribution per type — the point-process
    // view behind rate modeling and anomaly thresholds ("is this
    // feed Poisson at second granularity or does it clump?"). The
    // successor window is keyed (type, DAY), not type alone — a
    // per-type-only window sorts Θ(corpus/|types|) rows in one
    // partition at 100 TB; day-keying bounds each sort at a day's
    // volume and costs exactly one gap per day boundary (dropped by
    // design, noted here). Gaps are epoch-second longs (the
    // cast-to-long floor both engines share); the histogram is the
    // bounded log₂ bucket (bit-length — never a float log), ≤64
    // buckets, min/max/mean exact integers.
    "q_interarrival" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window
        .partitionBy(col("event_type"), date_trunc("day", col("ts")))
        .orderBy(col("ts").asc, col("event_id").asc)
      ev(s, dir)
        .withColumn("gap",
          lead(col("ts").cast("long"), 1).over(w) - col("ts").cast("long"))
        .filter(col("gap").isNotNull)
        .groupBy(col("event_type"),
          length(bin(greatest(col("gap"), lit(1L)))).cast("long")
            .as("gap_bits"))
        .agg(count(lit(1)).as("n"), min("gap").as("min_gap"),
          max("gap").as("max_gap"), sum("gap").as("sum_gap"))
        .withColumn("mean_gap", expr("sum_gap div n"))
        .select("event_type", "gap_bits", "n", "min_gap", "max_gap",
          "mean_gap")
        .orderBy("event_type", "gap_bits")
    }),

    // Abandonment detection — events with NO follow-up conversion in
    // their window (views where the user did not purchase within the
    // next hour): the windowed NOT-EXISTS, re-expressed without any
    // correlated probe or range join. One user-keyed shuffle; inside
    // each user's DESCENDING-time window, the running min of
    // purchase timestamps IS "the next purchase at or after this
    // event", so the anti-condition is a plain column compare. The
    // day rollup at the end is bounded.
    "q_abandonment" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      ev(s, dir)
        .withColumn("next_purchase", min(when(
          col("event_type") === "purchase", col("ts"))).over(w))
        .filter(col("event_type") === "view")
        .withColumn("abandoned", col("next_purchase").isNull ||
          col("next_purchase").cast("long") - col("ts").cast("long") > 3600)
        .groupBy(date_trunc("day", col("ts")).cast("date").cast("string")
          .as("day"))
        .agg(count(lit(1)).as("n_views"),
          sum(when(col("abandoned"), 1L).otherwise(0L)).as("n_abandoned"))
        .withColumn("abandon_pm", expr("n_abandoned * 1000 div n_views"))
        .orderBy("day")
    }),

    // Moving-average crossover detection (the golden/death-cross
    // signal): days where the 3-day volume average crosses the 7-day
    // average, per type. The comparison is LCM-scaled — sum3·7 vs
    // sum7·3 — so "fast above slow" is an exact integer predicate
    // with no division anywhere; a crossover is a flip of that
    // predicate between consecutive full-window days. One corpus
    // aggregate, then windows on the bounded |types|·|days| frame.
    "q_ma_crossover" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val sig = daily
        .withColumn("rn", row_number().over(w))
        .withColumn("s3", sum(col("x")).over(w.rowsBetween(-2, 0)))
        .withColumn("s7", sum(col("x")).over(w.rowsBetween(-6, 0)))
        .withColumn("fast_above", col("s3") * 7 > col("s7") * 3)
      sig.withColumn("prev_above", lag(col("fast_above"), 1).over(w))
        .withColumn("prev_rn", lag(col("rn"), 1).over(w))
        .filter(col("rn") >= 8 && col("prev_rn") >= 7 &&
          col("fast_above") =!= col("prev_above"))
        .select(col("event_type"), col("day").cast("string").as("day"),
          (col("s3") * 7).as("s3x7"), (col("s7") * 3).as("s7x3"),
          when(col("fast_above"), "golden").otherwise("death")
            .as("direction"))
        .orderBy("event_type", "day")
    }),

    // Overdispersion test — the variance-to-mean ratio (Fano factor)
    // of the daily count series per type: VMR ≈ 1 is Poisson arrival,
    // > 1 is bursty, < 1 is throttled/regular. Everything integer:
    // var/mean = (n·Σx² − S²) / (n·S) per-mille, non-negative by
    // Cauchy–Schwarz, so `div`/`//` agree. One corpus aggregate; the
    // moments are a re-aggregation of the bounded daily frame.
    "q_overdispersion" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("x").as("total"),
          sum(expr("x * x")).as("sumsq"))
        .withColumn("vmr_pm", expr(
          "(n_days * sumsq - total * total) * 1000 div (n_days * total)"))
        .withColumn("verdict",
          when(col("vmr_pm") > 1200, "overdispersed")
            .when(col("vmr_pm") < 800, "underdispersed")
            .otherwise("poisson-like"))
        .select("event_type", "n_days", "total", "vmr_pm", "verdict")
        .orderBy("event_type")
    }),

    // Trailing-7-day distinct actives per day (the WAU primitive) —
    // the rolling DISTINCT count that naive windowing gets wrong at
    // scale (a per-day count-distinct over a 7-day window re-scans
    // every window 7×). The exact decomposition: user u is active-in-
    // window on day d iff their LATEST activity day d_i satisfies
    // d − d_i ≤ 6 — so each (user, activity-day) row contributes the
    // interval [d_i, min(d_i+6, next_activity−1)], at most 7 rows
    // after the explode. One hash aggregate to the (user, day) grid,
    // one user-keyed window for the successor day, one ≤7× explode,
    // one day-grain count — all exact, no window re-scans, no
    // count-distinct anywhere.
    "q_rolling_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ud = ev(s, dir)
        .select(col("user_id"),
          datediff(date_trunc("day", col("ts")).cast("date"),
            lit("1970-01-01").cast("date")).cast("bigint").as("d"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      val bounds = ud.agg(max(col("d")).as("dmax"))
      ud.withColumn("nxt", lead(col("d"), 1).over(w))
        .crossJoin(broadcast(bounds))
        .select(explode(expr(
          "sequence(d, least(d + 6, least(coalesce(nxt - 1, d + 6), dmax)))"))
          .as("day"))
        .groupBy("day").agg(count(lit(1)).as("wau"))
        .orderBy("day")
    }),

    // Lag-1..3 autocorrelation of the daily count series per type —
    // the statistical complement of q_seasonality (does today's
    // volume predict tomorrow's?). Corpus pass = the daily hash
    // aggregate; devs/leads/products all run on the bounded
    // |types|·|days| frame. Deviations use the FLOOR-mean (x − S div
    // n) so every sum of products is int64-exact — the n-scaled
    // (n·x − S) form would square into overflow at count scales the
    // fixture's 10⁹-events-per-day ceiling allows. num may be
    // NEGATIVE, where Spark `div` (truncate) and DuckDB `//` (floor)
    // disagree — so the one float step is the final round(num/den, 4)
    // with the identical IEEE tree on both engines (the q_zipf_fit
    // discipline); num and den ride along exact.
    "q_autocorrelation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val dev = daily.join(stats, "event_type")
        .withColumn("dv", col("x") - expr("sx div n"))
        .withColumn("d1", lead(col("dv"), 1).over(w))
        .withColumn("d2", lead(col("dv"), 2).over(w))
        .withColumn("d3", lead(col("dv"), 3).over(w))
      dev.groupBy("event_type").agg(
          sum(expr("dv * dv")).as("den"),
          sum(expr("dv * d1")).as("n1"),
          sum(expr("dv * d2")).as("n2"),
          sum(expr("dv * d3")).as("n3"))
        .selectExpr("event_type", "den",
          """stack(3,
            |  CAST(1 AS BIGINT), n1,
            |  CAST(2 AS BIGINT), n2,
            |  CAST(3 AS BIGINT), n3) AS (lag_k, num)""".stripMargin)
        .select(col("event_type"), col("lag_k"), col("num"), col("den"),
          round(col("num").cast("double") / col("den").cast("double"), 4)
            .as("acf"))
        .orderBy("event_type", "lag_k")
    }),

    // Growth accounting — the DAU decomposition new / retained /
    // resurrected (+ churned, derived as yesterday's DAU minus
    // today's retained) that product analytics runs daily. The
    // (user, day) presence grid is ONE hash aggregate off the corpus;
    // the lag classification is a per-user window over that already-
    // reduced O(U·days) frame (per-user partitions are bounded by the
    // observation span), and the day table the output groups into is
    // bounded by |days|. All counts exact integers.
    "q_growth_accounting" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ud = ev(s, dir)
        .select(col("user_id"),
          datediff(date_trunc("day", col("ts")).cast("date"),
            lit("1970-01-01").cast("date")).cast("bigint").as("d"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      val byDay = ud.withColumn("prev", lag(col("d"), 1).over(w))
        .withColumn("status",
          when(col("prev").isNull, "new")
            .when(col("prev") === col("d") - 1, "retained")
            .otherwise("resurrected"))
        .groupBy("d").agg(count(lit(1)).as("dau"),
          sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when(col("status") === "retained", 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("status") === "resurrected", 1L).otherwise(0L))
            .as("n_resurrected"))
      val wd = Window.orderBy("d")
      byDay
        .withColumn("n_churned",
          coalesce(lag(col("dau"), 1).over(wd), lit(0L)) - col("n_retained"))
        .select("d", "dau", "n_new", "n_retained", "n_resurrected",
          "n_churned")
        .orderBy("d")
    }),

    // Discrete-time survival / conversion-latency table (the Kaplan-
    // Meier risk-set construction): time-to-first-purchase measured
    // from first signup, right-censored at each user's LAST observed
    // event — "how many days does conversion take, given who was
    // still at risk". One corpus shuffle keyed on user_id builds the
    // per-user (tte, censor) row; the day-grain table is a bounded
    // ≤|days| frame where the risk set comes from a CUMULATIVE-exits
    // window (at_risk(d) = U − Σ_{d'<d} exits), never a users×days
    // range join. Hazard and the conversion curve are integer
    // per-mille; the float survival PRODUCT is deliberately left to
    // the caller (Π of ratios is summation-order-unstable; every
    // number here is exact).
    "q_survival_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, dir)
      val perUser = e.groupBy("user_id").agg(
        min(when(col("event_type") === "signup", col("ts"))).as("su"),
        min(when(col("event_type") === "purchase", col("ts"))).as("fp"),
        max(col("ts")).as("last"))
      val u = perUser.filter(col("su").isNotNull)
        .select(
          when(col("fp") >= col("su"),
            datediff(col("fp").cast("date"), col("su").cast("date"))
              .cast("bigint")).as("tte"),
          datediff(col("last").cast("date"), col("su").cast("date"))
            .cast("bigint").as("ct"))
      val byDay = u
        .select(coalesce(col("tte"), col("ct")).as("d"),
          when(col("tte").isNotNull, 1L).otherwise(0L).as("ev"))
        .groupBy("d")
        .agg(sum("ev").as("n_events"), count(lit(1)).as("n_exits"))
      val nu = u.agg(count(lit(1)).as("n_users"))
      val wPrev = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
      byDay.crossJoin(broadcast(nu))
        .withColumn("at_risk",
          col("n_users") - coalesce(sum(col("n_exits")).over(wPrev), lit(0L)))
        .withColumn("n_censored", col("n_exits") - col("n_events"))
        .withColumn("hazard_pm", expr("n_events * 1000 div at_risk"))
        .withColumn("cum_conv", sum(col("n_events")).over(wCum))
        .withColumn("conv_pm", expr("cum_conv * 1000 div n_users"))
        .select("d", "at_risk", "n_events", "n_censored", "hazard_pm",
          "cum_conv", "conv_pm")
        .orderBy("d")
    }),

    // SAX symbolic motifs (Lin et al.) over the per-type daily count
    // series — the symbolic time-series step behind motif/anomaly
    // mining on operational metrics: each day's count is mapped to a
    // 4-letter alphabet by the series' OWN exact quartiles (rank-
    // defined on the value histogram — the q_winsorize discipline, so
    // breakpoints are integers and engine-identical), then repeated
    // 3-day words are counted. Scale shape: ONE map-combinable corpus
    // aggregate to the (type × day) frame; quartiles, symbols, the
    // lead-window word assembly, and motif counting all run on that
    // CALENDAR-bounded frame (windows keyed by event_type carry the
    // bounded-input justification in-line — the day frame is ≤
    // |types| × |span days| rows at any corpus size).
    "q_sax_motifs" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"),
          datediff(date_trunc("day", col("ts")).cast("date"),
            lit("1970-01-01").cast("date")).cast("bigint").as("d"))
        .agg(count(lit(1)).as("c"))
      // calendar-bounded from here down
      val hist = daily.groupBy("event_type", "c")
        .agg(count(lit(1)).as("nc"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("c")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val cuts = hist
        .withColumn("cum", sum(col("nc")).over(wCum))
        .withColumn("m", sum(col("nc")).over(wAll))
        .groupBy("event_type")
        .agg(
          min(when(col("cum") >= expr("(m * 1 + 3) div 4"), col("c"))).as("q1"),
          min(when(col("cum") >= expr("(m * 2 + 3) div 4"), col("c"))).as("q2"),
          min(when(col("cum") >= expr("(m * 3 + 3) div 4"), col("c"))).as("q3"))
      val wLead = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("d")
      daily.join(cuts, "event_type")
        .withColumn("sym",
          when(col("c") <= col("q1"), "a")
            .when(col("c") <= col("q2"), "b")
            .when(col("c") <= col("q3"), "c")
            .otherwise("d"))
        .withColumn("motif", concat(col("sym"),
          lead(col("sym"), 1).over(wLead), lead(col("sym"), 2).over(wLead)))
        .filter(col("motif").isNotNull)
        .groupBy("event_type", "motif")
        .agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
        .orderBy(col("event_type"), col("n_occ").desc, col("motif"))
    }),

    // Per-state transition entropy of the user event chain — the
    // behavioral-diversity number next to q_event_transitions' raw
    // counts: how predictable is the next event GIVEN the current one
    // (low entropy = funnel-like flows; a sudden rise flags bot
    // traffic or instrumentation drift). Transition probabilities are
    // floored to per-myriad ints and −ln comes from the shared
    // builder-side [[TextQueries.lnMyriadScaled]] table — the
    // q_mutual_info discipline, so H = Σ p·(−ln p) hash-matches to
    // the digit and a p that floors to 0 contributes exactly 0 (the
    // limit value) with no special-casing. Shape: one user-bounded
    // lead window (the q_event_transitions exchange), one corpus
    // aggregate to the bounded |types|² transition frame, broadcast
    // table lookups — flat at 100 TB.
    "q_transition_entropy" -> ((s, dir) => {
      import s.implicits._
      val lntab = broadcast(TextQueries.lnMyriadScaled.zipWithIndex
        .map { case (l, h) => (h.toLong, l) }.toDF("h", "ln_p12"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val trans = ev(s, dir)
        .withColumn("et_to", lead(col("event_type"), 1).over(w))
        .filter(col("et_to").isNotNull)
        .groupBy(col("event_type").as("et_from"), col("et_to"))
        .agg(count(lit(1)).as("c"))
      val margins = trans.groupBy("et_from").agg(sum("c").as("c_from"))
      trans.join(margins, "et_from")
        .withColumn("p_pm", expr("least(c * 10000 div c_from, 9999)"))
        .join(lntab.select(col("h").as("p_pm"), col("ln_p12")), Seq("p_pm"))
        .groupBy("et_from")
        .agg(max(col("c_from")).as("n_out"),
          count(lit(1)).as("n_targets"),
          expr("sum(p_pm * ln_p12) div 10000").as("entropy_p12"))
        .orderBy("et_from")
    }),

    // Rolling 7-day median of the daily count series per type — the
    // robust-baseline smoother behind volume anomaly banding (median
    // shrugs off the single-day spikes that wreck a rolling mean).
    // Corpus pass #1 is the daily hash aggregate; the windowed
    // collect_list runs on the bounded |types|·|days| frame only.
    // The median is the LOWER median (sorted[(n+1) div 2], 1-based) —
    // an order statistic, never the float midpoint average, so both
    // engines agree exactly; ratio_pm flags deviation from baseline.
    "q_rolling_median" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, 0)
      daily.withColumn("win", sort_array(collect_list(col("x")).over(w)))
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("x"),
          expr("element_at(win, CAST((size(win) + 1) div 2 AS INT))")
            .as("med7"))
        .withColumn("ratio_pm", expr("x * 1000 div med7"))
        .orderBy("event_type", "day")
    }),

    // Sliding 2-hour windows every hour (each event lands in 2 windows).
    // Emits the DECIMAL-exact sum, not the mean: fixture values have 2
    // decimals, so per-window means land EXACTLY on .xxx5 rounding
    // boundaries where Spark's and DuckDB's round() legitimately
    // disagree (seen at sf0.01: 47.07075 → 47.0707 vs 47.0708).
    "q_window_sliding" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(24,6)")).cast("double").as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("window_start_s"),
          col("n"), col("sum_value"))
        .orderBy("window_start_s")),

    // The SAME tumbling aggregation executed as a Structured Streaming
    // query (readStream → watermark → window → memory sink, drained
    // with processAllAvailable) — putting the streaming engine itself
    // under the DuckDB oracle: its result must equal the batch SQL.
    "q_stream_tumbling" -> ((s, dir) => {
      val name = s"stream_tumbling_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        graft.streaming.EventStreams.runToCompletion(
          graft.streaming.EventStreams.tumblingCounts(
            graft.sources.EventSource.stream(s, dir)),
          name,
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }.orderBy("window_start_s", "event_type")
    }),

    // The custom stateful operator (mapGroupsWithState per-user running
    // totals) under the oracle gate: drained against the static source,
    // its final state must equal the batch GROUP BY. Update-mode memory
    // sinks append each batch's emissions, so the last emission per
    // user (the one with the highest n_events — totals are monotone) is
    // selected; with the whole file in one trigger that's the only row.
    "q_stream_user_totals" -> ((s, dir) => {
      val name = s"stream_user_totals_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        graft.streaming.EventStreams.runToCompletion(
          graft.streaming.EventStreams.userTotals(
            graft.sources.EventSource.stream(s, dir)).toDF(),
          name,
          org.apache.spark.sql.streaming.OutputMode.Update())
      }
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("total_value"))).as("m"))
        .select(col("user_id"), col("m.n_events").as("n_events"),
          col("m.total_value").as("total_value"))
        .orderBy("user_id")
    }),

    // CDC latest-state materialization: the streaming upsert view —
    // per entity (user), the most recent event's attributes plus a
    // lifetime counter, maintained as a Complete-mode aggregation.
    // max(struct(ts, event_id, …)) picks the row with the greatest
    // (ts, event_id) — one shuffle on the entity key, state = one
    // struct per entity. This is how a pipeline materializes "current
    // state of every entity" from a change stream; at 100 TB the
    // Complete-mode memory sink becomes Update mode over an upsert
    // sink (foreachBatch MERGE), but the aggregation plan — and its
    // per-key state bound — is identical. Ties: event_id is unique, so
    // the struct order is total and engine-independent; event times are
    // random over a month so µs-vs-ns truncation cannot reorder a
    // user's events (see the asof note below).
    "q_stream_cdc_latest" -> ((s, dir) => {
      val name = s"stream_cdc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        graft.streaming.EventStreams.runToCompletion(
          graft.sources.EventSource.stream(s, dir)
            .groupBy(col("user_id"))
            .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
              col("value"))).as("last"),
              count(lit(1)).as("n_events")),
          name,
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }
        .select(col("user_id"),
          unix_timestamp(col("last.ts")).as("last_s"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_event_type"),
          col("last.value").as("last_value"),
          col("n_events"))
        .orderBy("user_id")
    }),

    // Streaming top-k: the live leaderboard — event types ranked by
    // running count, re-emitted complete each batch. Sort + limit are
    // legal on a streaming Dataset only after an aggregation in
    // Complete mode (the engine re-ranks the full aggregate state per
    // batch); the aggregate itself is map-side-combined on the type
    // key, so the sort input is |distinct keys| rows, not |events| —
    // the property that keeps a leaderboard cheap when the stream is
    // 100 TB/day but the key space is small. Counts are integer-exact;
    // the value sum rounds to 2 dp before emission.
    "q_stream_topk" -> ((s, dir) => {
      val name = s"stream_topk_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        graft.streaming.EventStreams.runToCompletion(
          graft.sources.EventSource.stream(s, dir)
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              round(sum(col("value")), 2).as("sum_value"))
            .orderBy(col("n").desc, col("event_type"))
            .limit(3),
          name,
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }.orderBy(col("n").desc, col("event_type"))
    }),

    // As-of join: each purchase matched to the latest click of the
    // same user at-or-before its timestamp. Implemented as the
    // union-merge pattern — tag both sides, one shuffle on user_id, one
    // sort by (ts, side, id), carry the last-seen click forward with
    // last(_, ignoreNulls) over a running ROWS frame. This is the plan
    // that scales: no per-row subquery, no range self-join; exactly one
    // exchange + sort regardless of side sizes (how you'd as-of 100 TB
    // of trades against quotes).
    "q_asof_join" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("event_type").isin("click", "purchase"))
      val tagged = e.select(
        col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === "purchase").cast("int").as("is_p"),
        when(col("event_type") === "click", col("event_id")).as("click_id"),
        when(col("event_type") === "click", col("ts")).as("click_ts"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_p"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      tagged
        .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("asof_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("is_p") === 1)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_timestamp(col("ts")).as("purchase_ts_s"),
          col("asof_click_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("asof_click_ts"))).as("gap_s"))
        .orderBy("purchase_id")
    }),

    // Semi-structured props: parse the JSON payload column with
    // from_json (schema'd struct extraction, codegen'd — no UDF) and
    // aggregate the extracted field.
    "q_json_props" -> ((s, dir) =>
      ev(s, dir)
        .select(col("event_type"),
          from_json(col("props"), lit("k INT")).getField("k").cast("bigint").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // STREAM-STREAM inner join with an event-time range constraint:
    // clicks and purchases as two independent streams, joined per user
    // on purchase_ts ∈ [click_ts, click_ts + 1h]. Both sides carry
    // watermarks (that bounds join state at scale — expired rows are
    // dropped from the buffers); inner join emits on match, so draining
    // the static source yields the complete batch-equal result.
    "q_stream_stream_join" -> ((s, dir) => {
      val name = s"stream_ss_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        // ONE file source feeds both sides (a streaming self-join reuses
        // the subscription) instead of two independent listings/scans
        val base = graft.sources.EventSource.stream(s, dir)
        val clicks = base
          .filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("click_ts"))
          .withWatermark("click_ts", "2 hours")
        val purchases = base
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
          .withWatermark("purchase_ts", "2 hours")
        val joined = clicks.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
        graft.streaming.EventStreams.runToCompletion(
          joined.select(col("click_id"), col("purchase_id"), col("user_id"),
            (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
              .as("gap_s")),
          name,
          org.apache.spark.sql.streaming.OutputMode.Append())
      }.orderBy("click_id", "purchase_id")
    }),

    // The sliding-window aggregation as a stream (each event expands
    // into 2 window groups in streaming state).
    "q_stream_sliding" -> ((s, dir) => {
      val name = s"stream_sliding_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        graft.streaming.EventStreams.runToCompletion(
          graft.streaming.EventStreams.slidingCounts(
            graft.sources.EventSource.stream(s, dir)),
          name,
          org.apache.spark.sql.streaming.OutputMode.Complete())
      }.orderBy("window_start_s")
    }),

    // Streaming deduplication: the input stream is deliberately doubled
    // (two source instances over the same files), then
    // dropDuplicates("event_id") — Spark's stateful streaming dedup
    // operator — restores exactly-once rows in append mode; the batch
    // aggregate over the drained sink must equal plain SQL over the
    // original table. The state key is the event id, the shape of
    // at-least-once ingest dedup in production pipelines.
    "q_stream_dedup" -> ((s, dir) => {
      val name = s"stream_dedup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        val doubled = graft.sources.EventSource.stream(s, dir)
          .unionByName(graft.sources.EventSource.stream(s, dir))
        graft.streaming.EventStreams.runToCompletion(
          doubled.dropDuplicates("event_id")
            .select("event_id", "event_type", "value"),
          name,
          org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("event_type")
    }),

    // dropDuplicatesWithinWatermark — the bounded-state variant of
    // streaming dedup (Spark 3.5+): the dedup key is only held until
    // the watermark passes it, so state size tracks the lateness bound
    // instead of growing with total distinct keys — the production
    // at-least-once ingest dedup for unbounded streams (plain
    // dropDuplicates state never expires). Doubled source restored to
    // exactly-once, same oracle as the unbounded variant.
    "q_stream_dedup_within" -> ((s, dir) => {
      val name = s"stream_ddw_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        val doubled = graft.sources.EventSource.stream(s, dir)
          .unionByName(graft.sources.EventSource.stream(s, dir))
          .withWatermark("ts", "2 hours")
        graft.streaming.EventStreams.runToCompletion(
          doubled.dropDuplicatesWithinWatermark("event_id")
            .select("event_id", "event_type", "value"),
          name,
          org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("event_type")
    }),

    // Session windows AGAIN, but through the custom stateful operator
    // (flatMapGroupsWithState + EventTimeTimeout) instead of the
    // built-in session_window — the §2.10 construction for session
    // semantics built-ins can't express. Sessions merge in per-user
    // state; a session is emitted exactly once, when the watermark
    // proves it can no longer grow; the sentinel-advanced watermark
    // fires the timeout branch that flushes the tail. Must hash-match
    // the same gaps-and-islands oracle as the built-in variants.
    "q_stream_custom_session" -> ((s, dir) => {
      val name = s"stream_csess_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.withStatePartitions(s, graft.streaming.EventStreams.statePartitions(s, dir)) {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val sentinel = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(java.sql.Timestamp, Long, Double)]
        val real = graft.sources.EventSource.stream(s, dir)
          .select(col("ts"), col("user_id"), col("value"))
        val src = real.unionByName(sentinel.toDF().toDF("ts", "user_id", "value"))
          .withWatermark("ts", "1 hour")
        val sessions = graft.streaming.EventStreams.customSessions(src).toDF()
        // sentinel pre-start → single drain (see q_stream_session): the
        // timeout branch fires in the trailing no-data batch once the
        // watermark jumps past every open session
        sentinel.addData((java.sql.Timestamp.valueOf("2100-01-01 00:00:00"),
          999999999L, 0.0))
        graft.streaming.EventStreams.runToCompletion(sessions, name,
            org.apache.spark.sql.streaming.OutputMode.Append())
          .filter(col("user_id") =!= 999999999L)
          .orderBy("user_id", "session_start_s")
      }
    }),

    // The custom-state EWMA (EventStreams.ewmaLevels) under the same
    // oracle as its batch twin q_ewma_dyadic: bounded 10-entry ring +
    // counter per user, finalized by event-time timeout when the
    // far-future sentinel advances the watermark past every real event.
    "q_stream_ewma" -> ((s, dir) => {
      val name = s"stream_ewma_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.withStatePartitions(s,
        graft.streaming.EventStreams.statePartitions(s, dir)) {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val sentinel = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(java.sql.Timestamp, Long, Long, Double)]
        val real = graft.sources.EventSource.stream(s, dir)
          .select(col("ts"), col("user_id"), col("event_id"), col("value"))
        val src = real.unionByName(
            sentinel.toDF().toDF("ts", "user_id", "event_id", "value"))
          .withWatermark("ts", "1 hour")
        val levels = graft.streaming.EventStreams.ewmaLevels(src).toDF()
        // sentinel pre-start → single drain (see q_stream_custom_session)
        sentinel.addData((java.sql.Timestamp.valueOf("2100-01-01 00:00:00"),
          999999999L, 0L, 0.0))
        graft.streaming.EventStreams.runToCompletion(levels, name,
            org.apache.spark.sql.streaming.OutputMode.Append())
          .filter(col("user_id") =!= 999999999L)
          .orderBy("user_id")
      }
    }),

    // STREAM-STATIC join: the streaming event feed enriched against a
    // static dimension table. Stateless — the dim side broadcasts to
    // every executor once and each micro-batch joins map-side, so there
    // is NO join state to watermark and append mode emits immediately;
    // this is the 100 TB enrichment shape (dims broadcast, the stream
    // never shuffles for the join).
    "q_stream_static_join" -> ((s, dir) => {
      val name = s"stream_static_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        val dim = broadcast(s.read.parquet(s"$dir/nation.parquet")
          .select(col("n_nationkey").cast("bigint").as("nk"), col("n_name")))
        graft.streaming.EventStreams.runToCompletion(
          graft.sources.EventSource.stream(s, dir)
            .withColumn("nk", col("user_id") % 25)
            .join(dim, "nk")
            .select(col("n_name"), col("value")),
          name,
          org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("n_name")
    }),

    // LEFT OUTER stream-stream join: every click, with its in-window
    // purchases where they exist. Outer results only materialize when
    // the watermark proves no match can still arrive, so a drained
    // static file never flushes its tail — each side gets a control
    // MemoryStream and one far-future sentinel advances both watermarks
    // (global watermark = min over inputs), forcing every null-extended
    // row out. Unmatched markers are -1 (not NULL) so cross-engine null
    // ordering never matters.
    "q_stream_left_join" -> ((s, dir) => {
      val name = s"stream_lj_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.withStatePartitions(s, graft.streaming.EventStreams.statePartitions(s, dir)) {
        sentinelStreamJoin(s, dir, "left_outer", name, flush = true)
          .select(col("click_id"), col("user_id"),
            coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
            coalesce(unix_timestamp(col("purchase_ts")) -
              unix_timestamp(col("click_ts")), lit(-1L)).as("gap_s"))
          .orderBy("click_id", "purchase_id")
      }
    }),

    // FULL OUTER stream-stream join — the reconciliation shape: every
    // click AND every purchase exactly once, matched where the
    // time-range predicate holds, null-extended (as -1 markers)
    // otherwise. Completes the stream-join family (inner, left-outer,
    // left-semi, full-outer). Both unmatched directions only
    // materialize when the watermark proves no partner can still
    // arrive, so both sides get a control MemoryStream and one
    // far-future sentinel (flush = true); the helper's two-sided
    // sentinel filter then removes the sentinels themselves, including
    // the purchase-side null extension whose user_id is NULL.
    // (click_id, purchase_id) is a unique pair across all three row
    // shapes, so the verify ORDER BY is total.
    "q_stream_full_join" -> ((s, dir) => {
      val name = s"stream_fj_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.withStatePartitions(s, graft.streaming.EventStreams.statePartitions(s, dir)) {
        sentinelStreamJoin(s, dir, "full_outer", name, flush = true)
          .select(coalesce(col("click_id"), lit(-1L)).as("click_id"),
            coalesce(col("user_id"), col("p_user_id")).as("uid"),
            coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
            coalesce(unix_timestamp(col("purchase_ts")) -
              unix_timestamp(col("click_ts")), lit(-1L)).as("gap_s"))
          .orderBy("click_id", "purchase_id")
      }
    }),

    // Stream-stream LEFT SEMI join — "which clicks converted", emitting
    // each click AT MOST ONCE however many purchases match (the
    // attribution-filter shape; an inner join duplicates per match and
    // a downstream distinct would need its own state). Matched rows
    // emit eagerly in the micro-batch where the match arrives, so no
    // sentinel flush is needed (flush = false) — only ABSENCE results
    // (the outer variant's null extensions) wait on the watermark.
    // Oracle: EXISTS over the same time-range predicate.
    "q_stream_semi_join" -> ((s, dir) => {
      val name = s"stream_sj_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.drainTuned(s, dir) {
        sentinelStreamJoin(s, dir, "left_semi", name, flush = false)
          .select(col("click_id"), col("user_id"),
            unix_timestamp(col("click_ts")).as("click_s"))
          .orderBy("click_id")
      }
    }),

    // Session windows AS A STREAM in append mode — the one mode
    // session aggregation supports with finalized-only emission. Append
    // withholds every session still inside the watermark, so a drained
    // static file alone never emits its tail (memory-noted §2.9 gap);
    // the fix is the control-stream pattern: union the event stream
    // with a MemoryStream and, after the files drain, feed one sentinel
    // event far in the future. The single watermark operator sits above
    // the union, so the sentinel advances it past every real session
    // and append mode finalizes them all — exactly how production
    // pipelines close out sessions at stream end (or use
    // allowedLateness heartbeats). The sentinel's own session is
    // withheld/filtered.
    "q_stream_session" -> ((s, dir) => {
      val name = s"stream_session_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.withStatePartitions(s, graft.streaming.EventStreams.statePartitions(s, dir)) {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val sentinel = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(java.sql.Timestamp, Long, Double)]
        val real = graft.sources.EventSource.stream(s, dir)
          .select(col("ts"), col("user_id"), col("value"))
        val src = real.unionByName(sentinel.toDF().toDF("ts", "user_id", "value"))
        val sessions = graft.streaming.EventStreams.sessionCounts(src)
        // sentinel enqueued BEFORE start: one drain round — the
        // far-future event rides batch 0 with the file data and the
        // trailing no-data batch closes every session under the
        // advanced watermark (same shape as sentinelStreamJoin)
        sentinel.addData((java.sql.Timestamp.valueOf("2100-01-01 00:00:00"),
          999999999L, 0.0))
        graft.streaming.EventStreams.runToCompletion(sessions, name,
            org.apache.spark.sql.streaming.OutputMode.Append())
          .filter(col("user_id") =!= 999999999L)
          .orderBy("user_id", "session_start_s")
      }
    }),

    // CHAINED STATEFUL aggregations — two stateful operators in ONE
    // streaming query (windowed per-user counts feeding a per-window
    // rollup), the multi-stateful-operator support Spark grew in 3.5:
    // the first aggregation's append output (windows finalized by the
    // watermark) flows straight into a second stateful aggregation
    // keyed on the window, no intermediate sink — previously this
    // required two queries and a storage hop. Both operators share the
    // event-time watermark; the control-stream sentinel advances it
    // past every real window so the drained static file flushes both
    // stages (same pattern as q_stream_session), and the sentinel's
    // own far-future window filters out by its start epoch.
    "q_stream_chained_agg" -> ((s, dir) => {
      val name = s"stream_chain_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.EventStreams.withStatePartitions(s, graft.streaming.EventStreams.statePartitions(s, dir)) {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val sentinel = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(java.sql.Timestamp, Long)]
        val real = graft.sources.EventSource.stream(s, dir)
          .select(col("ts"), col("user_id"))
        val src = real.unionByName(sentinel.toDF().toDF("ts", "user_id"))
          .withWatermark("ts", "2 hours")
        val perUser = src
          .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        val perWindow = perUser
          .groupBy(col("w"))
          .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
          .select(unix_timestamp(col("w.start")).as("window_start_s"),
            col("n_users"), col("n_events"))
        sentinel.addData((java.sql.Timestamp.valueOf("2100-01-01 00:00:00"),
          999999999L))
        graft.streaming.EventStreams.runToCompletion(perWindow, name,
            org.apache.spark.sql.streaming.OutputMode.Append())
          .filter(col("window_start_s") < 4000000000L) // sentinel's window
          .orderBy("window_start_s")
      }
    }),

    // RANGE-frame window: per user, the trailing-1-hour event count and
    // value sum at every event — a true RANGE frame over epoch seconds
    // (peers at the same second share a frame), distinct from the ROWS
    // running frame of q_window_running.
    "q_window_range" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_s"))
        .rangeBetween(-3600, 0)
      ev(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", round(sum(col("value")).over(w), 2))
        .filter(col("event_id") % 20 === 0)
        .select("event_id", "user_id", "ts_s", "n_1h", "sum_1h")
        .orderBy("event_id")
    }),

    // Time-series resample + forward fill (LOCF): per user, an hourly
    // spine from first to last activity, the hour's last observed value
    // where one exists (max_by on (second, event_id) — deterministic),
    // and gaps carried forward with last(_, ignoreNulls). The
    // spine-join-fill shape is the standard gap-filling plan: one
    // generator, one shuffle on user_id, one window pass.
    "q_resample_locf" -> ((s, dir) => {
      val e = ev(s, dir)
        .filter(col("user_id") % 10 === 0)
        .select(col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"),
          (unix_timestamp(col("ts")) / 3600).cast("bigint").as("hour"),
          col("event_id"), col("value"))
      // combined key: lexicographic (second, event_id) as one BIGINT
      // (event_id < 10^7), because DuckDB's arg_max takes scalar keys
      val hourly = e.groupBy("user_id", "hour")
        .agg(max_by(col("value"),
          col("ts_s") * 10000000L + col("event_id")).as("hv"))
      val spine = e.groupBy("user_id")
        .agg(min(col("hour")).as("mh"), max(col("hour")).as("xh"))
        .select(col("user_id"),
          explode(sequence(col("mh"), col("xh"))).as("hour"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      spine.join(hourly, Seq("user_id", "hour"), "left_outer")
        .withColumn("is_gap", col("hv").isNull)
        .withColumn("v_filled", last(col("hv"), ignoreNulls = true).over(w))
        .select("user_id", "hour", "is_gap", "v_filled")
        .orderBy("user_id", "hour")
    }),

    // Gaps-and-islands: per user, maximal runs of consecutive ACTIVE
    // HOURS (hours with ≥1 event) — the classic streak analysis via the
    // row_number difference trick: hour − dense_rank is constant within
    // a run. Two window passes over one shuffle-by-user partition.
    "q_gaps_islands" -> ((s, dir) => {
      val hours = ev(s, dir)
        .select(col("user_id"),
          (unix_timestamp(col("ts")) / 3600).cast("bigint").as("hour"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("hour"))
      hours
        .withColumn("grp", col("hour") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("run_len"), min(col("hour")).as("run_start"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_runs"),
          max(col("run_len")).as("longest_run"),
          min(col("run_start")).as("first_hour"))
        .orderBy("user_id")
    }),

    // Conversion funnel: per user, the first click and the first
    // purchase AFTER that click (strictly ordered stages) — sequential
    // pattern matching as conditional aggregation, no self-join.
    "q_funnel" -> ((s, dir) => {
      val e = ev(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_s"), col("event_id"))
      val firstClick = e.filter(col("event_type") === "click")
        .groupBy("user_id")
        .agg(min(col("ts_s")).as("click_ts_s"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_s").as("p_ts_s"))
      firstClick.join(purchases, Seq("user_id"), "left_outer")
        .groupBy("user_id", "click_ts_s")
        .agg(min(when(col("p_ts_s") >= col("click_ts_s"), col("p_ts_s")))
          .as("first_purchase_ts_s"))
        .withColumn("converted", col("first_purchase_ts_s").isNotNull)
        .withColumn("secs_to_convert",
          col("first_purchase_ts_s") - col("click_ts_s"))
        .select("user_id", "click_ts_s", "first_purchase_ts_s",
          "converted", "secs_to_convert")
        .orderBy("user_id")
    }),

    // Position-based (U-shaped) multi-touch attribution — beyond
    // q_asof_join's single last-touch: every click/view in the 7 days
    // before a purchase shares the credit, 40%/40% to first and last
    // touch and the middle 20% split evenly (integer basis points,
    // remainder to the earliest middles, so the 10000 bp always sum
    // exactly and both engines agree bit-for-bit). Time is compared in
    // epoch MICROseconds (Spark unix_micros == DuckDB epoch_us on the
    // ns fixture). Shape: the purchase-touch pairing is a user-keyed
    // equi-join bounded by the 7-day window — per-user work tracks
    // user activity density, never the corpus — and both window
    // functions share one (purchase)-partitioned exchange.
    "q_attribution" -> ((s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase" &&
          col("event_id") % 5 === 0)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val touches = e.filter(col("event_type").isin("click", "view"))
        .select(col("event_id").as("touch_id"), col("user_id"),
          unix_micros(col("ts")).as("t_us"))
      val paired = purchases.join(touches, Seq("user_id"))
        .filter(col("t_us") < col("p_us") &&
          col("t_us") >= col("p_us") - lit(7L * 86400L * 1000000L))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("purchase_id").orderBy(col("t_us"), col("touch_id"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("purchase_id")
      paired
        .withColumn("trank", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("credit_bp", expr(
          """CASE WHEN n = 1 THEN 10000
            |     WHEN n = 2 THEN 5000
            |     WHEN trank = 1 OR trank = n THEN 4000
            |     ELSE 2000 div (n - 2) +
            |          (CASE WHEN trank - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END)
            |END""".stripMargin).cast("bigint"))
        .select(col("purchase_id"),
          col("trank").cast("bigint").as("touch_rank"),
          col("touch_id"), col("credit_bp"))
        .orderBy("purchase_id", "touch_rank")
    }),

    // RFM segmentation — the classic customer-scoring operator: per
    // user, recency (days since last purchase, anchored to the
    // corpus's max purchase time so the query is self-contained),
    // frequency (purchase count) and monetary value (exact cents),
    // each quintile-scored and composed into the 3-digit RFM segment.
    // Every quintile ordering carries user_id as the final tie-break:
    // bucket boundaries depend on the TOTAL order, so an
    // under-specified sort would let the two engines split ties
    // differently. Scale shape (r16 — replaces three unpartitioned
    // exact ntile(5) windows, each of which planned as a SINGLE task
    // sorting every user row): per dimension, an exact distributed
    // rank ([[RankOps.withGlobalRank]] — range-sliced, P-way parallel,
    // broadcast prefix offsets) and the SQL-standard ntile closed form
    // from (rank, n) — bit-identical buckets to the oracle's ntile(5)
    // because the rank is the exact global row_number over the same
    // unique total order. |users| grows with the corpus, so no stage
    // here may be keyed on nothing: the only remaining global sort is
    // the final presentation orderBy shared by every gated query.
    "q_rfm" -> ((s, dir) => {
      val perUser = ev(s, dir).filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(max(unix_timestamp(col("ts"))).as("last_s"),
          count(lit(1)).as("n_purch"),
          sum(round(col("value") * 100).cast("bigint")).as("cents"))
      // NOT cached: perUser is read by the anchor aggregate, rank 1's
      // boundary sampling, and rank 1's exchange — but its lineage is
      // one codegen aggregate over a page-cached scan, and the cache
      // barrier measured at parity-to-worse (2.41 vs 2.00 s mini-suite
      // median, neighbors normalized) — the cache-stops-paying rule
      val anchor = perUser.agg(max(col("last_s")).as("max_s"),
        count(lit(1)).as("n_users"))
      val base = perUser.crossJoin(broadcast(anchor))
        .withColumn("recency_days", expr("(max_s - last_s) div 86400"))
      val ranked = Seq[(String, Seq[org.apache.spark.sql.Column])](
        ("_rk_r", Seq(col("recency_days").desc, col("user_id").asc)),
        ("_rk_f", Seq(col("n_purch").asc, col("user_id").asc)),
        ("_rk_m", Seq(col("cents").asc, col("user_id").asc)))
        .foldLeft(base) { case (df, (rc, ord)) =>
          RankOps.withGlobalRank(df, rc, 32)(ord: _*)
        }
      ranked
        .withColumn("r_score", RankOps.ntileFromRank("_rk_r", "n_users", 5))
        .withColumn("f_score", RankOps.ntileFromRank("_rk_f", "n_users", 5))
        .withColumn("m_score", RankOps.ntileFromRank("_rk_m", "n_users", 5))
        .withColumn("segment",
          col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .select("user_id", "recency_days", "n_purch", "cents",
          "r_score", "f_score", "m_score", "segment")
        .orderBy("user_id")
    }),

    // Negative sampling for contrastive / recommendation training:
    // per user, deterministic candidate items ((user*37 + i*7) mod 100
    // — 7 coprime to the catalog size, so the 16 probes are distinct)
    // are rejected against the user's observed interactions (the JSON
    // props key doubles as the item id) and the first 4 survivors by
    // probe order become that user's negatives. The rejection is a
    // LEFT ANTI join keyed (user, item) — the candidate table is
    // |users| x 16, linear, and nothing ever enumerates the full
    // user x catalog cross product, which is the whole trick at
    // recommendation scale.
    "q_negative_sample" -> ((s, dir) => {
      val inter = ev(s, dir).select(col("user_id"),
          from_json(col("props"), lit("k INT")).getField("k")
            .cast("bigint").as("item"))
        .distinct()
      val cands = inter.select("user_id").distinct()
        .select(col("user_id"), explode(expr("sequence(0, 15)")).as("i"))
        .withColumn("item", (col("user_id") * 37 + col("i") * 7) % 100)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("i")
      cands.join(inter, Seq("user_id", "item"), "left_anti")
        .withColumn("neg_rank", row_number().over(w).cast("bigint"))
        .filter(col("neg_rank") <= 4)
        .select(col("user_id"), col("neg_rank"), col("item"))
        .orderBy("user_id", "neg_rank")
    }),

    // Train-in-batch, score-in-stream: the deployment shape of every
    // statistical quality/anomaly gate — thresholds (per-type median +
    // MAD, same derivation as q_anomaly_mad) are fit on the historical
    // batch, broadcast into the stream as a stateless stream-static
    // join, and each arriving event is flagged inline. No streaming
    // state at all: the model is the state, and refreshing it is a
    // batch job, not a stream migration. The drained flags must equal
    // the pure-batch SQL over the same table.
    "q_stream_anomaly" -> ((s, dir) => {
      val name = s"stream_anom_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val e = ev(s, dir).select(col("event_type"), col("value"))
      val med = e.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = e.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
        .groupBy("event_type")
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      val model = med.join(mad, "event_type")
      graft.streaming.EventStreams.drainTuned(s, dir) {
        graft.streaming.EventStreams.runToCompletion(
          graft.sources.EventSource.stream(s, dir)
            .join(broadcast(model), "event_type")
            .filter(abs(col("value") - col("med")) > lit(4.4478) * col("mad"))
            .select("event_id", "event_type", "value"),
          name,
          org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_outliers"),
          round(sum(col("value")), 2).as("sum_outlier_value"))
        .orderBy("event_type")
    }),

    // Retention cohort analysis — the product-analytics staple: users
    // cohorted by signup week, then each cohort's surviving share per
    // week offset. The events fixture compresses every user's first
    // activity into the corpus' first week, which would collapse the
    // analysis to one degenerate cohort — so the signup week is a
    // deterministic modulo-spread proxy, corpus_min_week + user_id % 4
    // (the stand-in for the signup date a real warehouse would join
    // from a users dim), and activity BEFORE a user's signup week is
    // excluded as pre-signup. Cohort membership = users with ≥1
    // post-signup active week. Weeks are integer epoch-week numbers
    // (unix div 604800 — no calendar/timezone arithmetic to disagree
    // across engines) and retention is per-myriad integer division.
    // Shape: one (user, week) distinct, a 1-row min broadcast, a
    // per-cohort distinct-user count, and a (cohort, offset) aggregate
    // — every shuffle keys on user or cohort, nothing quadratic, no
    // windows over the fact.
    "q_retention_cohort" -> ((s, dir) => {
      val uw = ev(s, dir)
        .select(col("user_id"),
          expr("CAST(unix_timestamp(ts) AS BIGINT) div 604800").as("wk"))
        .distinct()
      val w0 = uw.agg(min(col("wk")).as("wk0"))
      val act = uw.crossJoin(broadcast(w0))
        .withColumn("cw", col("wk0") + col("user_id") % 4)
        .filter(col("wk") >= col("cw"))
        .transform(QueryCaches.cache(_))
      val sizes = act.groupBy("cw")
        .agg(countDistinct(col("user_id")).as("n_cohort"))
      act.groupBy(col("cw"), (col("wk") - col("cw")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "cw")
        .select(col("cw").as("cohort_week"), col("week_offset"),
          col("n_cohort"), col("n_active"),
          expr("n_active * 10000 div n_cohort").as("retention_pm"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Robust per-group outlier detection via median absolute deviation
    // — the anomaly gate monitoring pipelines run where mean/stddev
    // breaks (the outliers being hunted poison the very moments a
    // z-score needs; the median and MAD have 50% breakdown). Two-pass
    // by construction: per-type median, deviations against it, per-type
    // MAD, flag |x − med| > 3·1.4826·MAD (the consistency constant
    // scaling MAD to a normal σ). Shape: two fact scans each with a
    // broadcast O(groups)-row attach + two tiny grouped percentile
    // aggs — no window over the fact, no global sort; the percentile
    // state buffers per GROUP, which is the bounded dimension here.
    "q_anomaly_mad" -> ((s, dir) => {
      val e = ev(s, dir).select(col("event_type"), col("value"))
      val med = e.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(max(col("med")), 4).as("med"),
          round(max(col("mad")), 4).as("mad"),
          sum(when(col("dev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("event_type")
    }),

    // EWMA smoothing, DYADIC-exact — the streaming-telemetry smoother
    // (per-user engagement level, rate baselines) computed without any
    // float pow: weights over the last 10 events are powers of two
    // (newest 2⁹ … oldest 2⁰), values floor-quantize at 10², so the
    // weighted numerator and the availability-adjusted denominator are
    // exact int64 and the per-mille level divides the SAME integers in
    // both engines. The frame is 10 explicit lag() columns (codegen'd;
    // a weighted frame aggregate can't express per-lag weights) over
    // ONE (user, ts, event_id) sort — the same single exchange any
    // per-user window pays; output is each user's latest smoothed
    // level, so state is one row per user at any scale.
    // Sign-robustness audit (round 10): qv = floor(value·100) uses
    // floor() BEFORE the bigint cast, so both engines quantize
    // identically for negative values (double→bigint CAST alone would
    // diverge: Spark truncates, DuckDB rounds — verified empirically);
    // the subsequent integer divisions agree too, because DuckDB's
    // integer `//` TRUNCATES toward zero exactly like Spark `div` and
    // the streaming twin's JVM `/` (SELECT -7 // 2 = -3 in DuckDB).
    // No shift needed — the three engines are bit-consistent for any
    // sign of `value`.
    "q_ewma_dyadic" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val base = ev(s, dir).select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("qv"))
      val lagged = (0 to 9).foldLeft(base) { (df, k) =>
        df.withColumn(s"l$k", lag(col("qv"), k).over(w))
      }
      val numSql = (0 to 9)
        .map(k => s"coalesce(l$k, 0L) * ${1L << (9 - k)}L").mkString(" + ")
      val denSql = (0 to 9)
        .map(k => s"(CASE WHEN l$k IS NOT NULL THEN ${1L << (9 - k)}L ELSE 0L END)")
        .mkString(" + ")
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      lagged.withColumn("ewma_pm", expr(s"($numSql) * 1000 div ($denSql)"))
        .withColumn("rn", row_number().over(wn))
        .filter(col("rn") === 1)
        .groupBy("user_id")
        .agg(max(col("ewma_pm")).as("last_ewma_pm"))
        .join(base.groupBy("user_id").agg(count(lit(1)).as("n_events")),
          Seq("user_id"))
        .select("user_id", "n_events", "last_ewma_pm")
        .orderBy("user_id")
    }),

    // First-order transition matrix over per-user event sequences —
    // the Markov-chain view behind journey modeling, next-event
    // prediction baselines, and funnel-dropoff diagnosis: for every
    // consecutive (prev → next) event-type pair within a user's
    // (ts, event_id)-ordered stream, the global count and a per-mille
    // row-conditional probability. One lag() over the same single
    // (user, ts, event_id) exchange every per-user window pays, then
    // one tiny hash aggregate over |types|² keys; probabilities are
    // integer per-mille over exact counts, so the matrix is bit-stable.
    "q_event_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val rowTotals = pairs.groupBy("prev_type")
        .agg(count(lit(1)).as("row_n"))
      pairs.groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
        .join(broadcast(rowTotals), "prev_type")
        .select(col("prev_type"), col("event_type").as("next_type"), col("n"),
          expr("n * 1000 div row_n").as("p_pm"))
        .orderBy("prev_type", "next_type")
    }),

    // Session windows: 30-minute inactivity gap per user.
    "q_window_session" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          unix_timestamp(col("w.start")).as("session_start_s"),
          (unix_timestamp(col("w.end")) - 1800).as("session_end_s"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start_s")),

    // OHLC bars — the classic time-series downsample: per (series,
    // hour), the first/last/extreme values. Open/close come from
    // first_value/last_value over the full-partition ROWS frame with a
    // (ts, event_id) tiebreak (deterministic cross-engine; plain
    // first()/min_by tie-break rules differ between engines). The
    // oracle orders by epoch_us(ts) — truncated exactly like Spark's
    // parquet ns→µs read — so two events in the same microsecond can
    // never order differently across engines (DuckDB keeps the ns the
    // window ORDER BY would otherwise see), then the
    // group-by collapses the constant-per-partition columns. The
    // window and the aggregate share the (series, bucket) hash key —
    // one exchange at any scale.
    "q_window_ohlc" -> ((s, dir) => {
      val base = ev(s, dir).select(
        (col("user_id") % 8).as("series"),
        (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("bigint")
          .as("window_start_s"),
        col("ts"), col("event_id"), col("value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("series"), col("window_start_s"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      base
        .withColumn("open_v", first(col("value")).over(w))
        .withColumn("close_v", last(col("value")).over(w))
        .groupBy("series", "window_start_s")
        .agg(count(lit(1)).as("n"),
          round(max(col("open_v")), 2).as("open"),
          round(max(col("value")), 2).as("high"),
          round(min(col("value")), 2).as("low"),
          round(max(col("close_v")), 2).as("close"))
        .orderBy("series", "window_start_s")
    }),
  )

  /** One oracle for BOTH EWMA surfaces (batch lag-plan and streaming
    * ring-state) — they compute the same exact integers by design.
    */
  private val ewmaOracleSql: String = {
    val lags = (0 to 9).map(k => s"lag(qv, $k) OVER w AS l$k")
      .mkString(",\n         ")
    val num = (0 to 9).map(k => s"coalesce(l$k, 0) * ${1L << (9 - k)}")
      .mkString(" + ")
    val den = (0 to 9)
      .map(k => s"(CASE WHEN l$k IS NOT NULL THEN ${1L << (9 - k)} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH base AS (
      |  SELECT user_id, ts, event_id, CAST(floor(value * 100) AS BIGINT) AS qv
      |  FROM events
      |),
      |lagged AS (
      |  SELECT user_id,
      |         $lags,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM base
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |last AS (
      |  SELECT user_id,
      |         CAST(($num) * 1000 // ($den) AS BIGINT) AS last_ewma_pm
      |  FROM lagged WHERE rn = 1
      |),
      |n AS (SELECT user_id, count(*) AS n_events FROM base GROUP BY user_id)
      |SELECT l.user_id, n.n_events, l.last_ewma_pm
      |FROM last l JOIN n USING (user_id) ORDER BY user_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_window_ohlc" ->
      """WITH base AS (
        |  SELECT user_id % 8 AS series,
        |         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
        |         ts, event_id, value
        |  FROM events
        |),
        |fl AS (
        |  SELECT series, window_start_s, value,
        |         first_value(value) OVER (PARTITION BY series, window_start_s
        |                                  ORDER BY epoch_us(ts), event_id
        |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open_v,
        |         last_value(value) OVER (PARTITION BY series, window_start_s
        |                                 ORDER BY epoch_us(ts), event_id
        |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_v
        |  FROM base
        |)
        |SELECT series, window_start_s, CAST(count(*) AS BIGINT) AS n,
        |       round(max(open_v), 2) AS open,
        |       round(max(value), 2) AS high,
        |       round(min(value), 2) AS low,
        |       round(max(close_v), 2) AS close
        |FROM fl GROUP BY series, window_start_s
        |ORDER BY series, window_start_s""".stripMargin,

    "q_window_tumbling" ->
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_seasonality" ->
      """WITH h AS (
        |  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hr,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2
        |),
        |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
        |      FROM h GROUP BY event_type)
        |SELECT h.event_type, hr, n, n * 24 * 1000 // total AS idx_pt
        |FROM h JOIN t ON h.event_type = t.event_type
        |ORDER BY h.event_type, hr""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         count(*) AS x
        |  FROM events GROUP BY 1, 2
        |),
        |cum AS (
        |  SELECT event_type, day, x,
        |         CAST(row_number() OVER
        |           (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
        |         CAST(sum(x) OVER
        |           (PARTITION BY event_type ORDER BY day) AS BIGINT) AS pre,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |         CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM daily
        |),
        |sc AS (SELECT *, abs(n * pre - i * tot) AS s_abs FROM cum),
        |pick AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY event_type ORDER BY s_abs DESC, day) AS rk
        |  FROM sc
        |)
        |SELECT event_type, n AS n_days, tot AS total,
        |       CAST(day AS VARCHAR) AS cp_day,
        |       CAST(s_abs AS BIGINT) AS cusum_peak,
        |       pre * 1000 // i AS mean_before_pt,
        |       (tot - pre) * 1000 // nullif(n - i, 0) AS mean_after_pt
        |FROM pick WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "q_seq_patterns" ->
      """WITH seq AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS tps
        |  FROM events GROUP BY user_id
        |),
        |nu AS (SELECT count(*) AS n_users FROM seq),
        |pats AS (
        |  SELECT DISTINCT user_id, tps[i] || '>' || tps[i + 1] AS pattern
        |  FROM seq,
        |       unnest(generate_series(1, greatest(len(tps) - 1, 0))) u(i)
        |)
        |SELECT pattern, count(*) AS support,
        |       CAST(count(*) * 1000 // n_users AS BIGINT) AS support_pm
        |FROM pats CROSS JOIN nu
        |GROUP BY pattern, n_users
        |HAVING count(*) * 4 >= n_users
        |ORDER BY support DESC, pattern""".stripMargin,

    "q_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |         lead(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER
        |           (PARTITION BY event_type, date_trunc('day', ts)
        |            ORDER BY ts, event_id)
        |           - CAST(floor(epoch(ts)) AS BIGINT) AS gap
        |  FROM events
        |)
        |SELECT event_type,
        |       CAST(length(bin(greatest(gap, 1))) AS BIGINT) AS gap_bits,
        |       count(*) AS n, min(gap) AS min_gap, max(gap) AS max_gap,
        |       CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, gap_bits""".stripMargin,

    "q_abandonment" ->
      """WITH np AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN ts END)
        |    OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS next_purchase
        |  FROM events
        |),
        |v AS (
        |  SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
        |         (next_purchase IS NULL OR
        |          CAST(floor(epoch(next_purchase)) AS BIGINT)
        |            - CAST(floor(epoch(ts)) AS BIGINT) > 3600) AS abandoned
        |  FROM np WHERE event_type = 'view'
        |)
        |SELECT day, count(*) AS n_views,
        |       CAST(sum(CASE WHEN abandoned THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_abandoned,
        |       CAST(sum(CASE WHEN abandoned THEN 1 ELSE 0 END) * 1000
        |         // count(*) AS BIGINT) AS abandon_pm
        |FROM v GROUP BY day ORDER BY day""".stripMargin,

    "q_ma_crossover" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         count(*) AS x
        |  FROM events GROUP BY 1, 2
        |),
        |sig AS (
        |  SELECT event_type, day,
        |         row_number() OVER w AS rn,
        |         CAST(sum(x) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS s3,
        |         CAST(sum(x) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS s7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |),
        |fl AS (
        |  SELECT *, s3 * 7 > s7 * 3 AS fast_above,
        |         lag(s3 * 7 > s7 * 3, 1) OVER w AS prev_above,
        |         lag(rn, 1) OVER w AS prev_rn
        |  FROM sig
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |)
        |SELECT event_type, CAST(day AS VARCHAR) AS day,
        |       s3 * 7 AS s3x7, s7 * 3 AS s7x3,
        |       CASE WHEN fast_above THEN 'golden' ELSE 'death' END AS direction
        |FROM fl
        |WHERE rn >= 8 AND prev_rn >= 7 AND fast_above <> prev_above
        |ORDER BY event_type, day""".stripMargin,

    "q_overdispersion" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         count(*) AS x
        |  FROM events GROUP BY 1, 2
        |),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(x) AS BIGINT) AS total,
        |         CAST(sum(x * x) AS BIGINT) AS sumsq
        |  FROM daily GROUP BY 1
        |)
        |SELECT event_type, n_days, total,
        |       (n_days * sumsq - total * total) * 1000 // (n_days * total)
        |         AS vmr_pm,
        |       CASE WHEN (n_days * sumsq - total * total) * 1000
        |                 // (n_days * total) > 1200 THEN 'overdispersed'
        |            WHEN (n_days * sumsq - total * total) * 1000
        |                 // (n_days * total) < 800 THEN 'underdispersed'
        |            ELSE 'poisson-like' END AS verdict
        |FROM m ORDER BY event_type""".stripMargin,

    "q_rolling_distinct" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         CAST(datediff('day', DATE '1970-01-01',
        |           CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS d
        |  FROM events
        |),
        |b AS (SELECT max(d) AS dmax FROM ud),
        |iv AS (
        |  SELECT d, lead(d, 1) OVER (PARTITION BY user_id ORDER BY d) AS nxt
        |  FROM ud
        |),
        |cov AS (
        |  SELECT unnest(generate_series(d,
        |           least(d + 6, least(coalesce(nxt - 1, d + 6), dmax)))) AS day
        |  FROM iv CROSS JOIN b
        |)
        |SELECT CAST(day AS BIGINT) AS day, count(*) AS wau
        |FROM cov GROUP BY 1 ORDER BY day""".stripMargin,

    "q_autocorrelation" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         count(*) AS x
        |  FROM events GROUP BY 1, 2
        |),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(x) AS BIGINT) AS sx
        |       FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT d.event_type, day, x - (sx // n) AS dv
        |  FROM daily d JOIN st USING (event_type)
        |),
        |ld AS (
        |  SELECT event_type, dv,
        |         lead(dv, 1) OVER (PARTITION BY event_type ORDER BY day) AS d1,
        |         lead(dv, 2) OVER (PARTITION BY event_type ORDER BY day) AS d2,
        |         lead(dv, 3) OVER (PARTITION BY event_type ORDER BY day) AS d3
        |  FROM dev
        |),
        |ag AS (
        |  SELECT event_type, CAST(sum(dv * dv) AS BIGINT) AS den,
        |         CAST(sum(dv * d1) AS BIGINT) AS n1,
        |         CAST(sum(dv * d2) AS BIGINT) AS n2,
        |         CAST(sum(dv * d3) AS BIGINT) AS n3
        |  FROM ld GROUP BY 1
        |),
        |up AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS lag_k, n1 AS num, den FROM ag
        |  UNION ALL
        |  SELECT event_type, CAST(2 AS BIGINT), n2, den FROM ag
        |  UNION ALL
        |  SELECT event_type, CAST(3 AS BIGINT), n3, den FROM ag
        |)
        |SELECT event_type, lag_k, num, den,
        |       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS acf
        |FROM up ORDER BY event_type, lag_k""".stripMargin,

    "q_transition_entropy" -> {
      // the same builder-side integers the Spark query broadcasts
      val vals = TextQueries.lnMyriadScaled.zipWithIndex
        .map { case (l, h) => s"($h,$l)" }.mkString(",")
      s"""WITH lntab(h, ln_p12) AS (VALUES $vals),
         |tr AS (
         |  SELECT event_type AS et_from,
         |         lead(event_type, 1) OVER (PARTITION BY user_id
         |                                   ORDER BY ts, event_id) AS et_to
         |  FROM events
         |),
         |tc AS (
         |  SELECT et_from, et_to, CAST(count(*) AS BIGINT) AS c
         |  FROM tr WHERE et_to IS NOT NULL GROUP BY et_from, et_to
         |),
         |m AS (
         |  SELECT et_from, CAST(sum(c) AS BIGINT) AS c_from
         |  FROM tc GROUP BY et_from
         |),
         |p AS (
         |  SELECT tc.et_from AS et_from, c_from,
         |         least(c * 10000 // c_from, 9999) AS p_pm
         |  FROM tc JOIN m ON tc.et_from = m.et_from
         |)
         |SELECT et_from, CAST(max(c_from) AS BIGINT) AS n_out,
         |       CAST(count(*) AS BIGINT) AS n_targets,
         |       CAST(sum(p_pm * ln_p12) // 10000 AS BIGINT) AS entropy_p12
         |FROM p JOIN lntab ON p_pm = h
         |GROUP BY et_from ORDER BY et_from""".stripMargin
    },

    "q_sax_motifs" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(datediff('day', DATE '1970-01-01',
        |           CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS d,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY event_type, 2
        |),
        |hist AS (
        |  SELECT event_type, c, CAST(count(*) AS BIGINT) AS nc
        |  FROM daily GROUP BY event_type, c
        |),
        |cum AS (
        |  SELECT event_type, c, nc,
        |         sum(nc) OVER (PARTITION BY event_type ORDER BY c
        |                       ROWS UNBOUNDED PRECEDING) AS cum,
        |         sum(nc) OVER (PARTITION BY event_type) AS m
        |  FROM hist
        |),
        |cuts AS (
        |  SELECT event_type,
        |         min(CASE WHEN cum >= (m * 1 + 3) // 4 THEN c END) AS q1,
        |         min(CASE WHEN cum >= (m * 2 + 3) // 4 THEN c END) AS q2,
        |         min(CASE WHEN cum >= (m * 3 + 3) // 4 THEN c END) AS q3
        |  FROM cum GROUP BY event_type
        |),
        |sym AS (
        |  SELECT daily.event_type AS event_type, d,
        |         CASE WHEN c <= q1 THEN 'a' WHEN c <= q2 THEN 'b'
        |              WHEN c <= q3 THEN 'c' ELSE 'd' END AS s
        |  FROM daily JOIN cuts ON daily.event_type = cuts.event_type
        |),
        |words AS (
        |  SELECT event_type,
        |         s || lead(s, 1) OVER (PARTITION BY event_type ORDER BY d)
        |           || lead(s, 2) OVER (PARTITION BY event_type ORDER BY d)
        |           AS motif
        |  FROM sym
        |)
        |SELECT event_type, motif, CAST(count(*) AS BIGINT) AS n_occ
        |FROM words WHERE motif IS NOT NULL
        |GROUP BY event_type, motif
        |HAVING count(*) >= 2
        |ORDER BY event_type, n_occ DESC, motif""".stripMargin,

    "q_growth_accounting" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         CAST(datediff('day', DATE '1970-01-01',
        |           CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS d
        |  FROM events
        |),
        |cl AS (
        |  SELECT d,
        |         CASE WHEN lag(d, 1) OVER (PARTITION BY user_id ORDER BY d)
        |                IS NULL THEN 'new'
        |              WHEN lag(d, 1) OVER (PARTITION BY user_id ORDER BY d)
        |                = d - 1 THEN 'retained'
        |              ELSE 'resurrected' END AS status
        |  FROM ud
        |),
        |byday AS (
        |  SELECT d, count(*) AS dau,
        |         CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_new,
        |         CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_retained,
        |         CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_resurrected
        |  FROM cl GROUP BY d
        |)
        |SELECT d, dau, n_new, n_retained, n_resurrected,
        |       CAST(coalesce(lag(dau, 1) OVER (ORDER BY d), 0) - n_retained
        |         AS BIGINT) AS n_churned
        |FROM byday ORDER BY d""".stripMargin,

    "q_survival_curve" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup' THEN ts END) AS su,
        |         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
        |         max(ts) AS last
        |  FROM events GROUP BY user_id
        |),
        |u AS (
        |  SELECT CASE WHEN fp >= su THEN CAST(datediff('day', CAST(su AS DATE),
        |           CAST(fp AS DATE)) AS BIGINT) END AS tte,
        |         CAST(datediff('day', CAST(su AS DATE), CAST(last AS DATE))
        |           AS BIGINT) AS ct
        |  FROM pu WHERE su IS NOT NULL
        |),
        |byday AS (
        |  SELECT coalesce(tte, ct) AS d,
        |         CAST(sum(CASE WHEN tte IS NOT NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_events,
        |         count(*) AS n_exits
        |  FROM u GROUP BY 1
        |),
        |nu AS (SELECT count(*) AS n_users FROM u),
        |r AS (
        |  SELECT d, n_events, n_exits, n_users,
        |         n_users - CAST(coalesce(sum(n_exits) OVER (ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS at_risk,
        |         CAST(sum(n_events) OVER (ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum_conv
        |  FROM byday CROSS JOIN nu
        |)
        |SELECT d, at_risk, n_events,
        |       CAST(n_exits - n_events AS BIGINT) AS n_censored,
        |       n_events * 1000 // at_risk AS hazard_pm,
        |       cum_conv, cum_conv * 1000 // n_users AS conv_pm
        |FROM r ORDER BY d""".stripMargin,

    "q_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         count(*) AS x
        |  FROM events GROUP BY 1, 2
        |),
        |r AS (
        |  SELECT event_type, day, x,
        |         list_sort(list(x) OVER (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        |  FROM daily
        |)
        |SELECT event_type, CAST(day AS VARCHAR) AS day, x,
        |       CAST(win[(len(win) + 1) // 2] AS BIGINT) AS med7,
        |       CAST(x * 1000 // win[(len(win) + 1) // 2] AS BIGINT) AS ratio_pm
        |FROM r ORDER BY event_type, day""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stream_user_totals" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_cdc_latest" ->
      """WITH ranked AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn,
        |         count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events
        |)
        |SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS last_s,
        |       event_id AS last_event_id, event_type AS last_event_type,
        |       value AS last_value, n_events
        |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_stream_topk" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type
        |ORDER BY n DESC, event_type LIMIT 3""".stripMargin,

    // ns-vs-µs note: ordering inside a user compares full-precision ns
    // in DuckDB vs µs-truncated in Spark; event timestamps are random
    // over a month, so sub-µs ordering collisions are not a concern
    "q_asof_join" ->
      """WITH tagged AS (
        |  SELECT event_id, user_id, ts,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
        |         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
        |         CASE WHEN event_type = 'click' THEN ts END AS click_ts
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |),
        |carried AS (
        |  SELECT *,
        |         last_value(click_id IGNORE NULLS) OVER w AS asof_click_id,
        |         last_value(click_ts IGNORE NULLS) OVER w AS asof_click_ts
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_p, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id AS purchase_id, user_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS purchase_ts_s,
        |       asof_click_id,
        |       CAST(floor(epoch(ts)) AS BIGINT)
        |         - CAST(floor(epoch(asof_click_ts)) AS BIGINT) AS gap_s
        |FROM carried WHERE is_p = 1 ORDER BY purchase_id""".stripMargin,

    "q_stream_dedup" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the watermark-bounded dedup restores the same exactly-once rows
    "q_stream_dedup_within" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_resample_locf" ->
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
        |         event_id, value
        |  FROM events WHERE user_id % 10 = 0
        |),
        |hourly AS (
        |  SELECT user_id, hour,
        |         arg_max(value, ts_s * 10000000 + event_id) AS hv
        |  FROM e GROUP BY user_id, hour
        |),
        |bounds AS (
        |  SELECT user_id, min(hour) AS mh, max(hour) AS xh FROM e GROUP BY user_id
        |),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(mh, xh)) AS hour FROM bounds
        |)
        |SELECT s.user_id, s.hour,
        |       h.hv IS NULL AS is_gap,
        |       last_value(h.hv IGNORE NULLS) OVER (
        |         PARTITION BY s.user_id ORDER BY s.hour
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM spine s
        |LEFT JOIN hourly h ON h.user_id = s.user_id AND h.hour = s.hour
        |ORDER BY s.user_id, s.hour""".stripMargin,

    "q_gaps_islands" ->
      """WITH hours AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour
        |  FROM events
        |),
        |runs AS (
        |  SELECT user_id, hour,
        |         hour - row_number() OVER (PARTITION BY user_id ORDER BY hour) AS grp
        |  FROM hours
        |),
        |agg AS (
        |  SELECT user_id, grp, count(*) AS run_len, min(hour) AS run_start
        |  FROM runs GROUP BY 1, 2
        |)
        |SELECT user_id, count(*) AS n_runs, max(run_len) AS longest_run,
        |       min(run_start) AS first_hour
        |FROM agg GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_anomaly" ->
      """WITH e AS (SELECT event_type, value FROM events),
        |med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM e GROUP BY event_type
        |),
        |mad AS (
        |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM e JOIN med m USING (event_type) GROUP BY e.event_type
        |)
        |SELECT e.event_type,
        |       count(*) AS n_outliers,
        |       round(sum(e.value), 2) AS sum_outlier_value
        |FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
        |WHERE abs(e.value - med.med) > 4.4478 * mad.mad
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_retention_cohort" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
        |  FROM events
        |),
        |w0 AS (SELECT min(wk) AS wk0 FROM uw),
        |act AS (
        |  SELECT u.user_id, u.wk, w0.wk0 + u.user_id % 4 AS cw
        |  FROM uw u, w0
        |  WHERE u.wk >= w0.wk0 + u.user_id % 4
        |),
        |sizes AS (
        |  SELECT cw, CAST(count(DISTINCT user_id) AS BIGINT) AS n_cohort
        |  FROM act GROUP BY cw
        |),
        |grid AS (
        |  SELECT cw, wk - cw AS week_offset, CAST(count(*) AS BIGINT) AS n_active
        |  FROM act GROUP BY 1, 2
        |)
        |SELECT g.cw AS cohort_week, g.week_offset, s.n_cohort, g.n_active,
        |       g.n_active * 10000 // s.n_cohort AS retention_pm
        |FROM grid g JOIN sizes s USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type, 1) OVER (PARTITION BY user_id
        |                                  ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |),
        |pairs AS (SELECT prev_type, event_type FROM seq WHERE prev_type IS NOT NULL),
        |cnt AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n
        |  FROM pairs GROUP BY 1, 2
        |),
        |rt AS (SELECT prev_type, count(*) AS row_n FROM pairs GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n,
        |       CAST(c.n * 1000 // r.row_n AS BIGINT) AS p_pm
        |FROM cnt c JOIN rt r ON r.prev_type = c.prev_type
        |ORDER BY c.prev_type, c.next_type""".stripMargin,

    "q_ewma_dyadic" -> ewmaOracleSql,

    // identical answer by construction: the streaming operator's ring +
    // timeout finalize computes the same integers as the batch lag plan
    "q_stream_ewma" -> ewmaOracleSql,

    "q_anomaly_mad" ->
      """WITH e AS (SELECT event_type, value FROM events),
        |med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM e GROUP BY event_type
        |),
        |dev AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
        |  FROM e JOIN med m USING (event_type)
        |),
        |mad AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY event_type
        |)
        |SELECT d.event_type, count(*) AS n,
        |       round(max(d.med), 4) AS med,
        |       round(max(a.mad), 4) AS mad,
        |       CAST(sum(CASE WHEN d.dev > 4.4478 * a.mad THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad a USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events
        |),
        |fc AS (
        |  SELECT user_id, min(ts_s) AS click_ts_s
        |  FROM e WHERE event_type = 'click' GROUP BY user_id
        |),
        |j AS (
        |  SELECT fc.user_id, fc.click_ts_s,
        |         min(CASE WHEN p.ts_s >= fc.click_ts_s THEN p.ts_s END) AS first_purchase_ts_s
        |  FROM fc LEFT JOIN e p
        |    ON p.user_id = fc.user_id AND p.event_type = 'purchase'
        |  GROUP BY fc.user_id, fc.click_ts_s
        |)
        |SELECT user_id, click_ts_s, first_purchase_ts_s,
        |       first_purchase_ts_s IS NOT NULL AS converted,
        |       first_purchase_ts_s - click_ts_s AS secs_to_convert
        |FROM j ORDER BY user_id""".stripMargin,

    "q_stream_semi_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_s
        |FROM events c
        |WHERE c.event_type = 'click'
        |  AND EXISTS (
        |    SELECT 1 FROM events p
        |    WHERE p.event_type = 'purchase'
        |      AND p.user_id = c.user_id
        |      AND p.ts >= c.ts
        |      AND p.ts <= c.ts + INTERVAL 1 HOUR)
        |ORDER BY click_id""".stripMargin,

    "q_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase' AND event_id % 5 = 0
        |),
        |t AS (
        |  SELECT event_id AS touch_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type IN ('click', 'view')
        |),
        |paired AS (
        |  SELECT p.purchase_id, t.touch_id, t.t_us
        |  FROM p JOIN t ON t.user_id = p.user_id
        |  WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - 604800000000
        |),
        |ranked AS (
        |  SELECT purchase_id, touch_id,
        |         row_number() OVER (PARTITION BY purchase_id
        |                            ORDER BY t_us, touch_id) AS trank,
        |         count(*) OVER (PARTITION BY purchase_id) AS n
        |  FROM paired
        |)
        |SELECT purchase_id, CAST(trank AS BIGINT) AS touch_rank, touch_id,
        |       CAST(CASE WHEN n = 1 THEN 10000
        |                 WHEN n = 2 THEN 5000
        |                 WHEN trank = 1 OR trank = n THEN 4000
        |                 ELSE 2000 // (n - 2) +
        |                      (CASE WHEN trank - 1 <= 2000 % (n - 2)
        |                            THEN 1 ELSE 0 END)
        |            END AS BIGINT) AS credit_bp
        |FROM ranked ORDER BY purchase_id, touch_rank""".stripMargin,

    "q_rfm" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_s,
        |         count(*) AS n_purch,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |),
        |rec AS (
        |  SELECT user_id, n_purch, cents,
        |         ((SELECT max(last_s) FROM pu) - last_s) // 86400 AS recency_days
        |  FROM pu
        |),
        |scored AS (
        |  SELECT user_id, recency_days, n_purch, cents,
        |         CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT)
        |           AS r_score,
        |         CAST(ntile(5) OVER (ORDER BY n_purch ASC, user_id) AS BIGINT)
        |           AS f_score,
        |         CAST(ntile(5) OVER (ORDER BY cents ASC, user_id) AS BIGINT)
        |           AS m_score
        |  FROM rec
        |)
        |SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
        |       CAST(n_purch AS BIGINT) AS n_purch, cents,
        |       r_score, f_score, m_score,
        |       r_score * 100 + f_score * 10 + m_score AS segment
        |FROM scored ORDER BY user_id""".stripMargin,

    "q_negative_sample" ->
      """WITH inter AS (
        |  SELECT DISTINCT user_id,
        |         CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS item
        |  FROM events
        |),
        |cands AS (
        |  SELECT u.user_id, i.i, (u.user_id * 37 + i.i * 7) % 100 AS item
        |  FROM (SELECT DISTINCT user_id FROM inter) u,
        |       unnest(generate_series(0, 15)) i(i)
        |),
        |negs AS (
        |  SELECT c.user_id, c.i, c.item FROM cands c
        |  WHERE NOT EXISTS (SELECT 1 FROM inter v
        |                    WHERE v.user_id = c.user_id AND v.item = c.item)
        |),
        |ranked AS (
        |  SELECT user_id, item,
        |         row_number() OVER (PARTITION BY user_id ORDER BY i) AS neg_rank
        |  FROM negs
        |)
        |SELECT user_id, CAST(neg_rank AS BIGINT) AS neg_rank, item
        |FROM ranked WHERE neg_rank <= 4 ORDER BY user_id, neg_rank""".stripMargin,

    "q_stream_stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |       c.user_id,
        |       CAST(floor(epoch(p.ts)) AS BIGINT)
        |         - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_s
        |FROM events c
        |JOIN events p
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,

    "q_stream_static_join" ->
      """SELECT n.n_name, count(*) AS n, round(sum(e.value), 2) AS sum_value
        |FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q_stream_left_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |       coalesce(p.event_id, -1) AS purchase_id,
        |       coalesce(CAST(floor(epoch(p.ts)) AS BIGINT)
        |         - CAST(floor(epoch(c.ts)) AS BIGINT), -1) AS gap_s
        |FROM events c
        |LEFT JOIN events p
        |  ON p.user_id = c.user_id AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |WHERE c.event_type = 'click'
        |ORDER BY click_id, purchase_id""".stripMargin,

    "q_stream_chained_agg" ->
      """WITH pu AS (
        |  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
        |         user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT window_start_s, count(*) AS n_users,
        |       CAST(sum(n) AS BIGINT) AS n_events
        |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_full_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'
        |),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id AS p_user_id,
        |         ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT coalesce(c.click_id, -1) AS click_id,
        |       coalesce(c.user_id, p.p_user_id) AS uid,
        |       coalesce(p.purchase_id, -1) AS purchase_id,
        |       coalesce(CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
        |         - CAST(floor(epoch(c.click_ts)) AS BIGINT), -1) AS gap_s
        |FROM c FULL JOIN p
        |  ON p.p_user_id = c.user_id
        | AND p.purchase_ts >= c.click_ts
        | AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,

    "q_stream_sliding" ->
      """WITH assigned AS (
        |  SELECT CAST(floor(epoch(ts) / 3600) * 3600 - off AS BIGINT) AS window_start_s,
        |         value
        |  FROM events CROSS JOIN (SELECT unnest([0, 3600]) AS off)
        |)
        |SELECT window_start_s, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
        |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_window_range" ->
      """WITH es AS (
        |  SELECT event_id, user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value
        |  FROM events
        |)
        |SELECT event_id, user_id, ts_s,
        |       count(*) OVER w AS n_1h,
        |       round(sum(value) OVER w, 2) AS sum_1h
        |FROM es
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |QUALIFY event_id % 20 = 0
        |ORDER BY event_id""".stripMargin,

    "q_json_props" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS min_k,
        |       max(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_window_sliding" ->
      """WITH assigned AS (
        |  SELECT CAST(floor(epoch(ts) / 3600) * 3600 - off AS BIGINT) AS window_start_s,
        |         value
        |  FROM events CROSS JOIN (SELECT unnest([0, 3600]) AS off)
        |)
        |SELECT window_start_s, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
        |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin,

    // gaps-and-islands sessionization: new session when the gap from
    // the previous event (per user) exceeds 30 minutes
    "q_window_session" -> SessionSql,

    // the streaming variant must converge to the identical batch
    // answer once the sentinel-advanced watermark finalizes every
    // session (append mode emits each exactly once)
    "q_stream_session" -> SessionSql,

    // the hand-rolled flatMapGroupsWithState sessionizer must agree too
    "q_stream_custom_session" -> SessionSql,
  )

  private lazy val SessionSql: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   > INTERVAL 30 MINUTE OR
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |),
      |sess AS (
      |  SELECT user_id, ts, value,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM ordered
      |)
      |SELECT user_id,
      |       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
      |       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end_s,
      |       count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start_s""".stripMargin
}
