package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed global rank — the scale-safe replacement for an
  * unpartitioned `row_number()`/`ntile()` window (which plans as ONE
  * task sorting every row while the rest of the cluster idles; the
  * q_rfm weak-flag from the round-15 verdict).
  *
  * Shape: range-repartition on the order keys (P slices), local
  * `row_number` within each slice (window keyed by slice id — P-way
  * parallel), then add each slice's prefix offset. The offsets come
  * from the bounded P-row slice-count frame via a broadcast triangle
  * self-join (b.pid < a.pid), NOT a window — so the physical plan
  * contains no empty-partition-spec Window node at all, which is what
  * the PlanSweep global-window audit pins.
  *
  * Correctness notes:
  *  - Ranks are exact for ANY slice boundary choice: range
  *    partitioning guarantees every row in slice i orders before every
  *    row in slice i+1, and local row_number + prefix offset is then
  *    the global row_number. The caller must make the total order
  *    unique (tie-break column) for cross-engine determinism — same
  *    contract as the window it replaces.
  *  - `spark_partition_id()` is captured in a Project immediately
  *    above the range exchange; the two consumers of `ranged` (main
  *    frame and slice counts) canonicalize to the same exchange, so
  *    ReuseExchange computes the range shuffle once and both sides see
  *    identical pids. AQE never coalesces an explicit repartition, and
  *    even a contiguous merge would preserve the slice-order property.
  *  - Empty slices (|df| < parts) simply never appear in the count
  *    frame; absent pids contribute 0 to every prefix, which is
  *    correct.
  */
object RankOps {

  def withGlobalRank(df: DataFrame, rankCol: String, parts: Int)
                    (order: Column*): DataFrame = {
    val pid = rankCol + "_pid"
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn(pid, spark_partition_id())
    val counts = ranged.groupBy(col(pid)).agg(count(lit(1)).as("_n"))
    // prefix offsets over the bounded (<= parts)-row frame: triangle
    // self-join instead of a global window — O(parts^2) pairs, flat at
    // any data scale, and keeps the plan free of single-task windows.
    val offs = counts.as("a")
      .join(broadcast(counts.as("b")),
        col(s"b.$pid") < col(s"a.$pid"), "left")
      .groupBy(col(s"a.$pid").as(pid))
      .agg(coalesce(sum(col("b._n")), lit(0L)).as("_off"))
    val local = row_number().over(
      Window.partitionBy(pid).orderBy(order: _*))
    ranged.join(broadcast(offs), pid)
      .withColumn(rankCol, (col("_off") + local).cast("bigint"))
      .drop(pid, "_off")
  }

  /** Closed-form `ntile(k)` bucket from an exact 1-based rank `rk`
    * over `n` rows (SQL-standard split: the first n mod k buckets get
    * one extra row). `rk`/`n` must be BIGINT column names/expressions
    * valid in `expr`. The `greatest(..,1)` guards the n < k case where
    * the floor bucket size is 0 (the branch is then unreachable, but
    * CASE arms are codegen'd unconditionally under whole-stage).
    */
  def ntileFromRank(rk: String, n: String, k: Int): Column = expr(
    s"""CAST(CASE
       |  WHEN $rk <= ($n % $k) * (($n div $k) + 1)
       |  THEN ($rk - 1) div (($n div $k) + 1) + 1
       |  ELSE ($n % $k) +
       |       (($rk - ($n % $k) * (($n div $k) + 1) - 1)
       |         div greatest($n div $k, 1)) + 1
       |END AS BIGINT)""".stripMargin)
}
