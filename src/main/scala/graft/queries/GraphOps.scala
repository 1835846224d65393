package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared distributed-graph building blocks for the dedup-clustering
  * queries (content-hash graph in DedupQueries, embedding-similarity
  * graph in SimilarityQueries).
  */
object GraphOps {

  /** Connected components by iterative min-label propagation — the
    * large-star/small-star shape: each round is one shuffle-join
    * (label ← min(label, neighbor labels)); no driver-side graph state.
    * `rounds` must cover the component diameter; callers cache `edges`
    * when its lineage is expensive (the final plan references it once
    * per round).
    *
    * @param nodes (id)        one row per vertex
    * @param edges (src, dst)  DIRECTED rows — pass both orientations
    *                          for an undirected graph
    * @return (id, label) with label = component minimum after `rounds`
    */
  def minLabelPropagate(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    var labels = nodes.select(col("id"), col("id").as("label"))
    for (_ <- 1 to rounds) labels = propagateOnce(labels, edges)
    labels
  }

  private def propagateOnce(labels: DataFrame, edges: DataFrame): DataFrame = {
    val nbrMin = edges
      .join(labels.select(col("id").as("dst"), col("label").as("nbr_label")), "dst")
      .groupBy(col("src").as("id"))
      .agg(min(col("nbr_label")).as("min_nbr"))
    labels.join(nbrMin, Seq("id"), "left_outer")
      .select(col("id"),
        least(col("label"), coalesce(col("min_nbr"), col("label"))).as("label"))
  }

  /** Min-label propagation TO FIXPOINT — for graphs whose component
    * diameter is not known in advance (e.g. a similarity graph). Each
    * round materializes the new labels (persist + one aggregate
    * action) and stops when Σ label is unchanged: labels only ever
    * decrease, and every change strictly decreases one label, so a
    * stable sum IS the fixpoint (the sum runs in DECIMAL(38) — an
    * id-sum can overflow BIGINT at full scale). Intermediate rounds
    * unpersist eagerly; the returned frame is registered with
    * [[QueryCaches]] for harness release. Frontier-optimized variants
    * (large-star/small-star) drop in here if diameters grow beyond
    * `maxRounds`.
    */
  def minLabelPropagateToFixpoint(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 20): DataFrame = {
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head()
        .getDecimal(0)
    var labels = nodes.select(col("id"), col("id").as("label")).persist()
    var prevSum = labelSum(labels)
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val next = propagateOnce(labels, edges).persist()
      val s = labelSum(next) // materializes `next`; prior round now droppable
      labels.unpersist(blocking = false)
      labels = next
      rounds += 1
      if (s.compareTo(prevSum) == 0) done = true else prevSum = s
    }
    QueryCaches.cache(labels)
  }
}
