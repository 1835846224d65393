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
    for (_ <- 1 to rounds) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nbr_label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nbr_label")).as("min_nbr"))
      labels = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("min_nbr"), col("label"))).as("label"))
    }
    labels
  }
}
