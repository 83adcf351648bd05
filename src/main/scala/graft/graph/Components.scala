package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weakly-connected components as a first-class graph report — the
  * membership map behind dedup clustering ([[graft.dedup.Clusters]]
  * runs the same propagation on near-dup pairs), entity resolution, and
  * "is this graph one blob or many islands" triage.
  *
  * Delegates the min-label propagation to
  * [[graft.dedup.Clusters.connectedComponents]] (one edge⋈label shuffle
  * per round, lineage truncated per iteration, O(1)-row convergence
  * probe) and emits the per-component report: component id (the minimum
  * member id — deterministic on any partitioning), node count, and the
  * id span. Directions and self-loops are normalized here so callers
  * hand in raw directed edges.
  */
object Components {

  /** One row per component over the nodes that appear in `edges`. */
  def report(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val pairs = edges
      .select(least(col("src"), col("dst")).as("id_a"),
        greatest(col("src"), col("dst")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    graft.dedup.Clusters.connectedComponents(pairs, maxIter)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("id")).as("min_node"), max(col("id")).as("max_node"))
  }
}
