package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA) — community detection, the third
  * leg of the graph family next to [[PageRank]] (importance) and
  * [[Triangles]] (cohesion). Each node starts labeled with itself; each
  * round, every node adopts the most frequent label among its NEIGHBORS
  * (previous round's labels — synchronous, so the result is a pure
  * function of the graph, not of execution order), ties broken to the
  * SMALLEST label. Raghavan et al. 2007's async coin-flips make runs
  * irreproducible; the sync+min-tie variant trades a little convergence
  * speed for a deterministic, engine-replayable answer — the same
  * determinism trade [[graft.dedup.Clusters]] makes for connected
  * components (min-label propagation is LPA where every neighbor label
  * wins; here it must be the neighborhood MODE).
  *
  * Plan per round: one join of the edge list against the |V|-scale label
  * frame (label frame broadcasts when small; at 10⁹ nodes both sides
  * hash-partition on the node — the same one-shuffle-per-iteration shape
  * as [[PageRank.ranks]]), one (node, label) rollup with map-side
  * partials, one per-node window over the CANDIDATE-LABEL-scale rows
  * (≤ degree per node). Rounds are FIXED (k hops of influence), not
  * run-to-convergence — no driver-side loop condition reads data.
  *
  * Self-loops drop (a node seconding its own label is noise);
  * directions symmetrize (community is an undirected notion); parallel
  * edges collapse to neighbor-SET semantics so a heavily duplicated
  * edge cannot stuff the ballot.
  */
object LabelPropagation {

  /** One row per non-isolated node: its community label after `rounds`
    * synchronous LPA rounds, and the community size.
    */
  def communities(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
    var lab = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    val byVotes = Window.partitionBy(col("a"))
      .orderBy(col("__c").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      lab = und.join(lab, und("b") === lab("node"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__rn", row_number().over(byVotes))
        .filter(col("__rn") === 1)
        .select(col("a").as("node"), col("label"))
    }
    lab.withColumn("community_size",
      count(lit(1)).over(Window.partitionBy(col("label"))))
  }
}
