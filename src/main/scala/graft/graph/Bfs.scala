package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance — "how far is every node from the
  * seed set": reachability audits, influence radius, cache-warm-set
  * construction, contamination blast-radius reports. Completes the
  * iterative-graph family ([[PageRank]] / [[Hits]] /
  * [[LabelPropagation]] / [[KCore]]) with the one primitive they all
  * presuppose but none emits: shortest unweighted distance.
  *
  * Plan: frontier-relaxation rounds. `reached` holds (node, hop) for
  * every node with a settled distance; each round joins the PREVIOUS
  * round's frontier (only the newly settled nodes — not the whole
  * reached set) against the edge list, anti-joins out already-settled
  * targets, and min-aggregates duplicate relaxations. One shuffle per
  * round on the node key, frontier-scale not graph-scale work after
  * round 1, `localCheckpoint` truncating lineage each round exactly as
  * [[KCore.decompose]] does. Rounds are bounded by `maxHops` — at
  * 100 TB the useful radius is small (social graphs: ~6), and an
  * unconverged cutoff is explicit in the output (missing node = not
  * reached within `maxHops`).
  */
object Bfs {

  /** Hop distances from `seeds` over undirected `edges` (`src`/`dst`
    * columns; both orientations derived here). Output: (node, hop)
    * for every node reachable within `maxHops`; seeds emit hop 0.
    */
  def hops(spark: SparkSession, edges: DataFrame, seeds: Seq[Long],
           maxHops: Int): DataFrame = {
    import spark.implicits._
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var reached = seeds.distinct.toDF("node")
      .withColumn("hop", lit(0L)).localCheckpoint()
    var frontier = reached
    var hop = 0
    // loop shuffles sized from the measured (checkpointed) edge count —
    // see AdaptiveIter; no-op at data scale
    val nE = und.count()
    graft.ops.AdaptiveIter.sizedRounds(spark, nE) {
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier.join(und, col("node") === col("src"))
        .select(col("dst").as("node"))
        .join(reached, Seq("node"), "left_anti")
        .distinct()
        .withColumn("hop", lit(hop.toLong))
        .localCheckpoint()
      reached = reached.unionAll(next).localCheckpoint()
      frontier = next
    }
    }
    reached
  }
}
