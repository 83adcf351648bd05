package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (the fixed-k cut): iteratively peel every node
  * whose degree is below `k` until no node falls under the floor; what
  * survives is the maximal subgraph with minimum degree ≥ k — the
  * standard "dense backbone" extract (spam-farm and community seeding,
  * influencer filtering, robustness analysis) that a degree filter
  * alone gets wrong, because removing one low-degree node drags its
  * neighbors under the floor transitively.
  *
  * Semantics: input edges are taken UNDIRECTED (symmetrized + deduped,
  * self-loops dropped, same normalization as [[Triangles]]); output is
  * the surviving nodes with their degree inside the k-core.
  *
  * Plan (the 100 TB posture, mirrored from [[graft.dedup.Clusters]]):
  * each peel round is ONE degree rollup (map-side partial count on the
  * src key) plus TWO semi joins re-filtering the edge list — all plain
  * equi shuffles on node keys, nothing quadratic in degree, no
  * driver-side graph. Rounds run a FIXED `maxRounds` chain: peeling is
  * idempotent at fixpoint, so extra rounds cannot change the result —
  * which keeps the plan static (no per-round driver action deciding
  * convergence) and makes the DuckDB oracle an exact unrolled replay.
  * Production graphs with adversarial diameters would add Clusters'
  * O(1)-row convergence probe and early-exit instead of trusting a
  * round budget; lineage is truncated per round via `localCheckpoint`
  * (a reliable-storage `checkpoint` on a real cluster — SCALE.md) so
  * the plan does not grow with rounds.
  */
object KCore {

  def decompose(edges: DataFrame, k: Int, maxRounds: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val Seq(srcName, dstName) = edges.columns.toSeq.take(2)
    // symmetrize once: every undirected edge appears as both (u,v) and
    // (v,u), so "degree" is one groupBy on the first endpoint
    val und = edges
      .select(least(col(srcName), col(dstName)).as("u"),
        greatest(col(srcName), col(dstName)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    var cur = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = false)
    for (_ <- 1 to maxRounds) {
      val alive = cur.groupBy("src").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("src").as("node"))
      cur = cur
        .join(alive.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(eager = false)
    }
    cur.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
      // the LAST peel decides on the final round's degrees too — without
      // this a node could survive the round-N edge filter yet sit below
      // k after its neighbors were cut in that same round
      .filter(col("core_degree") >= k)
  }
}
