package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the sampling step of
  * DeepWalk/node2vec-style graph embeddings: one fixed-length walk per
  * start node, each step choosing a pseudo-random out-neighbor. The walk
  * corpus then feeds skip-gram training exactly like a text corpus
  * ([[graft.text]]'s t73 skip-gram pairs run over it unchanged).
  *
  * Determinism IS the contract: step `t` of walk `w` picks neighbor index
  * `((w·A + t·B) mod P) mod degree(node)` with the
  * [[graft.sim.Ivf.PickP]] affine constants — pure modular arithmetic on
  * non-negative operands, so the whole corpus replays verbatim in a SQL
  * recursive CTE (engine-neutral, no RNG state), and a re-run on different
  * partitioning emits byte-identical walks.
  *
  * Plan shape: the adjacency list (distinct edges, per-source neighbor
  * ranks + degree) builds once — two shuffles, both at edge scale; each
  * step is ONE hash join of the frontier (walk-scale, one row per live
  * walk) against the adjacency on the current node, with the index pick
  * as a post-join filter predicate — no window, no blowup, walks at dead
  * ends (out-degree 0) simply stop. Total cost: `length` joins of
  * walk-scale × adjacency, the same per-round shape as PageRank.
  */
object Walks {

  /** One walk per distinct source node; emits (walk_id, step, node) with
    * step 0 = the start node. Walks reaching a node with no out-edges
    * terminate early (honest corpus — no self-loop padding).
    */
  def randomWalks(edges: DataFrame, length: Int): DataFrame = {
    require(length >= 1, s"walk length must be >= 1, got $length")
    import graft.sim.Ivf.{PickA, PickB, PickP}
    val byDst = Window.partitionBy(col("src")).orderBy(col("dst"))
    val adj = edges.select(col("src"), col("dst")).distinct()
      .withColumn("idx", row_number().over(byDst).cast("long") - 1)
      .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
    val start = adj.select(col("src").as("walk_id")).distinct()
      .select(col("walk_id"), lit(0L).as("step"), col("walk_id").as("node"))
    var walks = start
    var frontier = start
    for (t <- 1 to length) {
      // reduce walk_id mod P BEFORE the multiply (the Ivf.scala idiom) —
      // raw 64-bit node ids would overflow walk_id·A and break the
      // replays-verbatim contract
      val pick = pmod(
        pmod(pmod(col("walk_id"), lit(PickP)) * PickA +
          lit(t.toLong) * PickB, lit(PickP)),
        col("deg"))
      val next = frontier
        .join(adj, frontier("node") === adj("src"))
        .filter(col("idx") === pick)
        .select(col("walk_id"), lit(t.toLong).as("step"),
          col("dst").as("node"))
      walks = walks.unionByName(next)
      frontier = next
    }
    walks
  }

  /** Skip-gram (center, context) co-occurrence counts over a walk corpus —
    * the node-pair frequency table DeepWalk feeds to word2vec: within each
    * walk, every ordered pair of positions at distance 1..`window`
    * co-occurs once. The self-join is keyed on walk_id (walk-scale keys,
    * bounded ≤(length+1)² fan-out per walk — never quadratic in the
    * corpus), and the rollup runs with map-side partials on the node-pair
    * key. Top-k trims via orderBy+limit (TakeOrderedAndProject — per-
    * partition heaps, no global sort).
    */
  def skipgramPairs(walks: DataFrame, window: Int, k: Int): DataFrame = {
    require(window >= 1 && k >= 1, "window and k must be >= 1")
    val a = walks.select(col("walk_id"), col("step").as("__sa"),
      col("node").as("center"))
    val b = walks.select(col("walk_id"), col("step").as("__sb"),
      col("node").as("context"))
    a.join(b, Seq("walk_id"))
      .filter(col("__sa") =!= col("__sb") &&
        abs(col("__sa") - col("__sb")) <= window)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("center"), col("context"))
      .limit(k)
  }
}
