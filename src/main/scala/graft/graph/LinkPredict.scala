package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbors link prediction — "which non-edges look most like
  * edges": friend/follow recommendation, knowledge-graph completion,
  * related-document suggestions over a similarity graph. Scores every
  * candidate pair by its common-neighbor count plus the integer-ppm
  * Jaccard of neighborhoods, and keeps the top-k.
  *
  * Candidates come from wedge enumeration (two-hop paths through a
  * shared center) — the same generator [[Triangles]] rides — so only
  * pairs with ≥ 1 common neighbor ever materialize; existing edges are
  * anti-joined out afterwards. Wedge count is Σ deg(c)², which a
  * single super-hub turns quadratic: `maxCenterDegree` excludes
  * centers above the cap (the standard estimator concession — a node
  * adjacent to everything certifies nothing about any pair; its
  * wedges are noise, and at data scale they are ALSO the entire cost).
  * The cap is surfaced in the signature, not buried: callers that
  * need exactness on a bounded graph set it above the max degree.
  * Top-k lands via TakeOrderedAndProject on the total order
  * (score desc, u, v) — deterministic, never a global sort.
  */
object LinkPredict {

  /** Top-k non-adjacent pairs by common-neighbor count over the
    * undirected graph of `edges` (`src`/`dst`; orientations derived,
    * self-loops dropped). Output: (u, v, common_neighbors,
    * jaccard_ppm) with u < v.
    */
  def commonNeighbors(edges: DataFrame, k: Int,
                      maxCenterDegree: Long = 10000L): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val centers = und.join(deg.filter(col("deg") <= maxCenterDegree)
      .select(col("node")), col("src") === col("node"))
      .select(col("src").as("c"), col("dst").as("n"))
    val wedges = centers.as("l").join(centers.as("r"), Seq("c"))
      .filter(col("l.n") < col("r.n"))
      .select(col("l.n").as("u"), col("r.n").as("v"))
    val cn = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"))
      .join(und, col("u") === col("src") && col("v") === col("dst"),
        "left_anti")
    cn.join(deg.select(col("node").as("u"), col("deg").as("__du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("__dv")), Seq("v"))
      .select(col("u"), col("v"), col("common_neighbors"),
        call_function("div", col("common_neighbors") * lit(1000000L),
          col("__du") + col("__dv") - col("common_neighbors"))
          .as("jaccard_ppm"))
      .orderBy(col("common_neighbors").desc, col("u"), col("v"))
      .limit(k)
  }
}
