package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank (Page et al. 1999) over an edge list, in the engine-exact
  * integer idiom: ranks live in micro-units (1.0 → 1 000 000), per-edge
  * contributions are integer floor-divisions of the source rank by its
  * out-degree, and the damping step is `150000 + 850·Σcontrib DIV 1000` —
  * every operation is exact 64-bit integer arithmetic, so the fixed-point
  * after any number of iterations is bit-identical on any engine and any
  * partitioning (a float formulation's Σcontrib is partial-order-dependent
  * the moment two contributions differ in exponent). Web-curation use: rank
  * crawl domains (t45's eTLD+1 output is the natural node set) to
  * prioritize fetch/refresh budgets.
  *
  * Plan shape per iteration: ONE shuffle (the contribution rollup on dst).
  * Edges are normalized once (distinct, self-loops dropped, out-degrees
  * attached) and CACHED — the iteration loop re-reads this frame, never the
  * raw input. The ranks⋈edges join keys both sides on the source node, so
  * co-partitioning carries across iterations; at web scale the edge frame
  * is the 100 TB side and stays put (bucketed by src on disk in a real
  * deployment — [[graft.io.Sinks]] bucketed writes), while the rank frame —
  * O(nodes) — shuffles to meet it. Dangling nodes (no out-edges) keep
  * receiving rank but leak their own mass by DEFAULT (the classic
  * simplification, and the faithful g1 contract); pass
  * `redistributeDangling = true` for the paper's stochastic-matrix patch —
  * each round's dangling mass shared to all nodes as one integer-exact
  * 1-row broadcast (crawl graphs are dangling-heavy, so crawl-budget
  * ranking wants it on; g16's oracle replays it).
  *
  * Iterations chain LAZILY (each is join + agg over the cached edge frame);
  * for the fixed small iteration counts of ranking jobs (5–20) the plan
  * stays comfortably analyzable — past ~30, callers should
  * `localCheckpoint` the rank frame every ~10 rounds (the
  * [[graft.dedup.Clusters]] lineage-cut precedent).
  *
  * Overflow: Σ of ALL rank mass is ≤ nodes·10⁶ plus damping additions
  * bounded by the same order; `850·Σincoming` therefore stays < 2⁶³ up to
  * ~10¹² nodes — beyond any real node set.
  */
object PageRank {

  /** One row per node: `node`, `rank_micro` after `iterations` rounds.
    *
    * @param edges two-column frame (src, dst); duplicates and self-loops
    *              are dropped here, so callers can feed raw link lists
    * @param redistributeDangling apply the paper's stochastic-matrix patch:
    *        each round, the mass held by DANGLING nodes (no out-edges) is
    *        shared to every node — `share = Σdangling rank DIV nNodes`
    *        enters the damped term alongside the edge contributions,
    *        integer-exact. Default OFF: the reference-faithful variant
    *        leaks dangling mass (the g1 contract and its oracle). Real
    *        crawl graphs are dangling-HEAVY (the un-fetched frontier), so
    *        crawl-budget ranking wants this on — g16's oracle replays the
    *        redistributed iteration exactly. Costs per round: one 1-row
    *        broadcast (the share) and one aggregate over the rank frame;
    *        because that makes each round consume the previous ranks
    *        TWICE, the loop localCheckpoints every round to keep the plan
    *        linear in iterations (lazy chaining would double the tree per
    *        round — the connected-components lineage hazard squared).
    */
  def ranks(edges: DataFrame, iterations: Int,
            dampingPermille: Int = 850,
            redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0, 1000], got $dampingPermille")
    val Seq(srcName, dstName) = edges.columns.toSeq.take(2)
    // the deduped edge list is CACHED before anything derives from it:
    // eDeg is `e ⋈ e.groupBy` — two references — and nodes is two more,
    // so an uncached `e` re-runs the caller's whole edge-derivation plan
    // up to 4× (for pipe_webgraph that is the full HTML link extraction;
    // measured ~2× the query wall at sf10). Edge-scale memory: the
    // distinct pair list, far below the derivation's input.
    val e = edges
      .select(col(srcName).as("src"), col(dstName).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().cache()
    val deg = e.groupBy("src").agg(count(lit(1)).as("__outdeg"))
    val eDeg = e.join(deg, "src").cache()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().cache()
    val base = 1000000L - dampingPermille * 1000L
    if (!redistributeDangling) {
      var ranks = nodes.withColumn("rank_micro", lit(1000000L))
      for (_ <- 1 to iterations) {
        val contribs = eDeg
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst"), expr("rank_micro DIV __outdeg").as("__c"))
          .groupBy("dst").agg(sum(col("__c")).as("__in"))
        ranks = nodes
          .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (lit(base) +
              expr(s"$dampingPermille * coalesce(__in, 0L) DIV 1000"))
              .as("rank_micro"))
      }
      ranks
    } else {
      // dangling flag rides WITH the rank frame (computed once) so the
      // per-round dangling-mass aggregate needs no extra join
      val flagged = nodes
        .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), col("__outdeg").isNull.as("__dangling"))
        .cache()
      val nNodes = flagged.agg(count(lit(1)).as("__n"))
      var ranks = flagged.withColumn("rank_micro", lit(1000000L))
      var prevCp: Option[DataFrame] = None
      // this branch checkpoints per round (actions inside the loop), so
      // its shuffles can be sized from the measured edge count — the
      // count doubles as the eDeg cache fill, at full parallelism, before
      // the flip (see AdaptiveIter; no-op at data scale)
      val nE = eDeg.count()
      graft.ops.AdaptiveIter.sizedRounds(edges.sparkSession, nE) {
      for (_ <- 1 to iterations) {
        val contribs = eDeg
          .join(ranks.select(col("node").as("src"), col("rank_micro")), "src")
          .select(col("dst"), expr("rank_micro DIV __outdeg").as("__c"))
          .groupBy("dst").agg(sum(col("__c")).as("__in"))
        val share = broadcast(
          ranks.filter(col("__dangling"))
            .agg(coalesce(sum("rank_micro"), lit(0L)).as("__dm"))
            .crossJoin(nNodes)
            .select(expr("__dm DIV __n").as("__share")))
        val next = flagged
          .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .crossJoin(share)
          .select(col("node"), col("__dangling"),
            (lit(base) + expr(s"$dampingPermille * " +
              "(coalesce(__in, 0L) + __share) DIV 1000"))
              .as("rank_micro"))
        val cp = next.localCheckpoint(true) // eager: cut the doubled lineage
        prevCp.foreach(graft.dedup.Clusters.dropCheckpointBlocks)
        prevCp = Some(cp)
        ranks = cp
      }
      }
      ranks.select("node", "rank_micro")
    }
  }

  /** Personalized PageRank (the topic-sensitive variant, Haveliwala
    * 2002): the restart mass lands ONLY on the seed set, so rank
    * measures proximity to the seeds rather than global centrality —
    * "expand this seed list" for crawl frontiers, related-entity
    * retrieval, trust propagation from vetted sources. Same integer
    * idiom and same one-shuffle-per-iteration plan as [[ranks]]; the
    * only deltas are the init vector (10⁶ micro on seeds, 0
    * elsewhere) and the damping step's base term, which is gated on
    * seed membership (each seed restarts with the full
    * `(1000−d)·1000` micro — the per-seed-teleport formulation, so
    * total restart mass is |seeds|·base and stays integer-exact
    * without dividing the base among seeds). Nodes the seeds can't
    * reach hold rank 0 forever — the output is droppable to the
    * reached set by a trivial filter, emitted here in full for
    * audit symmetry with [[ranks]].
    */
  def personalized(edges: DataFrame, seeds: Seq[Long], iterations: Int,
                   dampingPermille: Int = 850): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(seeds.nonEmpty, "need at least one seed")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0, 1000], got $dampingPermille")
    val Seq(srcName, dstName) = edges.columns.toSeq.take(2)
    val e = edges
      .select(col(srcName).as("src"), col(dstName).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("__outdeg"))
    val eDeg = e.join(deg, "src").cache()
    val seedSet = seeds.distinct.toSet
    val isSeed = col("node").isInCollection(seedSet)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().cache()
    val base = 1000000L - dampingPermille * 1000L
    var ranks = nodes.withColumn("rank_micro",
      when(isSeed, lit(1000000L)).otherwise(lit(0L)))
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank_micro DIV __outdeg").as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__in"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (when(isSeed, lit(base)).otherwise(lit(0L)) +
            expr(s"$dampingPermille * coalesce(__in, 0L) DIV 1000"))
            .as("rank_micro"))
    }
    ranks
  }
}
