package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) — the directed-importance
  * pair PageRank collapses into one number: an AUTHORITY is pointed at
  * by good hubs, a HUB points at good authorities. On a citation,
  * link, or supplier graph the two roles are genuinely different
  * answers, which is why the graph family carries both ([[PageRank]] =
  * stationary importance, HITS = role-specific importance,
  * [[Triangles]] = cohesion, [[LabelPropagation]] = community).
  *
  * Exact integer: scores live in ppm of the per-round MAXIMUM (the
  * standard ∞-norm normalization, integerized): each round computes
  * `a(n) = Σ h(m) over in-edges`, rescales to `a·10⁶ DIV max(a)`, then
  * `h(n) = Σ a(m) over out-edges` (the fresh authorities — the classic
  * sequential update), rescaled likewise. Sums stay < |V|·10⁶ —
  * int64-safe to ~9×10¹² nodes; no float norm ever exists.
  *
  * Plan per round: two edge⋈score joins (score frame keyed on node —
  * the PageRank one-shuffle-per-iteration shape; broadcast when small)
  * + two 1-row max aggregates broadcast back. Rounds FIXED — no
  * driver-side convergence read. Nodes with no in-edges hold authority
  * 0 (never null), mirrored for hubs.
  */
object Hits {

  def hubsAndAuthorities(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // eager checkpoint: e is referenced twice per round (the a- and
    // h-step joins), and lazily it would re-run the upstream edge
    // construction (scan + union + distinct) on every reference
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    def rescale(df: DataFrame, c: String): DataFrame = {
      val m = df.agg(max(col(c)).as("__m"))
      df.crossJoin(broadcast(m))
        .select(col("node"),
          when(col("__m") > 0,
            call_function("div", col(c) * 1000000L, col("__m")))
            .otherwise(lit(0L)).as(c))
    }
    var scores = nodes.select(col("node"),
      lit(1000000L).as("authority_ppm"), lit(1000000L).as("hub_ppm"))
    // superseded rounds' checkpoint blocks freed in ONE batch after the
    // loop (the round-10 Clusters idiom): per-round unpersist measured
    // 1.6× slower there (block-manager churn against in-flight jobs),
    // while never freeing pins one node-scale frame per round for the
    // query lifetime — the storage-crowding hazard Bench.dropAllBlocks
    // documents. The returned frame is never dropped.
    val superseded = scala.collection.mutable.ArrayBuffer[DataFrame]()
    // loop shuffles sized from the measured edge count (cheap: reads the
    // checkpoint just materialized) — see AdaptiveIter; rounds here are
    // latency-bound at test scale, untouched at data scale
    val nE = e.count()
    graft.ops.AdaptiveIter.sizedRounds(edges.sparkSession, nE) {
    for (_ <- 1 to rounds) {
      val a = nodes.join(
          e.join(scores.select(col("node"), col("hub_ppm")),
            e("src") === scores("node"))
            .groupBy(col("dst").as("node"))
            .agg(sum("hub_ppm").as("authority_ppm"))
            .withColumnRenamed("node", "__n"),
          col("node") === col("__n"), "left")
        .select(col("node"),
          coalesce(col("authority_ppm"), lit(0L)).as("authority_ppm"))
      val aN = rescale(a, "authority_ppm")
      val h = nodes.join(
          e.join(aN.select(col("node"), col("authority_ppm")),
            e("dst") === aN("node"))
            .groupBy(col("src").as("node"))
            .agg(sum("authority_ppm").as("hub_ppm"))
            .withColumnRenamed("node", "__n"),
          col("node") === col("__n"), "left")
        .select(col("node"),
          coalesce(col("hub_ppm"), lit(0L)).as("hub_ppm"))
      val hN = rescale(h, "hub_ppm")
      // eager per-round checkpoint (the Clusters idiom): every rescale
      // references its input twice (frame + its 1-row max), so an
      // all-lazy chain multiplies subtree references ~4x per round and
      // re-executes the upstream edge distinct ~4^rounds times (measured
      // on g5 at sf0.1: 6.4 s lazy, 3.4 s with round + edge checkpoints; .cache() instead
      // was CATASTROPHIC — 57 s, the InMemoryRelation materialization
      // barriers multiplied). The checkpointed frame is node-scale.
      val prev = scores
      scores = aN.join(hN, Seq("node")).localCheckpoint()
      superseded += prev
    }
    }
    // Round 1's "prev" is the un-checkpointed SEED, whose plan reaches
    // back through `nodes` to the shared edge checkpoint `e` — and
    // dropCheckpointBlocks unpersists EVERY LogicalRDD in the plan it is
    // given, so passing the seed would free `e` out from under anything
    // still reading it (self-review find, round 10). Skip it; every later
    // entry is its own truncated checkpoint (one node-scale frame each).
    // `e` itself is dead once the loop ends (the returned frame is a
    // checkpoint) — free it explicitly.
    superseded.drop(1).foreach(graft.dedup.Clusters.dropCheckpointBlocks)
    graft.dedup.Clusters.dropCheckpointBlocks(e)
    // The ∞-norm rescale stays a broadcast 1-row max — the tempting
    // alternative (max via a whole-frame window) needs a single-partition
    // pass over ALL nodes and dies at warehouse scale.
    scores
  }
}
