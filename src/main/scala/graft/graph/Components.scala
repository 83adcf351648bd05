package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Degree distribution in power-of-two bands (band = binary digit count
    * of the degree — integer, no float log): the is-it-a-power-law check
    * read before choosing hub caps, broadcast thresholds, or skew salts
    * for any graph algorithm on this edge set. Directions symmetrize and
    * parallel edges collapse first (degree = distinct-neighbor count, the
    * semantics every algorithm here uses); the histogram is band-scale.
    */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val und = edges
      .select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
    val bands = und.groupBy(col("a"))
      .agg(count(lit(1)).as("__deg"))
      .groupBy(length(bin(col("__deg"))).cast("long").as("band"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("__deg")).as("min_degree"),
        max(col("__deg")).as("max_degree"))
    bands.crossJoin(broadcast(bands.agg(sum("n_nodes").as("__t"))))
      .select(col("band"), col("n_nodes"), col("min_degree"),
        col("max_degree"),
        call_function("div", col("n_nodes") * 1000000L, col("__t"))
          .as("share_ppm"))
  }

  /** Degree assortativity — do hubs attach to hubs (ppm Pearson
    * correlation of endpoint degrees over directed edge incidences,
    * each undirected edge counted in both directions so the two
    * marginals coincide). Positive = social-network-like, negative =
    * hub-and-spoke; the one-number complement of [[degreeHistogram]]
    * when sizing skew salts. Exact arithmetic end to end: moments
    * accumulate on DECIMAL(38,0) (Σd·d' over 10¹² edges passes int64),
    * the correlation emits as `num·10⁶ div den` — signed truncating
    * division, identical on both engines — and a zero-variance
    * (regular) graph emits null, not a fake 0. Two degree joins onto
    * the edge list (broadcast-eligible node-scale frames) and a one-row
    * rollup; nothing quadratic.
    */
  def assortativity(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val und = edges
      .select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("d"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val joined = und
      .join(deg.select(col("node").as("a"), col("d").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("__db")), "b")
    val m = joined.agg(count(lit(1)).as("n_incidences"),
      sum(dec(col("__da"))).as("__sx"),
      sum(dec(col("__da") * col("__db"))).as("__sxy"),
      sum(dec(col("__da") * col("__da"))).as("__sx2"))
    m.select(col("n_incidences"),
      (dec(col("n_incidences")) * col("__sxy") - col("__sx") * col("__sx"))
        .as("__num"),
      (dec(col("n_incidences")) * col("__sx2") - col("__sx") * col("__sx"))
        .as("__den"))
      .select(col("n_incidences"),
        when(col("__den") > 0,
          call_function("div", col("__num") * 1000000L, col("__den")))
          .otherwise(lit(null).cast("long")).as("assort_ppm"))
  }
}
