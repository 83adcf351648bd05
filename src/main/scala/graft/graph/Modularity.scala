package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Newman modularity of a community assignment — the "did the clustering
  * find real structure" audit run after [[LabelPropagation]]: per
  * community c, the contribution `e_c/m − (d_c/2m)²` (intra-edge share
  * minus the share a random degree-preserving rewiring would give it),
  * summed over communities. Q near 0 means the labels carve nothing;
  * a strongly positive Q means intra-community edges beat chance.
  *
  * Exact integer arithmetic: the contribution emits as
  * `(e_c·4m − d_c²)·10⁶ / 4m²` in ppm on DECIMAL(38,0) (d_c ≤ 2m, so
  * d_c²·10⁶ needs ~2·(log₂m+1)+20 bits — past int64 at graph scale,
  * never past 38 digits), division truncating toward zero on both
  * engines. Plan: the label frame joins the symmetrized edge set twice
  * (node-keyed shuffles, the LPA-round shape), degrees are a node-scale
  * rollup, and the per-community report aggregates community-scale rows;
  * the two whole-graph scalars (m, Σ) ride a broadcast one-row frame.
  */
object Modularity {

  /** Per-community report over `rounds`-round LPA labels: node count,
    * intra-community edge count, degree mass, and the ppm modularity
    * contribution. `Σ q_contrib_ppm` over the result is the graph's Q.
    */
  def report(edges: DataFrame, rounds: Int): DataFrame = {
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
    val labels = LabelPropagation.communities(edges, rounds)
      .select(col("node"), col("label"))
    // every symmetrized row is one endpoint-slot: count per node = degree
    val degrees = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("__deg"))
    val degreeMass = degrees.join(labels, Seq("node"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("__deg")).as("degree_sum"))
    // intra edges counted once: orient a < b, then require both labels equal
    val intra = und.filter(col("a") < col("b"))
      .join(labels.select(col("node").as("a"), col("label").as("__la")),
        Seq("a"))
      .join(labels.select(col("node").as("b"), col("label").as("__lb")),
        Seq("b"))
      .filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("label"))
      .agg(count(lit(1)).as("e_in"))
    val m = broadcast(und.agg((count(lit(1)) / 2).cast("long").as("__m")))
    degreeMass
      .join(intra, Seq("label"), "left")
      .crossJoin(m)
      .select(col("label"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("degree_sum"),
        call_function("div",
          (coalesce(col("e_in"), lit(0L)).cast(DecimalType(38, 0)) *
            col("__m") * 4 -
            col("degree_sum").cast(DecimalType(38, 0)) * col("degree_sum"))
            * 1000000L,
          col("__m").cast(DecimalType(38, 0)) * col("__m") * 4)
          .as("q_contrib_ppm"))
  }
}
