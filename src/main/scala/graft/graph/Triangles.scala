package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle census + global clustering coefficient over an undirected
  * graph, by DEGREE ORIENTATION (Chiba–Nishizeki / the "forward"
  * algorithm): orient every undirected edge from its lower (degree, id)
  * endpoint to the higher, enumerate wedges only from each node's
  * OUT-neighbors, and close them against the oriented edge set. Each
  * triangle materializes exactly once (its corners are totally ordered by
  * (degree, id)), and — the 100 TB point — out-degrees under this
  * orientation are bounded by O(√m) on any graph, so the wedge join's
  * per-key fan-out is capped: a degree-10⁷ celebrity node generates
  * wedges from its ~√m oriented out-set, not from 10¹⁴ unordered
  * neighbor pairs. All three steps are plain equi shuffles (self-join on
  * the pivot, closing-edge join on the pair); nothing is quadratic in
  * degree.
  *
  * Everything emitted is exact integer arithmetic: wedge count
  * Σ d(d−1)/2 (d(d−1) is even, the halving is exact), clustering
  * coefficient as integer ppm `3·triangles·10⁶ DIV wedges`.
  */
object Triangles {

  /** The shared orientation pipeline: (undirected distinct edge set,
    * per-node degrees, (degree, id)-oriented edges with the precomputed
    * destination sort key). `und` is cached — both the census and the
    * per-node variant read it three times.
    */
  private def orient(edges: DataFrame):
      (DataFrame, DataFrame, DataFrame) = {
    val Seq(srcName, dstName) = edges.columns.toSeq.take(2)
    val und = edges
      .select(least(col(srcName), col(dstName)).as("u"),
        greatest(col(srcName), col(dstName)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .cache()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient (u, v) from lower (d, node) to higher; ties on degree break
    // by id, so the order is total and every triangle is counted once
    val oriented = und
      .join(deg.select(col("node").as("u"), col("d").as("__du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("__dv")), "v")
      .select(
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("v")).otherwise(col("u")).as("dst"),
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          struct(col("__dv").as("kd"), col("v").as("kn")))
          .otherwise(struct(col("__du").as("kd"), col("u").as("kn")))
          .as("__dstKey"))
    (und, deg, oriented)
  }

  /** One-row census: nodes, undirected edges, wedges (open two-paths),
    * triangles, and the global clustering coefficient in ppm
    * (`3·triangles / wedges`, 0 for wedge-free graphs).
    */
  def stats(edges: DataFrame): DataFrame = {
    val (und, deg, oriented) = orient(edges)
    val wedgeEnds = oriented.alias("e1")
      .join(oriented.alias("e2"), col("e1.src") === col("e2.src"))
      // order the wedge's two ends by the SAME (degree, id) key as the
      // orientation, so the closing edge is oriented b → c by construction
      .filter(col("e1.__dstKey") < col("e2.__dstKey"))
      .select(col("e1.dst").as("b"), col("e2.dst").as("c"))
    val triangles = wedgeEnds
      .join(oriented.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(
        deg.agg(count(lit(1)).as("n_nodes"),
          sum(expr("d * (d - 1) DIV 2")).as("n_wedges"))))
      .crossJoin(broadcast(triangles))
    counts.select(col("n_nodes"), col("n_edges"), col("n_wedges"),
      col("n_triangles"),
      when(col("n_wedges") > 0,
        expr("3 * n_triangles * 1000000 DIV n_wedges"))
        .otherwise(lit(0L)).as("clustering_ppm"))
  }

  /** Per-node triangle counts and LOCAL clustering coefficients — the
    * node-grain companion of [[stats]] (which communities is this node
    * embedded in vs how star-like is it): `lcc = 2·t(v) / (d(v)·(d(v)−1))`
    * in exact integer ppm, 0 for degree-<2 nodes. Same degree-oriented
    * enumeration (each triangle materializes once, O(√m) wedge fan-out);
    * the only addition is crediting each triangle to its three corners —
    * an explode to 3·triangles rows and one node-key rollup with map-side
    * partials, both linear in the triangle count. Per-node output, so at
    * 100 TB this is a node-scale report (graph-order rows, not edges).
    */
  def localClustering(edges: DataFrame): DataFrame = {
    val (_, deg, oriented) = orient(edges)
    val triCorners = oriented.alias("e1")
      .join(oriented.alias("e2"), col("e1.src") === col("e2.src"))
      .filter(col("e1.__dstKey") < col("e2.__dstKey"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"),
        col("e2.dst").as("c"))
      .join(oriented.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"))
    val perNode = triCorners
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("__t"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("d").as("degree"),
        coalesce(col("__t"), lit(0L)).as("n_triangles"),
        when(col("d") >= 2L,
          call_function("div",
            coalesce(col("__t"), lit(0L)) * 2000000L,
            col("d") * (col("d") - 1L)))
          .otherwise(lit(0L)).as("lcc_ppm"))
  }
}
