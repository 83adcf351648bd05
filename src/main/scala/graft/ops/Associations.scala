package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: which item pairs share baskets more
  * than their popularity predicts — co-purchase analytics, co-visitation
  * graphs, tag co-occurrence. Emits co-count, marginals, and LIFT
  * (`P(ab)/(P(a)·P(b))`) in integer ppm, top-k by (co-count, pair).
  *
  * Scale shape: the quadratic pair stage rides
  * [[ScaleJoins.bucketedSelfPairs]] — triangle-salted within each basket,
  * so a degenerate basket holding 10⁵ items caps any single task at
  * ~|basket|²/salt² and the pinned partition count keeps AQE from
  * serializing the blowup. Everything after the pair rollup is item-scale:
  * marginals broadcast, lift is exact integer arithmetic
  * (`co·N·10⁶ DIV (cnt_a·cnt_b)`, the product riding DECIMAL(38,0) so the
  * numerator never overflows int64 — co·N·10⁶ crosses 2⁶³ at roughly
  * 3×10⁶ baskets with hot pairs, well inside the 100 TB frame; decimal
  * headroom is ~10³⁸, and `DIV` returns the exact int64 quotient since
  * lift values are bounded by N), and the top-k is an orderBy+limit
  * (TakeOrderedAndProject: per-partition heaps, no global sort). The
  * `minSupport` floor is applied BEFORE the marginal joins — at corpus
  * scale the co ≥ s filter is what shrinks the pair set from quadratic to
  * reportable.
  */
object Associations {

  /** `co · N · 10⁶ DIV (cnt_a · cnt_b)` with BOTH products in
    * DECIMAL(38,0): the numerator's int64 bound breaks once
    * co_count·n_baskets crosses 9.2·10¹² (~3·10⁶ baskets with hot pairs),
    * the divisor's once two items each appear in ~3·10⁹ baskets. Exposed
    * for the boundary property test, which is what caught the divisor
    * side.
    */
  private[graft] def liftPpm: Column =
    expr("CAST(co_count AS DECIMAL(38,0)) * __n * 1000000" +
      " DIV (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b)")

  /** Top-k co-occurring item pairs with lift.
    *
    * @param minSupport keep pairs sharing at least this many baskets
    * @param salt       degenerate-basket spread for the pair stage
    */
  def copurchasePairs(baskets: DataFrame, basket: Column, item: Column,
                      minSupport: Int, topK: Int,
                      salt: Int = 8): DataFrame = {
    require(minSupport >= 1 && topK >= 1, "minSupport and topK must be >= 1")
    val b = baskets.select(basket.as("__basket"), item.as("__item")).distinct()
    val itemCnt = b.groupBy("__item").agg(count(lit(1)).as("__cnt"))
    val nBaskets = b.agg(countDistinct(col("__basket")).as("__n"))
    val co = ScaleJoins.bucketedSelfPairs(b, Seq("__basket"), "__item",
        Nil, salt)
      .groupBy(col("id_a").as("item_a"), col("id_b").as("item_b"))
      .agg(count(lit(1)).as("co_count"))
      .filter(col("co_count") >= minSupport)
    co
      .join(broadcast(itemCnt.select(col("__item").as("item_a"),
        col("__cnt").as("cnt_a"))), "item_a")
      .join(broadcast(itemCnt.select(col("__item").as("item_b"),
        col("__cnt").as("cnt_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("co_count"),
        col("cnt_a"), col("cnt_b"),
        liftPpm.as("lift_ppm"))
      .orderBy(col("co_count").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Per-item top-k nearest neighbors by co-occurrence cosine — the
    * "customers who bought X also bought" panel, item-item collaborative
    * filtering over binary basket vectors:
    * `cos(a,b) = co(a,b) / √(cnt_a · cnt_b)` (Ochiai coefficient).
    *
    * Scale shape: the pair stage is the same triangle-salted
    * [[ScaleJoins.bucketedSelfPairs]] as [[copurchasePairs]] and the
    * `minSupport` floor prunes the quadratic set before any join; the
    * marginals broadcast (item-catalog-scale); then each surviving pair
    * is mirrored (a→b, b→a) and ranked per ITEM by a window — partitioned
    * by item, so the rank shuffle is keyed on the catalog, never on
    * baskets, and no global sort forms anywhere.
    *
    * Cross-engine float contract: the cosine is one double division over
    * one double sqrt of an exact int64 product, rounded to 6dp — IEEE
    * 754 correctly-rounded ops, bit-identical on Spark and DuckDB — and
    * the rank orders by the ROUNDED value with integer tie-breaks
    * (co-count desc, neighbor id asc), so the top-k cut is deterministic
    * on both engines.
    */
  def itemNeighbors(baskets: DataFrame, basket: Column, item: Column,
                    minSupport: Int, k: Int, salt: Int = 8): DataFrame = {
    require(minSupport >= 1 && k >= 1, "minSupport and k must be >= 1")
    val b = baskets.select(basket.as("__basket"), item.as("__item")).distinct()
    val itemCnt = b.groupBy("__item").agg(count(lit(1)).as("__cnt"))
    val co = ScaleJoins.bucketedSelfPairs(b, Seq("__basket"), "__item",
        Nil, salt)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("co_count"))
      .filter(col("co_count") >= minSupport)
    // Marginals attach BEFORE the mirror, and the mirror is one
    // explode(array(...)) — not a union of two selects over `co`. The
    // union form evaluated the whole pair stage (basket distinct + salted
    // self-join + pair rollup) TWICE, once per direction (r14 measured:
    // the duplicated subtree was most of this query's cost; Catalyst does
    // not reuse the exchange across the two branches). Explode keeps one
    // evaluation and mirrors rows map-side; the marginal joins move from
    // the directed (2×) frame to the unordered (1×) frame — same rows,
    // half the broadcast probes, and `itemCnt` is scanned once per side
    // instead of once per (side × direction).
    val directed = co
      .join(broadcast(itemCnt.select(col("__item").as("id_a"),
        col("__cnt").as("cnt_a"))), "id_a")
      .join(broadcast(itemCnt.select(col("__item").as("id_b"),
        col("__cnt").as("cnt_b"))), "id_b")
      .select(explode(array(
        struct(col("id_a").as("item"), col("id_b").as("neighbor"),
          col("co_count"), col("cnt_a").as("cnt_item"),
          col("cnt_b").as("cnt_neighbor")),
        struct(col("id_b").as("item"), col("id_a").as("neighbor"),
          col("co_count"), col("cnt_b").as("cnt_item"),
          col("cnt_a").as("cnt_neighbor")))).as("e"))
      .select(col("e.item").as("item"), col("e.neighbor").as("neighbor"),
        col("e.co_count").as("co_count"), col("e.cnt_item").as("cnt_item"),
        col("e.cnt_neighbor").as("cnt_neighbor"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("co_count").desc, col("neighbor"))
    directed
      .withColumn("cosine",
        round(col("co_count").cast("double") /
          sqrt(col("cnt_item").cast("double") *
            col("cnt_neighbor").cast("double")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("co_count"),
        col("cnt_item"), col("cnt_neighbor"), col("cosine"), col("rank"))
  }
}
