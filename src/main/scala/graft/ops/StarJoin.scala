package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The classic star-schema rollup (TPC-H Q5 shape): fact table ⋈ one
  * big dimension ⋈ a chain of small dimensions → grouped revenue. The
  * join strategy IS the operator here:
  *
  *   - lineitem ⋈ orders is the one genuine BIG-BIG join — it shuffles
  *     on the order key (at warehouse scale, bucket both tables on it
  *     and this too is exchange-free);
  *   - customer, supplier, nation, region all BROADCAST — dimensions
  *     ride to the fact, never the reverse. (At 10⁹-customer scale the
  *     customer join flips to a bucketed shuffle join; the code path is
  *     a `broadcast()` hint removal, nothing structural.)
  *   - revenue is pure integer: cents × (100 − discount%) micro-money
  *     units, summed partial-aggregate map-side. The float formulation
  *     `Σ price·(1−disc)` is partial-order-dependent — wrong under an
  *     exact contract, and wrong differently on every partitioning.
  *
  * Q5's correlated twist is kept: the supplier must sit in the
  * CUSTOMER's nation (`s_nationkey = c_nationkey`), which prices only
  * local fulfilment into the regional revenue.
  */
object StarJoin {

  /** One row per (region, nation, order year): `n_items`,
    * `revenue_micro4` (10⁻⁴ currency units, exact).
    */
  def revenueByRegion(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("__cents"),
      expr("CAST(round(l_discount * 100) AS BIGINT)").as("__disc"))
    val ords = orders.select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate")).as("order_year"))
    val cust = broadcast(customer.select(col("c_custkey"),
      col("c_nationkey")))
    val supp = broadcast(supplier.select(col("s_suppkey"),
      col("s_nationkey")))
    val nat = broadcast(nation.select(col("n_nationkey"), col("n_name"),
      col("n_regionkey")))
    val reg = broadcast(region.select(col("r_regionkey"), col("r_name")))
    li
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"),
        col("order_year"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("__cents") * (lit(100L) - col("__disc")))
          .as("revenue_micro4"))
  }
}
