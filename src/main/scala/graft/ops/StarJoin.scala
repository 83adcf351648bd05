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

  /** TPC-H Q14 shape: promotion revenue share per ship month — the
    * conditional-share rollup every campaign dashboard runs. One
    * broadcast dimension join (part rides to lineitem), one grouped
    * conditional sum, share in ppm with the numerator on DECIMAL(38,0)
    * (`Σrevenue·10⁶` passes 2⁶³ near ~9×10¹² micro-money units — a
    * sf-thousands fact table gets there).
    */
  def promoShareByMonth(lineitem: DataFrame, part: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val li = lineitem.select(col("l_partkey"),
      date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
      (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
        .as("__rev"))
    val p = broadcast(part.select(col("p_partkey"), col("p_type")))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("ship_month")
      .agg(count(lit(1)).as("n_items"),
        sum("__rev").as("revenue_micro4"),
        coalesce(sum(when(col("p_type") === "PROMO", col("__rev"))),
          lit(0L)).as("promo_revenue_micro4"))
      .select(col("ship_month"), col("n_items"), col("revenue_micro4"),
        col("promo_revenue_micro4"),
        when(col("revenue_micro4") > 0, call_function("div",
          col("promo_revenue_micro4").cast(DecimalType(38, 0)) * 1000000L,
          col("revenue_micro4"))).otherwise(lit(0L))
          .as("promo_share_ppm"))
  }

  /** TPC-H Q18 shape (large-volume customers): orders whose total line
    * quantity exceeds a threshold, enriched with the customer — the
    * whale-hunting report. The HAVING runs BEFORE any join: the
    * lineitem rollup (one shuffle on the order key, partial map-side
    * sums) filters to the handful of qualifying orders, and only those
    * join to orders and customer. The orders join stays declarative —
    * AQE converts it to a broadcast of the qualifying side at runtime
    * when the threshold is selective (the usual case); customer
    * broadcasts as a dimension. Quantities round to exact integers
    * (the domain is integral); price emits as exact cents.
    */
  def bigSpenders(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, minQty: Long): DataFrame = {
    val qual = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .filter(col("sum_qty") > minQty)
    qual
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("order_date"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            .as("total_price_cents")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("order_date"), col("total_price_cents"), col("sum_qty"),
        col("n_lines"))
  }

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

  /** TPC-H Q3 shape — top-k unshipped-order revenue for one market
    * segment: orders placed before the cutoff whose items ship after
    * it, ranked by discounted revenue. The shipping-priority triage
    * query. Segment predicate rides the broadcast customer dim into
    * the fact join (filter BEFORE the fact shuffle, not after);
    * the cut is TakeOrderedAndProject on (revenue desc, orderkey) —
    * total order, never a global sort.
    */
  def topUnshipped(lineitem: DataFrame, orders: DataFrame,
                   customer: DataFrame, segment: String, cutoff: String,
                   k: Int): DataFrame = {
    val li = lineitem
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("__cents"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("__disc"))
    val ords = orders
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val cust = broadcast(customer
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey")))
    li
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(col("__cents") * (lit(100L) - col("__disc")))
        .as("revenue_micro4"))
      .orderBy(col("revenue_micro4").desc, col("o_orderkey"))
      .limit(k)
  }

  /** TPC-H Q10 shape — top-k customers by RETURNED-item revenue loss:
    * the churn-risk list (a customer who returned that much is about
    * to leave). Return-flag predicate pushes into the fact scan; the
    * customer/nation dims broadcast; TakeOrdered cut on
    * (loss desc, custkey).
    */
  def returnLoss(lineitem: DataFrame, orders: DataFrame,
                 customer: DataFrame, nation: DataFrame,
                 k: Int): DataFrame = {
    val li = lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("__cents"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("__disc"))
    val ords = orders.select(col("o_orderkey"), col("o_custkey"))
    val cust = broadcast(customer.select(col("c_custkey"), col("c_name"),
      col("c_nationkey")))
    val nat = broadcast(nation.select(col("n_nationkey"), col("n_name")))
    li
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("__cents") * (lit(100L) - col("__disc")))
          .as("loss_micro4"))
      .orderBy(col("loss_micro4").desc, col("c_custkey"))
      .limit(k)
  }

  /** TPC-H Q4 shape — order-priority count of orders with at least one
    * LATE line (shipped more than `lateDays` after the order date)
    * inside a date window: the fulfilment-SLA report. The EXISTS is a
    * LEFT SEMI join — it stops at the first late line per order, never
    * multiplies the fact rows, and the non-equi lateness predicate
    * rides the equi orderkey join as a post-join filter (one shuffle
    * on orderkey; bucketed warehouses make it exchange-free).
    */
  def latePriorityCount(lineitem: DataFrame, orders: DataFrame,
                        from: String, until: String,
                        lateDays: Int): DataFrame = {
    val ords = orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = lineitem.select(col("l_orderkey"), col("l_shipdate"))
    ords
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") +
          expr(s"INTERVAL $lateDays DAYS"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
  }

  /** TPC-H Q22 shape — idle high-balance customers per nation: account
    * balance above the positive-balance mean AND no order since the
    * cutoff. The mean test is EXACT integer cross-multiplication
    * (cents·count > total-cents — no float average, so the boundary
    * customer lands identically on every engine and partitioning); the
    * one-row threshold broadcasts; the activity check is a left ANTI
    * join (null-safe, unlike a literal NOT IN under NULL keys).
    */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
                        since: String): DataFrame = {
    val cents = expr("CAST(round(c_acctbal * 100) AS BIGINT)")
    val thresh = customer
      .filter(cents > 0L)
      .agg(sum(cents).as("__tot"), count(lit(1)).as("__cnt"))
    val active = orders
      .filter(col("o_orderdate") >= lit(since).cast("timestamp"))
      .select(col("o_custkey"))
    customer
      .select(col("c_custkey"), col("c_nationkey"), cents.as("__cents"))
      .crossJoin(broadcast(thresh))
      .filter(col("__cents") * col("__cnt") > col("__tot"))
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("__cents")).as("acctbal_cents"))
  }

  /** TPC-H Q8 shape — supplier-nation market share of one region's
    * demand per order year: which supplying nations win the region's
    * spend, and is a given nation's share growing. Join strategy: the
    * only big-big join is lineitem ⋈ orders on the order key; the
    * region-filtered customer key set and the supplier→nation map both
    * broadcast (the region predicate prunes customers BEFORE the fact
    * join, so non-region demand never shuffles). Revenue is exact
    * integer micro-money; the share divides on DECIMAL(38,0) inside a
    * year-partitioned window over (year × nation)-scale rows — the
    * rollup output, never the fact table.
    */
  def marketShare(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, supplier: DataFrame,
                  nation: DataFrame, region: DataFrame,
                  regionName: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.expressions.Window
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"),
      (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
        .as("__rev"))
    val ords = orders.select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate")).cast("int").as("order_year"))
    val regionNations = nation
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === regionName)
      .select(col("n_nationkey").as("__rn"))
    val regionCust = broadcast(customer
      .join(broadcast(regionNations), col("c_nationkey") === col("__rn"))
      .select(col("c_custkey")))
    val supplierNation = broadcast(supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supplier_nation")))
    val byYearNation = li
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(regionCust, col("o_custkey") === col("c_custkey"))
      .join(supplierNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("order_year"), col("supplier_nation"))
      .agg(count(lit(1)).as("n_items"), sum("__rev").as("revenue_micro4"))
    val w = Window.partitionBy(col("order_year"))
    byYearNation
      .withColumn("__tot", sum(col("revenue_micro4")).over(w))
      .select(col("order_year"), col("supplier_nation"), col("n_items"),
        col("revenue_micro4"),
        when(col("__tot") > 0, call_function("div",
          col("revenue_micro4").cast(DecimalType(38, 0)) * 1000000L,
          col("__tot"))).otherwise(lit(0L)).as("share_ppm"))
  }

  /** TPC-H Q13 shape — the customer order-count distribution: how many
    * customers placed 0, 1, 2, … orders. The zero bucket is the whole
    * point (dormant accounts), so customers LEFT-join orders and
    * `count(o_custkey)` counts only matches. Two shuffles total
    * (custkey, then the count value); the histogram output is
    * order-count-scale.
    */
  def orderCountHistogram(customer: DataFrame,
                          orders: DataFrame): DataFrame = {
    customer.select(col("c_custkey"))
      .join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** TPC-H Q1 shape — the pricing summary report: per (return flag,
    * line status) over everything shipped by a cutoff, the sum/average
    * battery the warehouse runs nightly. This is the purest
    * scan-shaped query in the suite: one predicate pushed to the
    * parquet scan, one hash aggregation over a 6-ish-group key space —
    * partial aggregation collapses each task to a handful of states,
    * so the exchange moves bytes, not rows, at any scale.
    *
    * Money stays exact: base price in cents (int64), discounted price
    * in micro4 (`cents·(100−disc%)`), charge in micro6
    * (`cents·(100−disc%)·(100+tax%)`) accumulated on DECIMAL(38,0) —
    * the float `Σ price·(1−d)·(1+t)` is partial-order-dependent. The
    * micro6 emission rides back down to BIGINT: ~10⁹ micro6 units per
    * average line puts 2⁶³ near 10¹⁰ lines; past that, emit the
    * DECIMAL or coarsen the unit. Averages are truncating integer
    * divisions (milli-qty, cents, basis points) — exact on both
    * engines by the shared toward-zero division contract.
    */
  def pricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val li = lineitem
      .filter(col("l_shipdate") < lit(shipBefore).cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("__qty"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("__cents"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("__disc"),
        expr("CAST(round(l_tax * 100) AS BIGINT)").as("__tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("__qty")).as("sum_qty"),
        sum(col("__cents")).as("sum_base_cents"),
        sum((col("__cents") * (lit(100L) - col("__disc"))).cast(dec))
          .as("__disc_d"),
        sum((col("__cents") * (lit(100L) - col("__disc")) *
          (lit(100L) + col("__tax"))).cast(dec)).as("__charge_d"),
        sum(col("__disc")).as("__disc_sum"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n_lines"),
        col("sum_qty"), col("sum_base_cents"),
        col("__disc_d").cast("long").as("sum_disc_micro4"),
        col("__charge_d").cast("long").as("sum_charge_micro6"),
        call_function("div", col("sum_qty") * 1000L, col("n_lines"))
          .as("avg_qty_milli"),
        call_function("div", col("sum_base_cents"), col("n_lines"))
          .as("avg_price_cents"),
        call_function("div", col("__disc_sum") * 100L, col("n_lines"))
          .as("avg_disc_bp"))
  }

  /** TPC-H Q6 shape — the forecast-revenue-change probe: how much
    * revenue a discount-band change would move, i.e. `Σ price·disc`
    * over one ship year × a discount bracket × a quantity cap. The
    * whole predicate is sargable and pushes to the scan (date range on
    * the timestamp, bracket on the rounded-integer discount evaluated
    * post-scan in codegen); the aggregate is global, so partials
    * collapse to ONE state per task before the single-row exchange —
    * the cheapest possible query at any scale. Revenue accumulates as
    * `cents·disc%` (micro4) on DECIMAL(38,0), emitted as BIGINT (2⁶³
    * is ~10¹⁰ qualifying lines away at ~10⁸ micro4/line).
    */
  def forecastRevenue(lineitem: DataFrame, from: String, until: String,
                      discLoPct: Long, discHiPct: Long,
                      maxQty: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val disc = expr("CAST(round(l_discount * 100) AS BIGINT)")
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        disc >= discLoPct && disc <= discHiPct &&
        expr("CAST(round(l_quantity) AS BIGINT)") < maxQty)
      .agg(count(lit(1)).as("n_lines"),
        coalesce(sum((expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
            disc).cast(DecimalType(38, 0))), lit(0L).cast(DecimalType(38, 0)))
          .cast("long").as("forecast_rev_micro4"))
  }

  /** TPC-H Q15 shape — the top supplier(s) by shipped revenue inside a
    * date window, ties kept (the classic view-based argmax). The
    * supplier rollup is one suppkey shuffle with map-side partials; the
    * maximum rides back as a broadcast ONE-ROW frame (never a global
    * sort), and the supplier dim broadcasts onto the winners.
    */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame,
                  from: String, until: String): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
        .as("revenue_micro4"))
    val mx = broadcast(rev.agg(max(col("revenue_micro4")).as("__mx")))
    rev.crossJoin(mx)
      .filter(col("revenue_micro4") === col("__mx"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_micro4"))
  }

  /** TPC-H Q17 shape — revenue locked in SMALL orders: lines whose
    * quantity is under 20% of their part's average, rolled up per brand
    * (the replace-with-bulk-shipping opportunity). The average test is
    * EXACT integer cross-multiplication (`qty·5·count < Σqty` — no float
    * average, every boundary line lands identically on both engines);
    * the per-part stats come from one partkey rollup self-joined back
    * (the Q17 correlated-subquery shape — both sides shuffle on the
    * part key once; bucketed fact tables make it exchange-free).
    */
  def smallOrderRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_partkey"),
      expr("CAST(round(l_quantity) AS BIGINT)").as("__qty"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("__cents"))
    val stats = li.groupBy(col("l_partkey").as("__pk"))
      .agg(sum(col("__qty")).as("__s"), count(lit(1)).as("__c"))
    li.join(stats, col("l_partkey") === col("__pk"))
      .filter(col("__qty") * 5L * col("__c") < col("__s"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small_lines"),
        sum(col("__cents")).as("small_rev_cents"))
  }

  /** TPC-H Q19 shape — revenue under an OR-of-ANDs bracket predicate
    * (brand × size-range × quantity-range alternatives): the classic
    * "does the optimizer keep a disjunction selective" probe. The part
    * dim broadcasts with its size bracket pre-filtered by the predicate's
    * UNION OF RANGES (the only part-side filter that stays sargable);
    * the per-alternative conjunctions evaluate post-join inside codegen;
    * output is the one-row (n_lines, revenue) rollup.
    */
  def bracketRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_partkey"),
      expr("CAST(round(l_quantity) AS BIGINT)").as("__qty"),
      (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
        .as("__rev"))
    val p = broadcast(part
      .filter(col("p_size") >= 1 && col("p_size") <= 15)
      .select(col("p_partkey"), col("p_brand"), col("p_size")))
    val alt1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 5) && col("__qty").between(1, 11)
    val alt2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 10) && col("__qty").between(10, 20)
    val alt3 = col("p_brand") === "Brand#34" &&
      col("p_size").between(1, 15) && col("__qty").between(20, 30)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(alt1 || alt2 || alt3)
      .agg(count(lit(1)).as("n_lines"),
        coalesce(sum(col("__rev")), lit(0L)).as("revenue_micro4"))
  }

  /** TPC-H Q7 shape — cross-border volume shipping between two nations,
    * by supplier nation × customer nation × order year: the trade-flow
    * report. Both nation-filtered maps broadcast (supplier→nation and
    * customer→nation); the cross-border requirement (`supp ≠ cust`
    * nation) rides the rollup key, and the only big-big join is
    * lineitem ⋈ orders.
    */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame,
                     customer: DataFrame, supplier: DataFrame,
                     nation: DataFrame, nationA: String,
                     nationB: String): DataFrame = {
    val nats = broadcast(nation
      .filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name")))
    val sup = broadcast(supplier
      .join(nats, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cust = broadcast(customer
      .join(nats, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    lineitem.select(col("l_orderkey"), col("l_suppkey"),
        (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
          .as("__rev"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("int").as("order_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("order_year"))
      .agg(count(lit(1)).as("n_items"), sum(col("__rev")).as("revenue_micro4"))
  }

  /** Year-over-year revenue growth per customer nation — the board-deck
    * trend table: per (nation, order year), exact integer revenue and
    * the signed YoY delta in ppm (`rev_t·10⁶ / rev_{t-1} − 10⁶` on
    * DECIMAL(38,0); the first year and zero-revenue predecessors emit
    * null — a NULL growth is honest, a 0 is a lie). The only big-big
    * join is lineitem ⋈ orders; the customer→nation map broadcasts; the
    * lag window runs over (nation × year) rollup rows only.
    */
  def revenueYoy(lineitem: DataFrame, orders: DataFrame,
                 customer: DataFrame, nation: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.expressions.Window
    val custNation = broadcast(customer
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation")))
    val byYear = lineitem
      .select(col("l_orderkey"),
        (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
          .as("__rev"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("int").as("order_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .groupBy(col("nation"), col("order_year"))
      .agg(sum(col("__rev")).as("revenue_micro4"))
    val w = Window.partitionBy(col("nation")).orderBy(col("order_year"))
    byYear
      .withColumn("__prev", lag(col("revenue_micro4"), 1).over(w))
      .select(col("nation"), col("order_year"), col("revenue_micro4"),
        when(col("__prev") > 0L, call_function("div",
          col("revenue_micro4").cast(DecimalType(38, 0)) * 1000000L,
          col("__prev")) - 1000000L)
          .otherwise(lit(null).cast("long")).as("yoy_ppm"))
  }

  /** TPC-H Q9 shape — product-line profit per supplier nation × order
    * year: which nations' suppliers make money on a product family.
    * This schema has no `partsupp`, so supply cost proxies as the
    * part's retail price × quantity (the shape — a signed
    * revenue-minus-cost rollup over a name-gated part family — is the
    * point, not the cost model). Profit is EXACT signed micro-money:
    * `Σ(cents·(100−disc) − retail_cents·100·qty)`; losses emit as
    * negative numbers, never clamped. The name predicate prunes the
    * broadcast part dim BEFORE the fact join, so only the family's
    * lines shuffle; supplier→nation broadcasts; the one big-big join
    * is lineitem ⋈ orders for the order year.
    */
  def productProfit(lineitem: DataFrame, orders: DataFrame,
                    part: DataFrame, supplier: DataFrame,
                    nation: DataFrame, nameToken: String): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_partkey"),
      col("l_suppkey"),
      (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
        .as("__rev"),
      expr("CAST(round(l_quantity) AS BIGINT)").as("__qty"))
    val fam = broadcast(part
      .filter(col("p_name").contains(nameToken))
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)")
          .as("__retail_cents")))
    val supNat = broadcast(supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation")))
    li
      .join(fam, col("l_partkey") === col("p_partkey"))
      .join(orders.select(col("o_orderkey"),
          year(col("o_orderdate")).cast("int").as("order_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supNat, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), col("order_year"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("__rev") - col("__retail_cents") * 100L * col("__qty"))
          .as("profit_micro4"))
  }

  /** TPC-H Q2 shape — the minimum-cost supplier per part within a
    * region (groupwise-min + join-back, the classic correlated-scalar
    * decorrelation). Without `partsupp`, the observed supply cost of a
    * (part, supplier) pair is the MINIMUM unit price across that
    * supplier's lines for the part, in milli-cents via truncating
    * integer division (`cents·1000 div qty` — positive operands, so
    * Spark `div` ≡ DuckDB `//` exactly; no float unit price). Join
    * strategy: the (part, supplier) rollup shuffles once on the pair
    * key; the per-part minimum reuses that output (part-key rollup +
    * equality join-back, both sides part-scale); the region's supplier
    * key set and every dim broadcast. Ties keep ALL winning suppliers.
    */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame, nation: DataFrame,
                      region: DataFrame, regionName: String): DataFrame = {
    val regNations = nation
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === regionName)
      .select(col("n_nationkey"), col("n_name"))
    val regSupp = broadcast(supplier
      .join(broadcast(regNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("n_name").as("nation"),
        expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("acctbal_cents")))
    val spCost = lineitem
      .filter(expr("CAST(round(l_quantity) AS BIGINT)") > 0L)
      .join(regSupp.select(col("s_suppkey").as("__sk")),
        col("l_suppkey") === col("__sk"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) * 1000 div " +
          "CAST(round(l_quantity) AS BIGINT)")).as("cost_milli"))
    val partMin = spCost
      .groupBy(col("l_partkey").as("__pk"))
      .agg(min(col("cost_milli")).as("__mn"))
    spCost
      .join(partMin, col("l_partkey") === col("__pk") &&
        col("cost_milli") === col("__mn"))
      .join(regSupp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"),
        col("s_name"), col("nation"), col("acctbal_cents"),
        col("cost_milli"))
  }

  /** TPC-H Q11 shape — value-concentrated parts: parts whose shipped
    * value from ONE nation's suppliers exceeds a basis-point fraction
    * of that nation's total (the "important stock" report). The
    * whole-frame total is a ONE-ROW broadcast; the threshold test is
    * exact integer cross-multiplication on DECIMAL(38,0)
    * (`value·10⁴ > bp·total` — no float share, so boundary parts land
    * identically on both engines). One partkey shuffle with map-side
    * partials; the nation's supplier key set broadcasts into the scan.
    */
  def importantParts(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame, nationName: String,
                     thresholdBp: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val natSupp = broadcast(supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")))
    val byPart = lineitem
      .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("value_cents"))
    val total = broadcast(byPart
      .agg(coalesce(sum(col("value_cents")), lit(0L)).as("__tot")))
    byPart.crossJoin(total)
      .filter(col("value_cents").cast(DecimalType(38, 0)) * 10000L >
        col("__tot").cast(DecimalType(38, 0)) * thresholdBp)
      .select(col("p_partkey"), col("n_lines"), col("value_cents"))
  }

  /** TPC-H Q21 shape — suppliers who single-handedly held up
    * multi-supplier orders: the supplier was LATE (shipped more than
    * `lateDays` after the order date — this schema's stand-in for
    * receipt > commit) on an order that involved OTHER suppliers, none
    * of whom were late. The whole EXISTS / NOT-EXISTS pair collapses
    * into ONE orderkey rollup: `countDistinct(supplier)` > 1 supplies
    * the EXISTS, `countDistinct(late supplier) = 1` the NOT-EXISTS,
    * and the culprit's id is `max(late supplier)` — exact because the
    * qualifying orders have exactly one. One big-big join
    * (lineitem ⋈ orders) and one orderkey shuffle; supplier/nation
    * dims broadcast onto the supplier-scale result.
    */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
                       supplier: DataFrame, nation: DataFrame,
                       lateDays: Int): DataFrame = {
    val joined = lineitem.select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("__late", col("l_shipdate") > col("o_orderdate") +
        expr(s"INTERVAL $lateDays DAYS"))
    val perOrder = joined
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("__n_supp"),
        countDistinct(when(col("__late"), col("l_suppkey")))
          .as("__n_late"),
        max(when(col("__late"), col("l_suppkey"))).as("__culprit"))
      .filter(col("__n_supp") > 1L && col("__n_late") === 1L)
    perOrder
      .groupBy(col("__culprit").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier
          .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey").as("__sk"), col("s_name"),
            col("n_name").as("nation"))),
        col("s_suppkey") === col("__sk"))
      .select(col("s_suppkey"), col("s_name"), col("nation"),
        col("numwait"))
  }

  /** TPC-H Q20 shape — suppliers who dominate a part family's
    * shipments inside a window: for each PROMO-type part, the
    * suppliers who shipped MORE THAN HALF of the part's total quantity
    * (`2·qty > total` — exact integers, the availqty>½Σqty analog
    * without partsupp), counted per supplier. The semi-join chain is
    * kept: the part-family key set broadcasts into the window-pruned
    * fact scan; the (part, supplier) rollup shuffles once on the pair
    * key; the per-part total reuses it (part-key rollup + join-back);
    * supplier/nation dims broadcast onto the supplier-scale output.
    */
  def dominantFamilySuppliers(lineitem: DataFrame, part: DataFrame,
                              supplier: DataFrame, nation: DataFrame,
                              partType: String, from: String,
                              until: String): DataFrame = {
    val fam = broadcast(part.filter(col("p_type") === partType)
      .select(col("p_partkey")))
    val sp = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(fam, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("__qty"))
    val totals = sp.groupBy(col("l_partkey").as("__pk"))
      .agg(sum(col("__qty")).as("__tot"))
    sp
      .join(totals, col("l_partkey") === col("__pk"))
      .filter(col("__qty") * 2L > col("__tot"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominated_parts"))
      .join(broadcast(supplier
          .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("n_name").as("nation"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("nation"),
        col("n_dominated_parts"))
  }

  /** TPC-H Q12 shape — the critical-vs-routine order mix per line class
    * (this schema has no ship mode, so the return flag plays the class
    * key): per class, how many lines belong to URGENT/HIGH-priority
    * orders vs everything else, inside a ship-date window. One big-big
    * join (lineitem ⋈ orders on the order key), the priority test as
    * conditional partial sums — two counters per group, no second pass.
    */
  def priorityMixByFlag(lineitem: DataFrame, orders: DataFrame,
                        from: String, until: String): DataFrame = {
    val li = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"))
    li.join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("n_high"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("n_low"))
  }

  /** TPC-H Q16 shape — supplier breadth per part group: how many
    * DISTINCT suppliers ship each (brand, type, size), one brand
    * excluded, top-k groups. The part dim broadcasts into the fact
    * scan (the brand exclusion prunes before the shuffle); the
    * count-distinct shuffles once on the group key with Spark's
    * two-phase distinct-aggregate; the cut is TakeOrderedAndProject on
    * a total order (count desc, then the full group key).
    */
  def supplierBreadth(lineitem: DataFrame, part: DataFrame,
                      excludeBrand: String, k: Int): DataFrame = {
    val dims = broadcast(part
      .filter(col("p_brand") =!= excludeBrand)
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size")))
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(dims, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(k)
  }
}
