package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Open-order backlog accounting — the operations dashboard behind "are
  * we shipping faster than we sell": per calendar month, how many orders
  * were PLACED, how many FULLY SHIPPED (their last line left the dock),
  * and the period-end backlog (cumulative placed − cumulative shipped).
  * An order with no lines never ships and sits in the backlog forever —
  * that is a real signal (lost orders), not a join bug to coalesce away.
  *
  * Plan: one lineitem rollup (`max(l_shipdate)` per order — partial
  * map-side, one orderkey shuffle), one orderkey join against orders
  * (the only big-big join; bucketed warehouses make it exchange-free),
  * then two month-grain rollups and a running-sum window over
  * MONTH-SCALE rows only (a century of months is ~1200 rows — the
  * single-partition pass is calendar-scale by construction, the same
  * posture as the peak-concurrency day frame).
  */
object Backlog {

  def monthlyBacklog(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val lastShip = lineitem.groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("__last_ship"))
    val flows = orders
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("__pm"))
      .join(lastShip, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("__pm"),
        date_format(col("__last_ship"), "yyyy-MM").as("__sm"))
    val placed = flows.groupBy(col("__pm").as("month"))
      .agg(count(lit(1)).as("n_placed"))
    val shipped = flows.filter(col("__sm").isNotNull)
      .groupBy(col("__sm").as("month"))
      .agg(count(lit(1)).as("n_shipped"))
    val w = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    placed.join(shipped, Seq("month"), "full_outer")
      .select(col("month"),
        coalesce(col("n_placed"), lit(0L)).as("n_placed"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
      .withColumn("backlog_end",
        sum(col("n_placed") - col("n_shipped")).over(w))
  }
}
