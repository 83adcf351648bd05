package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) quartile segmentation — the
  * classic customer-value grid every CRM and churn model starts from.
  * Each customer scores 1–4 on each axis against the CORPUS quartiles
  * (4 = best: most recent, most frequent, highest spend), and the
  * three digits concatenate into the `rfm_code` cell (444 = champions,
  * 111 = lost).
  *
  * Exactness: metrics are integers (days, counts, cents) and the
  * quartile thresholds use the [[Quantiles]] crossing rule
  * (`cum·10⁶ ≥ n·ppm` — percentile_disc semantics, no division), so
  * scores are engine-replayable; no interpolated float percentile ever
  * exists. Monetary thresholds quantize to WHOLE currency units
  * (`cents DIV 100`) to bound the distinct-value domain the quantile
  * window sorts — the emitted `monetary_cents` stays exact cents.
  *
  * Plan: one data-scale shuffle (the per-customer rollup keyed on
  * customer); the melt to (metric, value) is a map-side `stack`; the
  * quartile computation runs on DISTINCT-VALUE-scale rows (days ≤
  * calendar, frequency ≤ max orders/customer, monetary units bounded
  * by the price domain); thresholds broadcast back and the score
  * re-pivot re-uses the customer hash partitioning. The as-of date is
  * the corpus max order date (broadcast 1-row frame) — deterministic
  * from the data, no wall-clock.
  */
object Rfm {

  def segment(orders: DataFrame, custKey: Column, orderDate: Column,
              totalPrice: Column): DataFrame = {
    val per = orders
      .groupBy(custKey.as("cust"))
      .agg(max(to_date(orderDate)).as("__last"),
        count(lit(1)).as("frequency"),
        sum(round(totalPrice * 100).cast("long")).as("monetary_cents"))
    val asOf = orders.agg(max(to_date(orderDate)).as("__asof"))
    val metrics = per.crossJoin(broadcast(asOf))
      .select(col("cust"),
        datediff(col("__asof"), col("__last")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"))
    val melted = metrics.select(col("cust"), expr(
      "stack(3, 'r', recency_days, 'f', frequency, " +
        "'m', monetary_cents div 100) AS (metric, v)"))
    val th = Quantiles.exact(melted, col("metric"), col("v"),
      Seq("q25" -> 250000L, "q50" -> 500000L, "q75" -> 750000L))
      .drop("n")
    val above =
      (lit(0L) + when(col("v") > col("q25"), 1L).otherwise(0L)
        + when(col("v") > col("q50"), 1L).otherwise(0L)
        + when(col("v") > col("q75"), 1L).otherwise(0L))
    val scored = melted.join(broadcast(th), Seq("metric"))
      // recency inverts: fewer days since last order = better score
      .select(col("cust"), col("metric"),
        when(col("metric") === "r", lit(4L) - above).otherwise(above + 1L)
          .as("score"))
      .groupBy(col("cust"))
      .agg(max(when(col("metric") === "r", col("score"))).as("r_score"),
        max(when(col("metric") === "f", col("score"))).as("f_score"),
        max(when(col("metric") === "m", col("score"))).as("m_score"))
    metrics.join(scored, Seq("cust"))
      .select(col("cust"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"),
        col("m_score"),
        (col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
          .as("rfm_code"))
  }
}
