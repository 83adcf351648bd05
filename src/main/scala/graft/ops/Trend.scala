package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-key least-squares trend — the "is this user's activity rising
  * or falling, and how fast" primitive behind churn-risk features and
  * anomaly triage. For each key, the OLS slope of value against time:
  *
  *   `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`
  *
  * with `x` = days since the corpus epoch (integer), `y` = integer
  * milli-units — every moment is an exact integer SUM, so the slope
  * emits as `slope_micro_per_day = (n·Σxy − Σx·Σy)·10⁶ DIV
  * (n·Σx² − (Σx)²)` with the products on DECIMAL(38,0) (replay:
  * HUGEINT). The naive per-point float regression is
  * partial-order-dependent; five integer sums are not.
  *
  * A key whose observations all fall on ONE day has denominator 0 (no
  * slope is defined) — guarded directly on the denominator, which
  * keeps the plan a SINGLE aggregation: a `count_distinct(day)` guard
  * would force Spark's two-phase distinct plan, a second exchange this
  * operator does not need. Such keys emit a typed null slope.
  *
  * Plan: ONE shuffle — a single groupBy computing the four moments +
  * count with map-side partials. Nothing else: no window, no sort, no
  * second pass; at 100 TB this is the cheapest shape a regression can
  * have.
  */
object Trend {

  def slopePerKey(events: DataFrame, key: Column, ts: Column,
                  valueMilli: Column): DataFrame = {
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val keyName = events.select(key).columns.head
    events
      .select(key,
        datediff(to_date(ts), lit("1970-01-01").cast("date")).cast("long")
          .as("__x"),
        valueMilli.cast("long").as("__y"))
      .groupBy(col(keyName))
      .agg(count(lit(1)).as("n_obs"),
        sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum(dec(col("__x")) * col("__y")).as("__sxy"),
        sum(dec(col("__x")) * col("__x")).as("__sxx"))
      .withColumn("__den", dec(col("n_obs")) * col("__sxx") -
        dec(col("__sx")) * col("__sx"))
      .select(col(keyName), col("n_obs"),
        when(col("__den") > 0,
          call_function("div",
            (dec(col("n_obs")) * col("__sxy") -
              dec(col("__sx")) * col("__sy")) * 1000000L,
            col("__den")))
          .otherwise(lit(null).cast("long")).as("slope_micro_per_day"))
  }
}
