package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monthly growth accounting — the new / retained / resurrected /
  * churned decomposition every subscription and engagement review
  * opens with (net growth hides WHICH users moved; this is the
  * identity that un-hides it: active(p) = new + retained +
  * resurrected, and churned(p) counts the previous period's actives
  * who vanished). Weekly grain uses ISO Monday weeks.
  * Complements [[ActiveUsers]] (levels) and [[Cohort]] (fixed-origin
  * retention curves) with the month-over-month flow view.
  *
  * Plan: ONE data-scale distinct to (month, user) — the
  * [[ActiveUsers]] move — then a per-user `lag`/`lead` window over
  * month-grain rows (users × active months, far below event grain)
  * classifies every stint edge locally: no self-joins of the activity
  * table, no per-month loop. Churn rows emit onto the FOLLOWING
  * month (that's the month the loss shows up in the report); the
  * final month therefore reports the last observable churn, and a
  * month with zero flows simply doesn't appear.
  */
object Growth {

  /** One row per period: `period, active, n_new, n_retained,
    * n_resurrected, n_churned`. `period` is `"month"` (the canonical
    * report) or `"week"` (ISO Monday weeks — the grain for faster
    * product loops).
    */
  def accounting(events: DataFrame, user: Column, ts: Column,
                 period: String = "month"): DataFrame = {
    require(period == "month" || period == "week",
      s"period must be month or week, got $period")
    val step: (Column, Int) => Column =
      if (period == "month") (c, n) => add_months(c, n)
      else (c, n) => date_add(c, n * 7)
    val mu = events
      .select(trunc(to_date(ts), period).as("period"), user.as("__u"))
      .filter(col("period").isNotNull)
      .distinct()
    val byU = Window.partitionBy(col("__u")).orderBy(col("period"))
    val flagged = mu
      .withColumn("__prev", lag(col("period"), 1).over(byU))
      .withColumn("__next", lead(col("period"), 1).over(byU))
    val statuses = flagged.select(col("period"),
      when(col("__prev").isNull, lit("new"))
        .when(col("__prev") === step(col("period"), -1),
          lit("retained"))
        .otherwise(lit("resurrected")).as("__st"))
    val churned = flagged
      .filter(col("__next").isNull ||
        col("__next") > step(col("period"), 1))
      .select(step(col("period"), 1).as("period"),
        lit("churned").as("__st"))
    statuses.unionAll(churned)
      .groupBy(col("period"))
      .agg(
        sum(when(col("__st") =!= "churned", 1L).otherwise(0L)).as("active"),
        sum(when(col("__st") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__st") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("__st") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("__st") === "churned", 1L).otherwise(0L))
          .as("n_churned"))
  }

  /** Cumulative distinct keys by month — the "total customers ever"
    * growth curve. A naive `count(DISTINCT key)` per expanding window is
    * quadratic; the linear formulation is first-seen month per key (one
    * key shuffle with map-side partial min), monthly new-key counts, and
    * a running sum over MONTH-scale rows only — the single-partition
    * window is calendar-bounded (a century is 1 200 rows), never
    * key-scale.
    */
  def cumulativeDistinct(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val first = df
      .select(key.as("__k"), date_format(ts, "yyyy-MM").as("__m"))
      .filter(col("__m").isNotNull)
      .groupBy(col("__k")).agg(min(col("__m")).as("month"))
    val monthly = first.groupBy(col("month"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly.withColumn("cum_total", sum(col("n_new")).over(w))
  }
}
