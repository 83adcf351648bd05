package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Peak concurrency per day — the sweep-line classic ("how many
  * sessions were open at the busiest instant"): capacity planning,
  * license sizing, connection-pool tuning. Each interval contributes
  * a +1 at its start and a −1 at its end (INCLUSIVE overlap: at equal
  * timestamps starts order before ends, so touching intervals count as
  * concurrent — the conservative capacity answer).
  *
  * The naive sweep is one GLOBAL sort of all endpoints — single
  * partition, data-scale, refused. Instead the sweep decomposes by
  * calendar day: within each day a per-day window computes the running
  * delta sum (data-scale work, hash-partitioned by day); the carry-in
  * concurrency at each day's start is the running total of per-day NET
  * deltas — a second window over DAY-DISTINCT rows (calendar-bounded,
  * the deliberate serial step of the [[Quantiles]]/[[Survival]] kind).
  * `peak = base + greatest(0, max running)` — the day may peak at its
  * very start, before any endpoint fires.
  *
  * Emits one row per day WITH endpoints; a fully-covered silent day
  * (an interval spanning it with no endpoint inside) emits nothing —
  * its concurrency is constant at the previous day's closing level,
  * derivable from `base + net` of the preceding emitted day.
  */
object Concurrency {

  /** `intervals` needs `startTs`/`endTs` columns; one output row per
    * active day: base (day-start) concurrency, peak, start/end counts.
    */
  def peakPerDay(intervals: DataFrame, startTs: Column,
                 endTs: Column): DataFrame = {
    val pts = intervals
      .select(to_date(startTs).as("day"),
        unix_micros(startTs).as("__us"), lit(1L).as("__d"))
      .unionAll(intervals.select(to_date(endTs).as("day"),
        unix_micros(endTs).as("__us"), lit(-1L).as("__d")))
    val inDay = Window.partitionBy(col("day"))
      .orderBy(col("__us").asc, col("__d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byDay = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("__run", sum("__d").over(inDay))
      .groupBy(col("day"))
      .agg(sum("__d").as("__net"),
        max("__run").as("__maxrun"),
        count(when(col("__d") === 1, 1)).as("n_starts"),
        count(when(col("__d") === -1, 1)).as("n_ends"))
      // calendar-scale running base (day-distinct rows — serial by design)
      .withColumn("__cum", sum("__net").over(byDay))
      .select(col("day"),
        (col("__cum") - col("__net")).as("base_concurrency"),
        (col("__cum") - col("__net") +
          greatest(lit(0L), col("__maxrun"))).as("peak_concurrency"),
        col("n_starts"), col("n_ends"))
  }
}
