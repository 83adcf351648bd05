package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing RANGE-window rollups: per-key, per-period totals plus a
  * sliding N-period trailing sum — the moving-average/trailing-activity
  * report every metrics pipeline ships (7-day actives, trailing spend).
  *
  * RANGE framing (not ROWS): the frame is defined by period VALUE
  * distance, so missing periods genuinely age out — a ROWS frame would
  * reach back across gaps and silently widen the window, the classic
  * moving-average bug. Requires an integer period column (days since an
  * origin, hours, …), never a float.
  *
  * Plan shape: the EVENT-scale data crosses the wire once, map-side
  * combined — partial aggregation collapses each task's events to (key,
  * period) partials before the (key, period) exchange. The window's
  * key-only partitioning then costs a second Exchange, but it moves the
  * PRE-AGGREGATED daily frame (≤ calendar-horizon rows per key), not raw
  * events — at 100 TB the difference between re-shuffling the event log
  * and re-shuffling a per-day summary. (Collapsing to one exchange by
  * pre-partitioning on the key alone would shuffle RAW uncombined events —
  * strictly worse.) Values ride as integer micro-units (caller converts
  * once, the t18 idiom), so every trailing sum is order-independent
  * integer addition.
  */
object Rolling {

  /** One row per (key, period): that period's `n_events` and
    * `value_micro`, plus `n_trail` / `value_micro_trail` over the trailing
    * `windowPeriods` periods (current included).
    */
  def trailing(events: DataFrame, key: Column, period: Column,
               valueMicro: Column, windowPeriods: Int): DataFrame = {
    require(windowPeriods >= 1,
      s"windowPeriods must be >= 1, got $windowPeriods")
    val keyName = events.select(key).columns.head
    val daily = events
      .select(key, period.as("period"), valueMicro.as("__vm"))
      .groupBy(col(keyName), col("period"))
      .agg(count(lit(1)).as("n_events"), sum(col("__vm")).as("value_micro"))
    val w = Window.partitionBy(col(keyName)).orderBy(col("period"))
      .rangeBetween(-(windowPeriods - 1).toLong, 0L)
    daily
      .withColumn("n_trail", sum(col("n_events")).over(w))
      .withColumn("value_micro_trail", sum(col("value_micro")).over(w))
  }

  /** Trailing exact MEDIAN of the per-period totals — the robust twin
    * of [[trailing]]'s sums: a single spike day drags a trailing mean
    * for the whole window, while the median baseline (what anomaly
    * alerts should fire against) shrugs it off.
    *
    * Median = the LOWER median (element ⌈n/2⌉ of the sorted frame) —
    * an actual data value, integer, engine-exact; an interpolated even-
    * count median would be the t18 float class. The frame is the
    * trailing `windowPeriods` per-period totals (RANGE framing, same
    * gap-aging argument as [[trailing]]), so the collected list is
    * bounded by `windowPeriods` — per-row state is O(window), never
    * O(history), which is what makes the collect admissible at 100 TB.
    */
  def trailingMedian(events: DataFrame, key: Column, period: Column,
                     valueMicro: Column, windowPeriods: Int): DataFrame = {
    require(windowPeriods >= 1,
      s"windowPeriods must be >= 1, got $windowPeriods")
    val keyName = events.select(key).columns.head
    val daily = events
      .select(key, period.as("period"), valueMicro.as("__vm"))
      .groupBy(col(keyName), col("period"))
      .agg(count(lit(1)).as("n_events"), sum(col("__vm")).as("value_micro"))
    val w = Window.partitionBy(col(keyName)).orderBy(col("period"))
      .rangeBetween(-(windowPeriods - 1).toLong, 0L)
    daily
      .withColumn("__frame", collect_list(col("value_micro")).over(w))
      .select(col(keyName), col("period"), col("n_events"),
        col("value_micro"),
        size(col("__frame")).cast("long").as("n_frame"),
        element_at(sort_array(col("__frame")),
          ((size(col("__frame")) + 1) / 2).cast("int"))
          .as("median_micro_trail"))
  }
}
