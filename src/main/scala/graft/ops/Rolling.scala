package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

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

  /** Trailing Pearson correlation between TWO per-period series (the
    * "do these metrics move together this week" panel — purchases vs
    * clicks, errors vs deploys). The event stream crosses the wire
    * once into a per-period two-column rollup (conditional partial
    * sums — one pass, no pivot); the window then runs over
    * calendar-scale rows only.
    *
    * The five frame moments (Σx, Σy, Σx², Σy², Σxy) accumulate on
    * DECIMAL(38,0) — per-period totals square past 2⁶³ as soon as a
    * period sums ~10⁹·µ units, so int64 products are a scale trap.
    * Correlation leaves integers only at the last step:
    * `num = n·Σxy − Σx·Σy`, `den² = (n·Σx²−Σx²)·(n·Σy²−Σy²)`, both
    * exact, then one double division + correctly-rounded sqrt,
    * rounded to 6dp (the w37/t21 cross-engine contract). Degenerate
    * frames (n<2 or a constant series) emit null, not NaN.
    *
    * RANGE framing over the integer period index, same gap-aging
    * argument as [[trailing]]: a missing period ages out by VALUE
    * distance instead of silently widening a ROWS frame.
    */
  def rollingCorr(events: DataFrame, period: Column, typeCol: Column,
                  valueMicro: Column, typeX: String, typeY: String,
                  windowPeriods: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(windowPeriods >= 2,
      s"windowPeriods must be >= 2, got $windowPeriods")
    val dec = DecimalType(38, 0)
    val daily = events
      .filter(typeCol.isin(typeX, typeY))
      .groupBy(period.as("period"))
      .agg(sum(when(typeCol === typeX, valueMicro).otherwise(0L)).as("x"),
        sum(when(typeCol === typeY, valueMicro).otherwise(0L)).as("y"))
    val w = Window.orderBy(col("period"))
      .rangeBetween(-(windowPeriods - 1).toLong, 0L)
    val m = daily
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(col("x").cast(dec)).over(w))
      .withColumn("__sy", sum(col("y").cast(dec)).over(w))
      .withColumn("__sxx",
        sum((col("x").cast(dec) * col("x").cast(dec)).cast(dec)).over(w))
      .withColumn("__syy",
        sum((col("y").cast(dec) * col("y").cast(dec)).cast(dec)).over(w))
      .withColumn("__sxy",
        sum((col("x").cast(dec) * col("y").cast(dec)).cast(dec)).over(w))
    val num = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val denX = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val denY = col("__n") * col("__syy") - col("__sy") * col("__sy")
    m.select(col("period"), col("x"), col("y"),
      col("__n").as("n_frame"),
      when(col("__n") >= 2 && denX > 0 && denY > 0,
        round(num.cast("double") /
          sqrt(denX.cast("double") * denY.cast("double")), 6))
        .as("corr_trail"))
  }

  /** Bollinger-band breakout flags over per-period totals — the rolling
    * mean ± k·σ volatility gate, with the σ comparison done WITHOUT a
    * square root: `|v − μ| > k·σ` squares (both sides non-negative) to
    * `(n·v − s)² > k²·(n·q − s²)` over the trailing count/sum/sum-of-
    * squares — exact integer arithmetic, no float ever enters the flag.
    * Values ride MILLI-units (coarser than [[trailing]]'s micro idiom —
    * the squares grow as v²·n²) and the squared terms run in
    * DECIMAL(38,0), so the comparison stays exact to 38 digits on both
    * engines (DuckDB's window sums promote to HUGEINT; a pure-int64
    * Spark product would silently wrap past ~1e9-milli daily sums).
    *
    * Same two-exchange plan as [[trailing]] (event-scale partials, then
    * the per-key daily frame); `sum_milli` is emitted instead of the mean
    * so no signed division (Spark `div` truncates toward zero, DuckDB
    * `//` floors — they disagree on negatives) touches the output.
    */
  def bollingerBreakouts(events: DataFrame, key: Column, period: Column,
                         valueMilli: Column, windowPeriods: Int = 7,
                         k: Long = 2L, minPeriods: Int = 3): DataFrame = {
    require(windowPeriods >= 1 && k >= 1 && minPeriods >= 1,
      "windowPeriods, k, minPeriods must be >= 1")
    val keyName = events.select(key).columns.head
    val daily = events
      .select(key, period.as("period"), valueMilli.as("__vm"))
      .groupBy(col(keyName), col("period"))
      .agg(sum(col("__vm")).as("v_milli"))
    val w = Window.partitionBy(col(keyName)).orderBy(col("period"))
      .rangeBetween(-(windowPeriods - 1).toLong, 0L)
    // the squared terms run in DECIMAL(38,0): q ~ n·v², so daily sums past
    // ~1e9 milli would wrap a pure-int64 product while DuckDB's HUGEINT
    // stays exact — decimal keeps both engines exact to 38 digits
    val dec = DataTypes.createDecimalType(38, 0)
    daily
      .withColumn("n_days", count(lit(1)).over(w))
      .withColumn("sum_milli", sum(col("v_milli")).over(w))
      .withColumn("__q", sum(col("v_milli").cast(dec) *
        col("v_milli").cast(dec)).over(w))
      .filter(col("n_days") >= minPeriods)
      .withColumn("__dev",
        (col("n_days") * col("v_milli") - col("sum_milli")).cast(dec))
      .select(col(keyName), col("period"), col("v_milli"), col("n_days"),
        col("sum_milli"),
        (col("__dev") * col("__dev") >
          lit(k * k).cast(dec) * (col("n_days").cast(dec) * col("__q") -
            col("sum_milli").cast(dec) * col("sum_milli").cast(dec)))
          .as("breakout"))
  }
}
