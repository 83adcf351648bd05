package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM changepoint scan per key, in pure integer arithmetic: the
  * cumulative sum of deviations from the key's own mean,
  * `S_i = Σ_{j≤i}(v_j − μ)`, peaks in magnitude AT the changepoint when
  * a level shift exists (Page 1954; the classic mean-shift detector).
  * Emits where the series most plausibly broke and how hard — the
  * telemetry/drift primitive ("when did this metric change regime").
  *
  * Integer discipline: μ is the TRUNCATED mean `Σv DIV n` (documented —
  * the remainder leaks ≤ n−1 into the final cusum, irrelevant to the
  * argmax location for any real shift); `S_i = prefix_i − i·μ` needs no
  * second pass — prefix sums and row numbers ride ONE window. The
  * argmax (largest |S|, tie → earliest) is a `min(struct(−|S|, us))`
  * aggregate, deterministic on any engine.
  *
  * Plan: ONE shuffle on the key; the window and the final rollup share
  * its clustering. Int64: |v|·n < 2⁶³ — milli-unit values to ~10¹²
  * rows/key.
  */
object Changepoint {

  /** One row per key: `n_obs`, `mean_milli`, `max_abs_cusum`, `at_us`
    * (timestamp of the peak deviation, earliest on ties).
    */
  def cusum(events: DataFrame, key: Column, ts: Column, eventId: Column,
            valueMilli: Column): DataFrame = {
    val keyName = events.select(key).columns.head
    val byTime = Window.partitionBy(col(keyName))
      .orderBy(col("__us"), col("__eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(keyName))
    events
      .select(key, unix_micros(ts).as("__us"), eventId.as("__eid"),
        valueMilli.as("__vm"))
      .select(col(keyName), col("__us"),
        sum("__vm").over(byTime).as("__prefix"),
        row_number().over(Window.partitionBy(col(keyName))
          .orderBy(col("__us"), col("__eid"))).as("__rn"),
        sum("__vm").over(whole).as("__tot"),
        count(lit(1)).over(whole).as("__n"))
      .select(col(keyName), col("__us"), col("__n"),
        call_function("div", col("__tot"), col("__n")).as("__mean"),
        (col("__prefix") - col("__rn") *
          call_function("div", col("__tot"), col("__n"))).as("__cusum"))
      .groupBy(col(keyName))
      .agg(max("__n").as("n_obs"), max("__mean").as("mean_milli"),
        min(struct((-abs(col("__cusum"))).as("neg"), col("__us").as("us")))
          .as("__peak"))
      .select(col(keyName), col("n_obs"), col("mean_milli"),
        (-col("__peak.neg")).as("max_abs_cusum"),
        col("__peak.us").as("at_us"))
  }
}
