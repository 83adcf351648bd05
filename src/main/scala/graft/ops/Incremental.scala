package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the nightly-snapshot pattern the
  * reference's delete-insert consume loop implies (recompute a partition,
  * keep the rest; cf. `script/main.py`'s per-run-date delete-insert): a
  * per-key aggregate STATE is kept as a table of mergeable partials, and
  * each new batch folds in WITHOUT rescanning history.
  *
  * Why this matters at 100 TB: the full-history rollup rescans everything
  * ever ingested on every run; the incremental form scans ONLY the new
  * batch (delta-scale) plus the state table (key-scale). All chosen
  * statistics are commutative monoids — count/sum add, min/max combine,
  * so `merge(state(A), state(B)) == state(A ∪ B)` exactly, which is the
  * algebraic fact the oracle checks (the oracle recomputes from the full
  * history; the engine never does).
  *
  * Plan shape: one map-side-combined shuffle per batch at delta scale,
  * then a key-scale union+re-aggregate for the merge. Timestamps ride as
  * `epoch_us` int64 (engine-neutral, no timezone surface); money as
  * micro-units — both exact under re-aggregation in any order.
  */
object Incremental {

  /** Mergeable per-key partial state of one batch: event count, exact
    * micro-value sum, first/last event time (epoch µs).
    */
  def state(events: DataFrame, key: Column, ts: Column,
            valueMicro: Column): DataFrame =
    events
      .select(key.as("key"), unix_micros(ts).as("__us"),
        valueMicro.as("__vm"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        sum(col("__vm")).as("value_micro"),
        min(col("__us")).as("first_us"),
        max(col("__us")).as("last_us"))

  /** Fold any number of partial states into one — the nightly merge.
    * Associative and commutative: every column is a monoid fold
    * (sum/sum/min/max), so batch arrival order never changes the result.
    */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    states.reduce(_ unionByName _)
      .groupBy("key")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("value_micro")).as("value_micro"),
        min(col("first_us")).as("first_us"),
        max(col("last_us")).as("last_us"))
  }
}
