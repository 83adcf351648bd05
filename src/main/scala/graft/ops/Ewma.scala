package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per key, in pure integer
  * arithmetic — the time-series smoothing primitive (load trending,
  * per-user engagement decay) under an exact-hash contract.
  *
  * The recurrence `s₀ = v₀; sᵢ = (α·vᵢ + (10⁶−α)·sᵢ₋₁) DIV 10⁶` (α in
  * ppm) runs over each key's timeline ordered by `(timestamp, event_id)`
  * — a TOTAL order, so the fold is deterministic on any engine. The
  * float formulation (`α·v + (1−α)·s`) is not replayable across engines
  * (the t18 rounding class); integer DIV is, and both Spark's `DIV` and
  * DuckDB's `//` truncate toward zero, so the contract holds for
  * negative values too.
  *
  * Plan shape: ONE shuffle (the groupBy), partial-aggregated collect;
  * the fold itself is a codegen'd `aggregate` HOF over the sorted
  * per-key array. Per-key state is the series length — fine for
  * bounded-history keys (user timelines); for unbounded streams the
  * same integer recurrence runs incrementally in a
  * `mapGroupsWithState` (state = one long), which is why the emission
  * is designed to need no look-back beyond the previous smoothed value.
  *
  * Int64 headroom: `α·v` needs `|v| · 10⁶ < 2⁶³`, i.e. `|value_milli| <
  * 9.2×10¹²` (≈ 9.2 billion in original units at milli scale).
  */
object Ewma {

  /** One row per key: `n_obs`, `last_us`, and the final smoothed value
    * `ewma_milli`. `valueMilli` must already be an integer column (use
    * `CAST(round(value * 1000) AS BIGINT)` upstream for doubles).
    */
  def smooth(events: DataFrame, key: Column, ts: Column, eventId: Column,
             valueMilli: Column, alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000,
      s"alphaPpm $alphaPpm out of (0, 1e6]")
    val keyName = events.select(key).columns.head
    val beta = 1000000L - alphaPpm
    events
      .select(key, unix_micros(ts).as("__us"), eventId.as("__eid"),
        valueMilli.as("__vm"))
      .groupBy(col(keyName))
      .agg(count(lit(1)).as("n_obs"), max("__us").as("last_us"),
        sort_array(collect_list(struct(col("__us"), col("__eid"),
          col("__vm")))).as("__l"))
      .select(col(keyName), col("n_obs"), col("last_us"),
        expr(s"""aggregate(transform(__l, t -> t.__vm),
                 CAST(NULL AS BIGINT),
                 (s, v) -> CASE WHEN s IS NULL THEN v
                   ELSE ($alphaPpm * v + $beta * s) DIV 1000000 END)""")
          .as("ewma_milli"))
  }
}
