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

  /** Holt double-exponential smoothing per key — [[smooth]] plus a
    * TREND state, the standard next-step forecaster for series with
    * drift (an EWMA alone always lags a trending series; Holt's
    * `forecast = level + trend` does not). Same exact-integer contract:
    *
    *   `l₀ = v₀, b₀ = 0;`
    *   `lᵢ = (α·vᵢ + (10⁶−α)·(lᵢ₋₁+bᵢ₋₁)) DIV 10⁶;`
    *   `bᵢ = (β·(lᵢ−lᵢ₋₁) + (10⁶−β)·bᵢ₋₁) DIV 10⁶`
    *
    * — both DIVs truncate toward zero identically in Scala/Spark/DuckDB
    * (the w12 verification), so negatives and down-trends replay. The
    * fold state is a STRUCT (level, trend) threaded through the same
    * codegen'd `aggregate` HOF; `lᵢ` appears twice in the `bᵢ` update
    * (once as the new level, once in the delta) and is deliberately
    * duplicated inline — SQL lambdas have no `let`, and the double
    * evaluation of an exact integer expression cannot diverge.
    *
    * Same plan, state and headroom story as [[smooth]]; emission
    * `(level_milli, trend_milli, forecast_milli = level + trend)` needs
    * no look-back, so the incremental `mapGroupsWithState` form carries
    * two longs of state.
    */
  def holt(events: DataFrame, key: Column, ts: Column, eventId: Column,
           valueMilli: Column, alphaPpm: Long, betaPpm: Long): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000,
      s"alphaPpm $alphaPpm out of (0, 1e6]")
    require(betaPpm >= 1 && betaPpm <= 1000000,
      s"betaPpm $betaPpm out of (0, 1e6]")
    val keyName = events.select(key).columns.head
    val (a, na) = (alphaPpm, 1000000L - alphaPpm)
    val (b, nb) = (betaPpm, 1000000L - betaPpm)
    val lNew = s"(($a * v + $na * (s.l + s.b)) DIV 1000000)"
    events
      .select(key, unix_micros(ts).as("__us"), eventId.as("__eid"),
        valueMilli.as("__vm"))
      .groupBy(col(keyName))
      .agg(count(lit(1)).as("n_obs"), max("__us").as("last_us"),
        sort_array(collect_list(struct(col("__us"), col("__eid"),
          col("__vm")))).as("__l"))
      .withColumn("__st", expr(
        s"""aggregate(transform(__l, t -> t.__vm),
            named_struct('l', CAST(NULL AS BIGINT), 'b', CAST(NULL AS BIGINT)),
            (s, v) -> CASE WHEN s.l IS NULL
              THEN named_struct('l', v, 'b', CAST(0 AS BIGINT))
              ELSE named_struct(
                'l', $lNew,
                'b', (($b * ($lNew - s.l) + $nb * s.b) DIV 1000000))
              END)"""))
      .select(col(keyName), col("n_obs"), col("last_us"),
        col("__st.l").as("level_milli"), col("__st.b").as("trend_milli"),
        (col("__st.l") + col("__st.b")).as("forecast_milli"))
  }

  /** Holt–Winters triple exponential smoothing (additive seasonality,
    * fixed `period` = 7 — the weekly cycle every engagement series
    * carries), completing the smoothing family: EWMA (level), Holt
    * (level+trend), Holt–Winters (level+trend+season). Same exact-hash
    * contract as [[smooth]]/[[holt]]: every recurrence is an integer
    * `DIV 10⁶` in ppm weights over a totally-ordered timeline, so the
    * fold replays bit-identically on any engine and any partitioning.
    *
    * Initialization (the standard simple scheme, made fold-shaped):
    * the first 7 observations seed `level = Σv DIV 7`, `trend = 0`,
    * `season[j] = vⱼ − level`; from observation 8 on, the classic
    * additive recurrences run. Keys with fewer than 8 observations are
    * dropped — no seasonal estimate exists to emit.
    *
    * The 7 seasonal slots are EXPLICIT struct fields (not an array):
    * each step rewrites one slot via a CASE per field, which keeps the
    * whole state codegen-friendly in Spark AND lets the oracle carry
    * the identical state as 7 recursive-CTE columns — an array state
    * would force list surgery DuckDB lambdas can't index.
    *
    * Plan: identical to [[holt]] — one groupBy shuffle, sorted
    * per-key array, one aggregate-HOF fold; `mapGroupsWithState` is
    * the unbounded-stream analog (state = 9 longs).
    */
  def holtWinters(events: DataFrame, key: Column, ts: Column,
                  eventId: Column, valueMilli: Column, alphaPpm: Long,
                  betaPpm: Long, gammaPpm: Long): DataFrame = {
    for ((n, p) <- Seq("alpha" -> alphaPpm, "beta" -> betaPpm,
        "gamma" -> gammaPpm))
      require(p >= 1 && p <= 1000000, s"${n}Ppm $p out of (0, 1e6]")
    val keyName = events.select(key).columns.head
    val (a, na) = (alphaPpm, 1000000L - alphaPpm)
    val (b, nb) = (betaPpm, 1000000L - betaPpm)
    val (g, ng) = (gammaPpm, 1000000L - gammaPpm)
    val slots = 1 to 7
    def fields(vals: Seq[String]): String =
      slots.zip(vals).map { case (k, v) => s"'s$k', ($v)" }.mkString(", ")
    // phase A (obs 1..6): accumulate the sum in l, park raw v in slot i
    val phaseA = s"""named_struct('i', s.i + 1L, 'l', s.l + v, 'b', 0L,
      ${fields(slots.map(k => s"CASE WHEN s.i + 1 = $k THEN v ELSE s.s$k END"))})"""
    // phase B (obs 7): level = mean of the period, slots become v − level
    val lInit = "((s.l + v) DIV 7)"
    val phaseB = s"""named_struct('i', 7L, 'l', $lInit, 'b', 0L,
      ${fields(slots.map(k =>
        if (k == 7) s"v - $lInit" else s"s.s$k - $lInit"))})"""
    // phase C (obs > 7): classic additive recurrences on slot j
    val j = "(CAST(s.i % 7 AS INT) + 1)" // this obs is position s.i + 1
    val sj = s"element_at(array(${slots.map(k => s"s.s$k").mkString(", ")}), $j)"
    val lNew = s"(($a * (v - $sj) + $na * (s.l + s.b)) DIV 1000000)"
    val bNew = s"(($b * ($lNew - s.l) + $nb * s.b) DIV 1000000)"
    val sjNew = s"(($g * (v - $lNew) + $ng * $sj) DIV 1000000)"
    val phaseC = s"""named_struct('i', s.i + 1L, 'l', $lNew, 'b', $bNew,
      ${fields(slots.map(k => s"CASE WHEN $j = $k THEN $sjNew ELSE s.s$k END"))})"""
    val init = s"named_struct('i', 0L, 'l', 0L, 'b', 0L, ${fields(slots.map(_ => "0L"))})"
    events
      .select(key, unix_micros(ts).as("__us"), eventId.as("__eid"),
        valueMilli.as("__vm"))
      .groupBy(col(keyName))
      .agg(count(lit(1)).as("n_obs"), max("__us").as("last_us"),
        sort_array(collect_list(struct(col("__us"), col("__eid"),
          col("__vm")))).as("__l"))
      .filter(col("n_obs") >= 8)
      .withColumn("__st", expr(
        s"""aggregate(transform(__l, t -> t.__vm), $init,
            (s, v) -> CASE WHEN s.i < 6 THEN $phaseA
                           WHEN s.i = 6 THEN $phaseB
                           ELSE $phaseC END)"""))
      // forecast for position n+1 reads slot ((n) mod 7) + 1
      .withColumn("__jn", (col("n_obs") % 7 + 1).cast("int"))
      .withColumn("__sn", element_at(
        array(slots.map(k => col(s"__st.s$k")): _*), col("__jn")))
      .select(col(keyName), col("n_obs"), col("last_us"),
        col("__st.l").as("level_milli"), col("__st.b").as("trend_milli"),
        col("__sn").as("season_milli"),
        (col("__st.l") + col("__st.b") + col("__sn")).as("forecast_milli"))
  }

  /** One-step-ahead EWMA backtest — the forecast-quality report that
    * decides whether [[smooth]]'s α is any good BEFORE the smoothed
    * value feeds an alert threshold: at every step i ≥ 1 the forecast
    * is the previous smoothed state, the error is `vᵢ − sᵢ₋₁`, and the
    * per-key report carries MAE plus the signed error sums (a biased
    * α under-reacts in one direction; MAE alone can't see that).
    *
    * Same single-shuffle sorted-fold plan as [[smooth]] — the fold
    * state is a struct `(s, sae, se, nf)` threaded through the same
    * codegen'd `aggregate` HOF, so the backtest costs exactly one
    * extra struct over the smoothing it evaluates. All emissions are
    * exact int64; `mae_milli = sae DIV nf` (sae ≥ 0 so truncation is
    * floor) and `bias_milli = se DIV nf` (both engines truncate
    * toward zero — verified: DuckDB `-7 // 2 = -3`). Single-
    * observation keys emit null metrics (no forecast ever made).
    */
  def backtest(events: DataFrame, key: Column, ts: Column,
               eventId: Column, valueMilli: Column,
               alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000,
      s"alphaPpm $alphaPpm out of (0, 1e6]")
    val keyName = events.select(key).columns.head
    val beta = 1000000L - alphaPpm
    events
      .select(key, unix_micros(ts).as("__us"), eventId.as("__eid"),
        valueMilli.as("__vm"))
      .groupBy(col(keyName))
      .agg(count(lit(1)).as("n_obs"),
        sort_array(collect_list(struct(col("__us"), col("__eid"),
          col("__vm")))).as("__l"))
      .select(col(keyName), col("n_obs"),
        expr(s"""aggregate(transform(__l, t -> t.__vm),
                 named_struct('s', CAST(NULL AS BIGINT),
                   'sae', CAST(0 AS BIGINT), 'se', CAST(0 AS BIGINT),
                   'nf', CAST(0 AS BIGINT)),
                 (st, v) -> CASE WHEN st.s IS NULL
                   THEN named_struct('s', v, 'sae', CAST(0 AS BIGINT),
                     'se', CAST(0 AS BIGINT), 'nf', CAST(0 AS BIGINT))
                   ELSE named_struct(
                     's', ($alphaPpm * v + $beta * st.s) DIV 1000000,
                     'sae', st.sae + abs(v - st.s),
                     'se', st.se + (v - st.s),
                     'nf', st.nf + 1) END)""").as("__bt"))
      .select(col(keyName), col("n_obs"),
        col("__bt.nf").as("n_forecasts"),
        when(col("__bt.nf") > 0,
          expr("__bt.sae DIV __bt.nf")).as("mae_milli"),
        when(col("__bt.nf") > 0,
          expr("__bt.se DIV __bt.nf")).as("bias_milli"),
        col("__bt.sae").as("sum_abs_err_milli"),
        col("__bt.se").as("sum_err_milli"))
  }
}
