package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival curve over user lifetimes — the churn
  * analyst's standard answer to "what fraction of users are still
  * active after N days", done right: users still active at the
  * observation edge are CENSORED (they leave the risk set without
  * counting as churn), which is exactly what a naive retention ratio
  * gets wrong.
  *
  * Lifetime = days from a user's first to last event. A user whose
  * last activity is within `churnGapDays` of the corpus's last day
  * might still return — censored; otherwise the lifetime ended in
  * observed churn. At each observed-churn duration `t`:
  * `S(t) = S(prev) · (r_t − d_t) DIV r_t` with `r_t` = users whose
  * lifetime ≥ t (the risk set) and `d_t` = churn events at exactly t —
  * a sequential integer fold (ppm), deterministic and engine-exact;
  * the float product Π(1−dᵢ/rᵢ) is the t18 class.
  *
  * Plan: the per-user lifetime rollup is the one data-scale shuffle.
  * Everything after runs on DURATION-DISTINCT rows (≤ calendar days):
  * risk counts come from one descending cumulative sum, and the KM
  * fold collects those rows into ONE array (calendar-bounded by
  * construction — documented single-row stage, same deliberate choice
  * as [[graft.text.Mixing.largestRemainder]]'s strata sort) and folds
  * with an `aggregate` HOF, fanning back out with `posexplode`.
  */
object Survival {

  def kaplanMeier(events: DataFrame, key: Column, ts: Column,
                  churnGapDays: Int): DataFrame = {
    require(churnGapDays >= 1, "churnGapDays must be >= 1")
    val spans = events
      .select(key.as("__k"), to_date(ts).as("__day"))
      .groupBy(col("__k"))
      .agg(min("__day").as("__first"), max("__day").as("__last"))
    val edge = spans.agg(max("__last").as("__edge"))
    val lifetimes = spans.crossJoin(broadcast(edge))
      .select(datediff(col("__last"), col("__first")).cast("long")
          .as("duration_days"),
        (datediff(col("__edge"), col("__last")) >= churnGapDays)
          .as("__churned"))
    val byDur = lifetimes
      .groupBy(col("duration_days"))
      .agg(count(when(col("__churned"), 1)).as("n_events"),
        count(when(!col("__churned"), 1)).as("n_censored"))
    // risk set = Σ (events + censored) over durations ≥ t: one
    // descending running sum over the duration-distinct rows
    import org.apache.spark.sql.expressions.Window
    val desc = Window.orderBy(col("duration_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = byDur.select(col("duration_days"), col("n_events"),
      col("n_censored"),
      sum(col("n_events") + col("n_censored")).over(desc).as("n_risk"))
    // KM fold over the duration-ascending rows, collected into one
    // calendar-bounded array; censor-only durations multiply by r/r = 1,
    // so folding every row keeps S exact and the emission per-duration
    risked.agg(sort_array(collect_list(struct(col("duration_days"),
        col("n_events"), col("n_censored"), col("n_risk")))).as("__rows"))
      .select(expr(
        """aggregate(__rows, CAST(array() AS ARRAY<BIGINT>), (acc, x) ->
           array_append(acc,
             (IF(size(acc) = 0, CAST(1000000 AS BIGINT),
                 element_at(acc, -1))
              * (x.n_risk - x.n_events)) DIV x.n_risk))""").as("__s"),
        col("__rows"))
      .select(posexplode(expr("arrays_zip(__rows, __s)"))
        .as(Seq("__i", "__z")))
      .select(col("__z.__rows.duration_days").as("duration_days"),
        col("__z.__rows.n_risk").as("n_risk"),
        col("__z.__rows.n_events").as("n_events"),
        col("__z.__rows.n_censored").as("n_censored"),
        col("__z.__s").as("survival_ppm"))
  }
}
