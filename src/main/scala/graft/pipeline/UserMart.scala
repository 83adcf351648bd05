package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The user-360 analytics mart: per key, session count (gap rule), ordered
  * funnel stage, cohort day, and the time-weighted average of the held
  * value — four operators' worth of per-user analytics from ONE shuffle
  * and ONE sorted fold, where running [[graft.ops.Sessionize]],
  * [[graft.ops.Funnel]], [[graft.ops.Cohort]] and
  * [[graft.ops.Scd2.timeWeightedMean]] separately would scan and shuffle
  * the event log four times. All four recurrences consume the same
  * (ts, event_id)-sorted per-key event list, so they fold together:
  * state is eight integers.
  *
  * Exactness: the same integer idioms as the standalone operators — µs
  * gaps, milli-unit values × µs durations (int64 headroom documented at
  * [[graft.ops.Scd2.timeWeightedMean]]), strict-after funnel gate.
  * Same-µs ties cannot advance the funnel in any processing order (the
  * strict gate), so the event_id tie-break affects nothing but is pinned
  * for determinism.
  *
  * Scale caveat, stated honestly: the fold materializes each key's event
  * list (`collect_list`), bounded by per-key event count — right for
  * entity-keyed analytics where a key holds thousands of events, wrong
  * for a key holding 10⁸; such keys want the standalone window-based
  * operators (one O(1)-state window pass each, no list), trading the 4×
  * scan for bounded memory. This mart IS the fused fast path, not the
  * only path.
  */
object UserMart {

  /** One row per key: `cohort_day`, `n_sessions`, `funnel_stage`,
    * `held_us`, `twap_milli`.
    */
  def user360(events: DataFrame, key: Column, ts: Column, tieBreak: Column,
              step: Column, valueMilli: Column, steps: Seq[String],
              gapSeconds: Long, originDate: String,
              horizonTs: String): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps, "bad steps")
    require(gapSeconds >= 1, "gapSeconds must be >= 1")
    val keyName = events.select(key).columns.head
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(0)) { case (acc, (name, i)) =>
        when(step === name, lit(i + 1)).otherwise(acc)
      }
    val gapUs = gapSeconds * 1000000L
    val horizonUs = unix_micros(to_timestamp(lit(horizonTs)))
    val z = lit(0L)
    val init = struct(
      lit(-1L).as("prevUs"), z.as("prevVm"), z.as("firstUs"),
      z.as("sessions"), lit(0).as("stage"), lit(Long.MinValue).as("at"),
      z.as("wsum"))
    events
      .select(key, unix_micros(ts).as("__us"), tieBreak.as("__tie"),
        stepIdx.as("__step"), valueMilli.as("__vm"),
        datediff(to_date(ts), to_date(lit(originDate))).cast("long")
          .as("__day"))
      .groupBy(col(keyName))
      .agg(min(col("__day")).as("cohort_day"),
        sort_array(collect_list(struct(col("__us"), col("__tie"),
          col("__step"), col("__vm")))).as("__evs"))
      .select(col(keyName), col("cohort_day"),
        aggregate(col("__evs"), init,
          (s, e) => {
            val us = e.getField("__us")
            val newSession = s.getField("prevUs") < 0L ||
              us - s.getField("prevUs") > gapUs
            val advance = e.getField("__step") === s.getField("stage") + 1 &&
              us > s.getField("at")
            struct(
              us.as("prevUs"),
              e.getField("__vm").as("prevVm"),
              when(s.getField("prevUs") < 0L, us)
                .otherwise(s.getField("firstUs")).as("firstUs"),
              (s.getField("sessions") +
                when(newSession, 1L).otherwise(0L)).as("sessions"),
              when(advance, s.getField("stage") + 1)
                .otherwise(s.getField("stage")).as("stage"),
              when(advance, us).otherwise(s.getField("at")).as("at"),
              (s.getField("wsum") + when(s.getField("prevUs") < 0L, 0L)
                .otherwise(s.getField("prevVm") *
                  (us - s.getField("prevUs")))).as("wsum"))
          },
          // horizon close: the last value holds until horizonTs
          s => struct(
            s.getField("sessions").as("n_sessions"),
            s.getField("stage").as("funnel_stage"),
            (horizonUs - s.getField("firstUs")).as("held_us"),
            (s.getField("wsum") + s.getField("prevVm") *
              (horizonUs - s.getField("prevUs"))).as("wsum"))
        ).as("__r"))
      .select(col(keyName), col("cohort_day"),
        col("__r.n_sessions").as("n_sessions"),
        col("__r.funnel_stage").as("funnel_stage"),
        col("__r.held_us").as("held_us"),
        when(col("__r.held_us") > 0, expr("__r.wsum DIV __r.held_us"))
          .otherwise(lit(0L)).as("twap_milli"))
  }
}
