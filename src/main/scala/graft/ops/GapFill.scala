package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-key event
  * stream onto a DAILY calendar spine with forward fill — the step that
  * turns clickstream-shaped data into the dense matrix feature
  * pipelines and forecasting models consume (a model can't learn from
  * "no row that day"; it can from "value unchanged since Tuesday").
  *
  * Per key: one row per calendar day from the key's first to last
  * active day; `value` is that day's LAST observation (ties by event
  * id), forward-filled from the most recent observed day across gaps;
  * `observed` distinguishes real measurements from fill. The first day
  * is always observed by construction, so the fill never fabricates a
  * leading value.
  *
  * Plan: the per-(key, day) last-observation rollup is the ONLY
  * data-scale shuffle (max_by struct, partial map-side). Everything
  * after runs on CALENDAR-bounded rows — a key with 10⁶ events in one
  * day still yields one rollup row: the spine is a map-side
  * `sequence(first_day, last_day)` explode off the per-key span, and
  * the spine⋈obs join plus the `last(ignoreNulls)` running fill frame
  * exchange only those ≤ days-per-key rows. All emitted columns are
  * dates and integers — engine-exact.
  */
object GapFill {

  def dailyForwardFill(events: DataFrame, key: Column, ts: Column,
                       eventId: Column, value: Column): DataFrame = {
    val keyName = events.select(key).columns.head
    val obs = events
      .select(key, to_date(ts).as("day"), unix_micros(ts).as("__us"),
        eventId.as("__eid"), value.cast("long").as("__v"))
      .groupBy(col(keyName), col("day"))
      .agg(max(struct(col("__us"), col("__eid"), col("__v")))
        .getField("__v").as("__obs"))
    val spine = obs.groupBy(col(keyName))
      .agg(min("day").as("__d0"), max("day").as("__d1"))
      .select(col(keyName),
        explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
    val byDay = Window.partitionBy(col(keyName)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq(keyName, "day"), "left")
      .select(col(keyName), col("day"),
        last(col("__obs"), ignoreNulls = true).over(byDay).as("value"),
        col("__obs").isNotNull.as("observed"))
  }
}
