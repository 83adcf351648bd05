package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal-regularity profile per key — the bot/automation signal: a
  * human's events spread across hours of the day; a cron job's pile into
  * one. Emits, per key, the event count, the number of DISTINCT active
  * hours-of-day, and the share of the busiest hour in integer ppm
  * (`max_hourly · 10⁶ DIV n` — a scheduled scraper scores ≈ 10⁶, a human
  * ≪ 300 000).
  *
  * Plan: groupBy (key, hour) partial-aggregates map-side (24 rows per
  * key maximum cross the wire), then the per-key rollup — the second
  * exchange moves only the hourly table, which is 24× smaller than the
  * events. No window, no sort. The hour comes from `hour(ts)` in the
  * session timezone; pin `spark.sql.session.timeZone` (the driver runs
  * UTC) so the bucketing is reproducible across engines.
  */
object ActivityProfile {

  def hourlyRegularity(events: DataFrame, key: Column,
                       ts: Column): DataFrame = {
    val keyName = events.select(key).columns.head
    events
      .select(key, hour(ts).as("__h"))
      .groupBy(col(keyName), col("__h"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(keyName))
      .agg(sum("__c").as("n_events"),
        count(lit(1)).as("n_hours"),
        max("__c").as("__max"))
      .select(col(keyName), col("n_events"), col("n_hours"),
        call_function("div", col("__max") * 1000000L, col("n_events"))
          .as("top_hour_share_ppm"))
  }

  /** Day-of-week seasonality index per group — the weekly-rhythm report
    * behind staffing, send-time, and anomaly baselines: per (group,
    * ISO day-of-week 1=Monday), the event count, its share of the
    * group's total (ppm), and the seasonality index (share × 7 — 10⁶
    * means a perfectly flat week, 2·10⁶ a day carrying twice its flat
    * share). Exact integers end to end.
    *
    * Plan: one (group, dow) partial-before-shuffle rollup (≤ 7 rows per
    * group cross the wire), then the group-total window over the
    * 7-rows-per-group table — never the events. `weekday(ts)+1` is
    * ISO-Monday numbering on any engine (DuckDB `isodow`).
    */
  def dowSeasonality(events: DataFrame, group: Column,
                     ts: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groupName = events.select(group).columns.head
    val counts = events
      .select(group, (weekday(ts) + 1).as("iso_dow"))
      .groupBy(col(groupName), col("iso_dow"))
      .agg(count(lit(1)).as("n_events"))
    counts
      .withColumn("__tot",
        sum(col("n_events")).over(Window.partitionBy(col(groupName))))
      .select(col(groupName), col("iso_dow"), col("n_events"),
        call_function("div", col("n_events") * 1000000L, col("__tot"))
          .as("share_ppm"),
        call_function("div", col("n_events") * 7000000L, col("__tot"))
          .as("index_ppm"))
  }

  /** (ISO day-of-week × hour) activity heatmap per group — the 168-cell
    * weekly rhythm grid behind on-call staffing and anomaly baselines,
    * [[dowSeasonality]]'s two-dimensional refinement. Emits count and
    * within-group share (exact ppm) per populated cell; the group-total
    * window runs over ≤168 rows per group, never the events.
    */
  def dowHourHeatmap(events: DataFrame, group: Column,
                     ts: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groupName = events.select(group).columns.head
    events
      .select(group, (weekday(ts) + 1).as("iso_dow"), hour(ts).as("hour"))
      .groupBy(col(groupName), col("iso_dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("__tot",
        sum(col("n_events")).over(Window.partitionBy(col(groupName))))
      .select(col(groupName), col("iso_dow"), col("hour"), col("n_events"),
        call_function("div", col("n_events") * 1000000L, col("__tot"))
          .as("share_ppm"))
  }
}
