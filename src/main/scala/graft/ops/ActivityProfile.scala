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
}
