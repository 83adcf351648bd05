package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands consecutive-day streaks per key — the engagement
  * primitive behind retention dashboards ("current streak", "longest
  * streak") and habit-formation cohorts. An island is a maximal run of
  * consecutive ACTIVE days; the classic O(n) trick identifies it by the
  * constant `day_number − row_number()` within a key's sorted distinct
  * days (consecutive days advance both by 1, a gap advances only the
  * day number).
  *
  * Plan: `distinct` on (key, day) is the one data-scale shuffle; the
  * island window sorts the per-key DISTINCT-DAY rows (≤ days-in-range
  * per key, bounded by calendar not by traffic — a user with 10⁶ events
  * on one day contributes ONE row past the distinct); the island rollup
  * and the per-key report reuse the same hash partitioning, so the whole
  * chain is one exchange after the distinct. All emitted columns are
  * integers or dates — day arithmetic never touches a float.
  *
  * `best_streak_start` ties (two equal-length longest streaks) break to
  * the EARLIEST start — deterministic, engine-replayable.
  */
object Streaks {

  /** One row per key: `n_active_days`, `n_streaks`, `longest_streak`
    * (in days), `best_streak_start` (first day of the longest streak,
    * earliest on ties).
    */
  def dailyStreaks(events: DataFrame, key: Column, ts: Column): DataFrame = {
    val keyName = events.select(key).columns.head
    val days = events.select(key, to_date(ts).as("__day")).distinct()
    val byDay = Window.partitionBy(col(keyName)).orderBy(col("__day"))
    val islands = days
      .withColumn("__grp",
        datediff(col("__day"), lit("1970-01-01").cast("date")).cast("long")
          - row_number().over(byDay))
      .groupBy(col(keyName), col("__grp"))
      .agg(count(lit(1)).as("__len"), min("__day").as("__start"))
    val perKey = Window.partitionBy(col(keyName))
    islands
      .withColumn("__longest", max("__len").over(perKey))
      .groupBy(col(keyName))
      .agg(sum("__len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("__len").as("longest_streak"),
        min(when(col("__len") === col("__longest"), col("__start")))
          .as("best_streak_start"))
  }
}
