package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis: bucket every key by the period of its FIRST
  * activity (the cohort), then count how many of each cohort's keys are
  * still active 1, 2, … periods later — the standard product-analytics
  * retention triangle, here in the engine-exact integer idiom (period
  * indices are integer day-diffs DIV bucketDays; retention shares are
  * integer-DIV permille, the t43 precedent).
  *
  * Plan shape: ONE key-shuffle + one tiny rollup. A single
  * `groupBy(key)` computes the cohort (min period) AND the key's distinct
  * active-period set in the same pass (`collect_set` over period indices —
  * bounded by the calendar horizon over bucketDays, e.g. weekly buckets
  * over a decade cap it at ~520 ints/key, so the map-side combine state is
  * O(horizon), NOT O(events); this is why it beats the naive
  * two-aggregation formulation, whose second distinct-(key, period) shuffle
  * re-exchanges the whole event volume). The exploded (cohort, offset)
  * frame then rolls up to at most horizon² rows — broadcast-joined against
  * per-cohort sizes, so nothing after the first shuffle touches event-scale
  * data. Offset 0 is every cohort's size by construction (each key is
  * active in its own first period), which the permille denominator reads
  * off the same rollup instead of a second scan.
  */
object Cohort {

  /** One row per (cohort_period, week_offset): active-key count and the
    * integer-permille retention vs the cohort's size.
    *
    * @param originDate period 0 starts here (ISO date); activity before it
    *                   would produce negative periods — callers pass the
    *                   corpus's known horizon start
    * @param bucketDays period width in days (7 = weekly retention)
    */
  def retention(events: DataFrame, key: Column, ts: Column,
                originDate: String, bucketDays: Int): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    val keyName = events.select(key).columns.head
    val perKey = events
      .select(key,
        datediff(to_date(ts), to_date(lit(originDate))).cast("long").as("__d"))
      // exact integer floor-division into period indices (no float path)
      .select(col(keyName), expr(s"__d DIV $bucketDays").as("__p"))
      .groupBy(col(keyName))
      .agg(min(col("__p")).as("cohort_period"),
        collect_set(col("__p")).as("__ps"))
    val cells = perKey
      .select(col("cohort_period"), explode(col("__ps")).as("__p"))
      .groupBy(col("cohort_period"), (col("__p") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cells.filter(col("period_offset") === 0)
      .select(col("cohort_period"), col("n_active").as("__cohort_size"))
    cells.join(broadcast(sizes), "cohort_period")
      .select(col("cohort_period"), col("period_offset"), col("n_active"),
        // integer permille: Spark DIV ≙ DuckDB // for non-negative longs
        expr("n_active * 1000 DIV __cohort_size").as("retention_permille"))
  }
}
