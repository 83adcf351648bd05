package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merged-interval coverage per key — the gaps-and-islands classic
  * ("how much wall-clock was this user actually active, counting
  * overlapping sessions once"): billing meters, SLA uptime, ad
  * exposure, GPU-hour accounting. Complements [[Concurrency]] (how
  * MANY intervals are open at once) and [[Sessionize]] (gap-based
  * session splits): here the intervals themselves arrive with explicit
  * extents and the question is the measure of their union.
  *
  * Plan: one shuffle on the key; a per-key window (running max of
  * interval ends over strictly-preceding rows) marks island starts —
  * a row opens a new island iff its start exceeds every earlier end —
  * then a cumulative sum of those flags labels islands and a two-level
  * groupBy collapses them. All work is hash-partitioned by key and
  * windows reuse that partitioning (no second exchange); state per row
  * is O(1). Equal-start ties are safe by construction: two intervals
  * sharing a start overlap (positive length), so whichever orders
  * first absorbs the other and the island labeling is order-invariant.
  *
  * Everything stays in integer microseconds; emitted durations are
  * exact integer seconds (floor division) so both engines hash
  * identically.
  */
object Intervals {

  /** Per-key union coverage. `startUs`/`endUs` are integer-µs columns
    * (end exclusive; zero/negative-length rows are dropped). Output:
    * one row per key — `n_intervals` (input rows), `n_islands` (merged
    * runs), `covered_s` (union measure), `span_s` (first start to last
    * end), `idle_s` (span − covered: the inter-island gap total).
    */
  def unionCoverage(df: DataFrame, key: Column, startUs: Column,
                    endUs: Column): DataFrame = {
    val rows = df.select(key.as("key"), startUs.as("__st"), endUs.as("__en"))
      .filter(col("__en") > col("__st"))
    val prev = Window.partitionBy(col("key"))
      .orderBy(col("__st").asc, col("__en").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col("key"))
      .orderBy(col("__st").asc, col("__en").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("__new",
        when(col("__st") > coalesce(max(col("__en")).over(prev),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(run))
      .groupBy(col("key"), col("__island"))
      .agg(count(lit(1)).as("__n"), min(col("__st")).as("__ist"),
        max(col("__en")).as("__ien"))
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__ien") - col("__ist")).as("__cov_us"),
        min(col("__ist")).as("__first_us"),
        max(col("__ien")).as("__last_us"))
      .select(col("key"), col("n_intervals"), col("n_islands"),
        call_function("div", col("__cov_us"), lit(1000000L)).as("covered_s"),
        call_function("div", col("__last_us") - col("__first_us"),
          lit(1000000L)).as("span_s"),
        call_function("div",
          col("__last_us") - col("__first_us") - col("__cov_us"),
          lit(1000000L)).as("idle_s"))
  }
}
