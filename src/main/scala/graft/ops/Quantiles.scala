package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles over integer-valued columns — the
  * percentile_disc semantics (smallest value whose cumulative count
  * reaches ⌈p·n⌉), computed WITHOUT collecting per-group values.
  *
  * The textbook approaches both fail at 100 TB: `collect_list` + sort
  * holds a whole group's values in one task's memory, and
  * `approx_percentile` is a sketch (wrong answers under an exact-hash
  * contract). This operator exploits the integer value domain instead:
  *
  *   1. `groupBy(group, v).count` — the only data-scale shuffle; output
  *      is DISTINCT-VALUE scale (bounded by the value domain, not rows).
  *   2. A per-group cumulative sum ordered by `v` (one sort of the
  *      distinct-value rows) plus the group total from a whole-partition
  *      frame on the same sort — one exchange, one sort, two frames.
  *   3. Each requested quantile is a conditional `min(v)` over the first
  *      cumulative crossing: `cum·10⁶ ≥ ppm·n` — pure int64, no division
  *      at all, so the emission is engine-exact by construction.
  *
  * The final per-group aggregate reuses the window's hash partitioning
  * (subset distribution — no third exchange). Int64 headroom: the
  * crossing test needs `n·10⁶ < 2⁶³`, i.e. under ~9.2×10¹² rows per
  * group — document-count scale, never binds first.
  */
object Quantiles {

  /** One row per group: `n` plus one column per `(name, ppm)` quantile
    * (ppm in [1, 1000000]: 500000 = median, 990000 = p99).
    */
  def exact(df: DataFrame, group: Column, value: Column,
            quantiles: Seq[(String, Long)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (n, p) =>
      require(p >= 1 && p <= 1000000, s"quantile $n: ppm $p out of (0, 1e6]")
    }
    val gName = df.select(group).columns.head
    val counts = df.select(group, value.as("__v"))
      .groupBy(col(gName), col("__v")).agg(count(lit(1)).as("__cnt"))
    val byV = Window.partitionBy(col(gName)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(gName))
    val cum = counts
      .select(col(gName), col("__v"),
        sum("__cnt").over(byV).as("__cum"),
        sum("__cnt").over(whole).as("__n"))
    cum.groupBy(col(gName)).agg(
      max("__n").as("n"),
      quantiles.map { case (name, ppm) =>
        min(when(col("__cum") * 1000000L >= col("__n") * ppm, col("__v")))
          .as(name)
      }: _*)
  }

  /** The inverse direction — value → percent rank, as a NORMALIZATION
    * TABLE: one row per (group, distinct value) with
    * `pr_ppm = (rank − 1)·10⁶ DIV (n − 1)` where `rank` is the SQL
    * `rank()` (ties share the rank of their first row — exactly
    * `percent_rank` semantics, integerized). Rank-based feature scaling
    * is the robust alternative to min-max or z-score (outlier-immune,
    * distribution-free); emitting the distinct-value TABLE instead of a
    * per-row column keeps the output value-domain-scale and lets
    * training and serving join the SAME table — no train/serve skew.
    *
    * Same plan as [[exact]]: one data-scale rollup shuffle, then
    * distinct-value-scale windows on the same partitioning. A
    * single-row group (n = 1) emits 0 — the conventional
    * `percent_rank` of a lone row, never a divide-by-zero.
    */
  def percentRanks(df: DataFrame, group: Column,
                   value: Column): DataFrame = {
    val gName = df.select(group).columns.head
    val counts = df.select(group, value.cast("long").as("value"))
      .groupBy(col(gName), col("value")).agg(count(lit(1)).as("__c"))
    val byV = Window.partitionBy(col(gName)).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(gName))
    counts
      .select(col(gName), col("value"), col("__c"),
        sum("__c").over(byV).as("__cum"),
        sum("__c").over(whole).as("__n"))
      .select(col(gName), col("value"), col("__c").as("n_rows"),
        when(col("__n") > 1, call_function("div",
          (col("__cum") - col("__c")) * 1000000L, col("__n") - 1))
          .otherwise(lit(0L)).as("pr_ppm"))
  }
}
