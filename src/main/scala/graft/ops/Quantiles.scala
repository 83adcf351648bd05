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
}
