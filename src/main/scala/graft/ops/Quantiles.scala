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

  /** Weighted quantiles — [[exact]] with per-row integer weights
    * (revenue-weighted price medians, token-weighted doc-length
    * percentiles): the smallest value whose cumulative WEIGHT reaches
    * ⌈p·W⌉. The plan is identical — the rollup aggregates `sum(w)`
    * per (group, value) instead of a count, so the shuffle output
    * stays distinct-value-scale and the crossing test stays pure
    * int64 (`cumw·10⁶ ≥ ppm·W`; headroom now binds on TOTAL WEIGHT
    * per group < ~9.2×10¹² — quantize upstream accordingly).
    * Zero/negative-weight rows are dropped (a mass domain); a group
    * with no positive mass emits nothing.
    */
  def weightedExact(df: DataFrame, group: Column, value: Column,
                    weight: Column,
                    quantiles: Seq[(String, Long)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (n, p) =>
      require(p >= 1 && p <= 1000000, s"quantile $n: ppm $p out of (0, 1e6]")
    }
    val gName = df.select(group).columns.head
    val counts = df.select(group, value.as("__v"), weight.as("__w"))
      .filter(col("__w") > 0)
      .groupBy(col(gName), col("__v")).agg(sum(col("__w")).as("__wsum"))
    val byV = Window.partitionBy(col(gName)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(gName))
    val cum = counts
      .select(col(gName), col("__v"),
        sum("__wsum").over(byV).as("__cumw"),
        sum("__wsum").over(whole).as("__tw"))
    cum.groupBy(col(gName)).agg(
      max("__tw").as("total_weight"),
      quantiles.map { case (name, ppm) =>
        min(when(col("__cumw") * 1000000L >= col("__tw") * ppm, col("__v")))
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
  /** Relative-error quantiles for UNBOUNDED non-negative integer
    * domains — the scale path [[exact]]'s scaladoc promises for metrics
    * whose distinct-value count is itself data-scale (latencies in
    * micros, byte sizes, token counts at corpus scale). A DDSketch-
    * shaped log-bucket histogram, but with PURE-INTEGER bucketing:
    * values below `2^(subBits+1)` map to themselves (exact); larger
    * values map to (binary digit count, top `subBits` mantissa bits) —
    * `log` never appears, so bucket boundaries cannot drift between
    * engines (the t18 class applied to sketches: a float `log_γ` puts
    * boundary values on different sides per libm).
    *
    * Guarantee: each reported quantile is the LOWER BOUND of its
    * bucket, within relative error `2^-subBits` of the true
    * percentile_disc value (≤ 6.25 % at the default 4), and EXACT when
    * the domain stays under `2^(subBits+1)`. The histogram is
    * mergeable by construction (bucket counts add), state is
    * O(subBits · 64) buckets per group — the sketch property — and the
    * plan is [[exact]]'s: one data-scale shuffle with map-side
    * partials, then bucket-scale frames. Nulls and negatives are
    * excluded (a latency/size domain; callers with signed data shift
    * it first).
    */
  def approxLogQuantiles(df: DataFrame, group: Column, value: Column,
                         quantiles: Seq[(String, Long)],
                         subBits: Int = 4): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1, 16], got $subBits")
    quantiles.foreach { case (n, p) =>
      require(p >= 1 && p <= 1000000, s"quantile $n: ppm $p out of (0, 1e6]")
    }
    val gName = df.select(group).columns.head
    val k = subBits
    val small = (1L << (k + 1)) - 1
    // L = binary digit count; sub = the k bits after the leading 1;
    // key order ≡ lower-bound order (small keys < 2^(k+1) ≤ any large
    // key's ((k+2) << k)), so the crossing rule sorts by key directly
    val keyed = df
      .select(group, value.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__v") >= 0)
      .selectExpr(gName,
        s"""CASE WHEN __v <= $small THEN __v
           |ELSE shiftleft(CAST(length(bin(__v)) AS BIGINT), $k)
           |  + (shiftright(__v, length(bin(__v)) - 1 - $k)
           |     & ${(1L << k) - 1}) END AS __key""".stripMargin,
        s"""CASE WHEN __v <= $small THEN __v
           |ELSE shiftleft(1L, length(bin(__v)) - 1)
           |  + shiftleft(shiftright(__v, length(bin(__v)) - 1 - $k)
           |      & ${(1L << k) - 1},
           |    length(bin(__v)) - 1 - $k) END AS __lo""".stripMargin)
    val counts = keyed.groupBy(col(gName), col("__key"))
      .agg(count(lit(1)).as("__cnt"), min("__lo").as("__lo"))
    val byK = Window.partitionBy(col(gName)).orderBy(col("__key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(gName))
    val cum = counts
      .select(col(gName), col("__lo"),
        sum("__cnt").over(byK).as("__cum"),
        sum("__cnt").over(whole).as("__n"))
    cum.groupBy(col(gName)).agg(
      max("__n").as("n"),
      quantiles.map { case (name, ppm) =>
        min(when(col("__cum") * 1000000L >= col("__n") * ppm, col("__lo")))
          .as(name)
      }: _*)
  }

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
