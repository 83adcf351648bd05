package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ABC (Pareto-class) analysis — "which fifth of the catalog carries
  * 70 % of revenue": inventory triage, catalog curation, the
  * training-data analog "which sources carry 90 % of tokens". Keys
  * are ranked by aggregate value descending; class A is every key
  * needed to reach the first threshold of cumulative share, B to the
  * second, C the tail.
  *
  * The textbook plan sorts ALL keys by value and takes a running
  * share — a data-scale global sort. Like [[Pareto]], this rides the
  * value axis instead: per-key totals (the one data-scale shuffle),
  * then a rollup to DISTINCT VALUE levels, then the cumulative share
  * as a window over those value-distinct rows (the deliberate serial
  * step — value-domain scale, not key scale), then a per-class
  * aggregate. Ties are principled by construction: keys with EQUAL
  * total value share a level and therefore a class — no
  * row-order-dependent boundary, which is also what makes the result
  * engine-exact. The crossing level belongs to the higher class (A
  * is "every level whose EXCLUSIVE prefix is still short of the
  * threshold").
  *
  * Integer contract: `value` must be integer (quantize upstream);
  * the crossing test `prefix·10⁶ < ppm·total` binds at total value
  * < ~9.2×10¹² units per table — pick the unit accordingly.
  */
object Abc {

  /** Per-class rollup of `df`'s keys by summed `value`: class label,
    * key count, value total, integer-ppm share, and the class's value
    * boundaries. `thresholds` are (label, cumulative-ppm) pairs in
    * ascending ppm order; the final label catches the tail.
    */
  def classes(df: DataFrame, key: Column, value: Column,
              thresholds: Seq[(String, Long)] = Seq("A" -> 700000L,
                "B" -> 900000L),
              tailLabel: String = "C"): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    require(thresholds.map(_._2) == thresholds.map(_._2).sorted,
      "thresholds must be ascending")
    val perKey = df.select(key.as("__k"), value.as("__val"))
      .groupBy(col("__k")).agg(sum(col("__val")).as("__rev"))
    // Bucket-parallel cumulative sum (r14, the tokenBudgetSelect
    // construction): the former global `Window.orderBy(__rev desc)` put
    // EVERY distinct value level on one task — for continuous values that
    // is ≈ |keys|, the unbounded serial step this operator exists to
    // refuse. Levels bucket by a sign-split BIT-LENGTH of the level value
    // — an exact integer coarsening of the `__rev desc` order (equal
    // levels can never straddle buckets; ≤ 129 buckets over the full
    // int64 domain; Long.MinValue pinned below the negation overflow) —
    // the ≤ 129-row histogram takes one bounded serial window for prefix
    // offsets, and the level cumsum runs per bucket in parallel. Bucket
    // order refines level order, so offset + within-bucket sum IS the
    // global running total — bit-identical classes.
    val bucket = when(col("__rev") > 0, length(bin(col("__rev"))).cast("int"))
      .when(col("__rev") === 0, lit(0))
      .when(col("__rev") === Long.MinValue, lit(-65))
      .otherwise((-length(bin(-col("__rev")))).cast("int"))
    val levels = perKey.groupBy(col("__rev"))
      .agg(count(lit(1)).as("__nk"))
      .withColumn("__lt", col("__rev") * col("__nk"))
      .withColumn("__b", bucket)
    val hist = levels.groupBy(col("__b")).agg(sum(col("__lt")).as("__bt"))
    // single partition by construction (≤ 129 rows); the literal partition
    // key keeps the bounded frame out of WindowExec's move-everything path
    val wh = Window.partitionBy(lit(0)).orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hist
      .withColumn("__before", coalesce(sum(col("__bt")).over(wh), lit(0L)))
      .select(col("__b"), col("__before"))
    val tot = hist.agg(sum(col("__bt")).as("__tot"))
    val desc = Window.partitionBy(col("__b")).orderBy(col("__rev").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val classed = levels
      .join(broadcast(off), Seq("__b"))
      .crossJoin(broadcast(tot))
      .withColumn("__cum", col("__before") + sum(col("__lt")).over(desc))
      .withColumn("abc_class",
        thresholds.foldLeft(lit(null).cast("string")) { case (acc, (lbl, ppm)) =>
          coalesce(acc, when((col("__cum") - col("__lt")) * lit(1000000L) <
            lit(ppm) * col("__tot"), lit(lbl)))
        })
      .withColumn("abc_class", coalesce(col("abc_class"), lit(tailLabel)))
    classed.groupBy(col("abc_class"))
      .agg(sum(col("__nk")).as("n_keys"),
        sum(col("__lt")).as("value_total"),
        max(col("__tot")).as("__tot"),
        min(col("__rev")).as("min_key_value"),
        max(col("__rev")).as("max_key_value"))
      .select(col("abc_class"), col("n_keys"), col("value_total"),
        call_function("div", col("value_total") * lit(1000000L),
          col("__tot")).as("share_ppm"),
        col("min_key_value"), col("max_key_value"))
  }
}
