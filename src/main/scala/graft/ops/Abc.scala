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
    val levels = perKey.groupBy(col("__rev"))
      .agg(count(lit(1)).as("__nk"))
      .withColumn("__lt", col("__rev") * col("__nk"))
    val desc = Window.orderBy(col("__rev").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val classed = levels
      .withColumn("__cum", sum(col("__lt")).over(desc))
      .withColumn("__tot", sum(col("__lt")).over(whole))
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
