package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gini concentration per group — "how unequal is the mass" in one
  * number: 0 = perfectly even, →1 = one member holds everything. The
  * concentration audit behind corpus reports (is token mass dominated
  * by a few documents?), revenue analysis (the 80/20 check), and skew
  * triage (a high-Gini key column is a salting candidate).
  *
  * Exact integer, via the rank formulation
  * `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` over ascending-sorted values.
  * Sorting INDIVIDUALS would be a data-scale sort; instead the
  * distinct-VALUE histogram (v, c, cumulative count) yields the rank
  * sum per value group in closed form — the ranks of a group ending at
  * cumulative position `cum` are `(cum−c, cum]`, so
  * `2·Σ i·xᵢ = Σ_groups v·c·(2·cum − c + 1)` — and
  * `gini_ppm = (S2 − (n+1)·Σx)·10⁶ DIV (n·Σx)` with products on
  * DECIMAL(38,0). No division happens before the final DIV; values
  * must be non-negative (enforced).
  *
  * Plan: the (group, value) rollup is the one data-scale shuffle
  * (map-side partials); the cumulative window and final aggregate run
  * on DISTINCT-VALUE-scale rows and reuse the same hash partitioning —
  * the [[Quantiles]] shape exactly.
  */
object Gini {

  def perGroup(df: DataFrame, group: Column, value: Column): DataFrame = {
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val gName = df.select(group).columns.head
    val counts = df.select(group, value.cast("long").as("__v"))
      .groupBy(col(gName), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val byV = Window.partitionBy(col(gName)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__cum", sum("__c").over(byV))
      .groupBy(col(gName))
      .agg(sum("__c").as("n"),
        sum(dec(col("__v")) * col("__c")).as("__sx"),
        sum(dec(col("__v")) * col("__c") *
          (lit(2L) * col("__cum") - col("__c") + 1L)).as("__s2"),
        min("__v").as("__minv"))
      .select(col(gName), col("n"), col("__sx").cast("long").as("mass"),
        when(col("__minv") < 0, lit(null).cast("long"))
          .when(col("__sx") > 0, call_function("div",
            (col("__s2") - dec(col("n") + 1) * col("__sx")) * 1000000L,
            dec(col("n")) * col("__sx")))
          .otherwise(lit(0L)).as("gini_ppm"))
  }
}
