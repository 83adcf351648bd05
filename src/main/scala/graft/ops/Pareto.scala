package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated on a
  * (minimize `cost`, maximize `gain`) pair — price/quality catalog
  * curation, model-size/score tradeoff tables, per-source
  * cost/coverage triage. Row a dominates b iff cost(a) ≤ cost(b),
  * gain(a) ≥ gain(b), and at least one is strict; ties on BOTH axes
  * survive together (neither dominates).
  *
  * The textbook skyline is either the all-pairs NOT EXISTS anti-join
  * (quadratic — refused) or one GLOBAL sort with a running max
  * (single partition over the full input — refused at data scale).
  * This plan exploits that dominance only flows through the cost
  * axis: first a per-cost rollup (partial-agg shuffle, output bounded
  * by DISTINCT COSTS, catalog-scale not data-scale), then the running
  * "best gain at any strictly cheaper cost" as a window over that
  * small rollup (the deliberate serial step of the
  * [[Concurrency]]/[[Quantiles]] kind — cost-distinct rows only),
  * then one hash join of the input against the rollup on the cost
  * key. A row survives iff it carries its cost level's max gain AND
  * beats every strictly-cheaper level's running max: dominance by an
  * equal-cost row needs strictly more gain; dominance by a cheaper
  * row needs only gain ≥ (cost already strict).
  */
object Pareto {

  /** Frontier rows of `df` under (min `cost`, max `gain`); both must
    * be integer columns (exact compares — quantize floats upstream).
    * Output: the surviving rows' (id, cost, gain), plus
    * `n_tied` — how many input rows share that (cost, gain) point.
    */
  def frontier2d(df: DataFrame, id: Column, cost: Column,
                 gain: Column): DataFrame = {
    val rows = df.select(id.as("id"), cost.as("cost"), gain.as("gain"))
    val perCost = rows.groupBy(col("cost"))
      .agg(max(col("gain")).as("__best_here"))
    val cheaper = Window.orderBy(col("cost").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val levels = perCost.withColumn("__best_cheaper",
      coalesce(max(col("__best_here")).over(cheaper), lit(Long.MinValue)))
    rows.join(levels, "cost")
      .filter(col("gain") === col("__best_here") &&
        col("gain") > col("__best_cheaper"))
      .groupBy(col("cost"), col("gain"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("n_tied"))
      .select(col("id"), col("cost"), col("gain"), col("n_tied"))
  }
}
