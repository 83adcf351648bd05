package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot / crosstab — the wide-format rollup (`RelationalGroupedDataset
  * .pivot`): one row per group, one count column per pivot value. The
  * pivot VALUE LIST is explicit, for two reasons that both matter at
  * scale: (1) auto-discovery runs an extra distinct-collect job over
  * the corpus before the real aggregation (Spark's two-phase pivot);
  * (2) the output SCHEMA becomes data-dependent — a partition of the
  * corpus that lacks a value would produce a different shape, which is
  * unacceptable for a table contract.
  *
  * Deliberately NOT `RelationalGroupedDataset.pivot`: even with an
  * explicit value list, Spark plans pivot as TWO aggregations — a
  * `groupBy(group, value).count` with its own (group, value) exchange,
  * then a `pivotfirst` re-aggregation exchanging on the group — i.e.
  * two shuffles of the corpus where one suffices. The direct
  * conditional-count formulation (`count(when(p = v, …))` per value)
  * is what pivot morally means, and it compiles to ONE groupBy with
  * map-side partials — one exchange, total.
  *
  * Absent (group, value) cells emit 0, not null — the wide format's
  * contract is a dense matrix (`count` of an all-null column is 0, so
  * density falls out of the aggregate itself).
  */
object Crosstab {

  def counts(df: DataFrame, group: Column, pivotCol: Column,
             values: Seq[String]): DataFrame = {
    require(values.nonEmpty && values.distinct == values,
      "pivot values must be non-empty and distinct")
    val gName = df.select(group).columns.head
    val cells = values.map(v =>
      count(when(col("__p") === v, lit(1))).as(v))
    df.select(group, pivotCol.as("__p"))
      .groupBy(col(gName))
      .agg(cells.head, cells.tail: _*)
  }
}
