package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregations — A1–A4 (reference `2-basedata_df_query.sql:17-45`,
  * `3-basedata_df_final_query.sql:1-19`).
  *
  * All of these are plain hash aggregations: Catalyst plans partial
  * (map-side) + final aggregation automatically, so each costs one shuffle
  * on the group keys and ships only partial states — the right plan at any
  * scale. Skewed group keys are handled by the partial agg (hot key's state
  * is pre-combined per map task).
  */
object Aggregates {

  /** A1: latest-event summary per key — `max(ts)` + argmax of `value` by
    * `(ts, tiebreak..., value)` (reference uses `max_by(value, ts)`,
    * `2-basedata_df_query.sql:17-25`).
    *
    * Implemented as `max(struct(ts, tiebreak..., value))` rather than
    * `max_by(value, ts)`: struct-max is still a partially-aggregating
    * hash agg (one shuffle of tiny states), but the lexicographic order
    * makes tie-breaking fully deterministic even when `(ts, tiebreak)`
    * collides — the value itself is the last resort comparator. Plain
    * `max_by` is the right call only when the caller can guarantee a total
    * order.
    */
  def argmax(df: DataFrame, keys: Seq[Column], ts: Column, value: Column,
             tiebreak: Seq[Column]): DataFrame = {
    val fields = (ts +: tiebreak).zipWithIndex.map { case (c, i) => c.as(s"o$i") } :+ value.as("v")
    df.groupBy(keys: _*).agg(
      max(ts).as("max_ts"),
      max(struct(fields: _*)).getField("v").as("latest_value"))
  }

  /** A2/A3: per-key sums with null→0 defaulting
    * (`SUM(COALESCE(x, 0))`, reference `2-basedata_df_query.sql:27-45`).
    * Aliases are `sum_<input name>` unless the caller aliased the column.
    */
  def sumCoalesce(df: DataFrame, keys: Seq[Column], values: Seq[(Column, String)]): DataFrame =
    df.groupBy(keys: _*).agg(
      sum(coalesce(values.head._1, lit(0))).as(values.head._2),
      values.tail.map { case (c, alias) => sum(coalesce(c, lit(0))).as(alias) }: _*)

  /** A4: plain per-key max. */
  def maxPerKey(df: DataFrame, key: Column, value: Column, alias: String): DataFrame =
    df.groupBy(key).agg(max(value).as(alias))

  /** Full CUBE over up to three dimensions — every subtotal combination
    * (2³ grouping sets) in ONE aggregation pass, `grouping_id()`
    * disambiguating a subtotal row from a genuinely-NULL dimension value
    * (the t29 ROLLUP lesson: Spark's `grouping_id()` bit order equals
    * DuckDB's multi-arg `GROUPING(...)` — leftmost dim is the high bit).
    *
    * Scale shape: Spark expands CUBE before the shuffle (each input row
    * feeds all 2ⁿ grouping sets through ONE partial aggregate), so the
    * exchange still moves combined partial states, not 2ⁿ× the input —
    * the group-key space is the product of dimension cardinalities, tiny
    * next to the fact table. Money sums ride int64 micro-units (cents
    * here), counts int64; no float enters the aggregation.
    */
  def cubeReport(df: DataFrame, d1: Column, d2: Column, d3: Column,
                 valueCents: Column): DataFrame =
    df.select(d1.as("dim1"), d2.as("dim2"), d3.as("dim3"),
        valueCents.as("__cents"))
      .cube(col("dim1"), col("dim2"), col("dim3"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col("__cents")).as("sum_cents"))
}
