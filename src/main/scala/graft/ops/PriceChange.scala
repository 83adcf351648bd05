package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Price-change history — W3/W4 + U2 (reference
  * `3-basedata_df_final_query.sql:44-72`): for a month window, emit one row
  * per (entity, distinct price) — the latest record at that price within the
  * month — plus the entity's last record before the month ("previous
  * price"), labelled so consumers can reconstruct the change log.
  *
  * Both branches are top-1-per-key windows over the same key family, so the
  * whole operator costs one shuffle on the entity key (Catalyst reuses the
  * exchange across the two windows reading the same cached/pruned scan).
  * The price column is parameterised exactly like the reference
  * (`script/helper.py:192-201` picks buy vs rent amount per distribution).
  */
object PriceChange {

  /** @param monthStart inclusive; @param monthEnd exclusive.
    * @param tiebreak   unique descending tiebreaker for deterministic picks.
    */
  def history(
      df: DataFrame,
      key: Column,
      price: Column,
      ts: Column,
      tiebreak: Seq[Column],
      monthStart: String,
      monthEnd: String): DataFrame = {

    // W3: latest record per (key, distinct price) inside the month.
    val current = Dedup.topOnePerKey(
      df.filter(ts >= lit(monthStart) && ts < lit(monthEnd)),
      Seq(key, price),
      ts.desc +: tiebreak)
      .withColumn("price_src", lit("current"))

    // W4: single last record before the month start.
    val previous = Dedup.topOnePerKey(
      df.filter(ts < lit(monthStart)),
      Seq(key),
      ts.desc +: tiebreak)
      .withColumn("price_src", lit("previous"))

    current.unionByName(previous)
  }
}
