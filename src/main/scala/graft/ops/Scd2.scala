package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 interval construction: turn a change
  * stream (one row per observed state of a key) into versioned validity
  * intervals `[valid_from, valid_to)` with an `is_current` flag on each
  * key's latest state — the standard warehouse "history table" build that
  * the reference's daily CDC jobs feed (cf. `/root/reference` merge-delete
  * semantics; this is the dimension-side complement of
  * [[AsOfJoin.resurrectDeletes]]'s fact-side repair).
  *
  * Plan shape: ONE shuffle. Both window functions (`lead` for the interval
  * close, `row_number` for the version) share a single
  * `(key, order, tieBreak)` window, so Catalyst plans one Exchange + one
  * Sort and evaluates both in the same Window operator. The per-key rollup
  * never materializes history lists — state per row is O(1), so a key with
  * a million versions costs the same per-row work as a key with two
  * (skew-safe; a pathological hot key is a sort-spill concern, not an OOM).
  *
  * `tieBreak` makes equal-`orderBy` rows deterministic on any cluster
  * layout (CDC streams routinely carry same-timestamp batches; without a
  * total order, `lead` and `row_number` are scan-order lotteries). Pass the
  * source's change-sequence / event id.
  */
object Scd2 {

  /** One row per observed state: `version` (1-based in change order),
    * `valid_from` (the state's own timestamp), `valid_to` (the NEXT state's
    * timestamp, null while current — half-open intervals chain exactly),
    * `is_current`.
    *
    * @param attrs the dimension attributes to carry into the history table
    */
  def intervals(changes: DataFrame, key: Column, ts: Column, tieBreak: Column,
                attrs: Column*): DataFrame = {
    val keyName = changes.select(key).columns.head
    val w = Window.partitionBy(col(keyName)).orderBy(col("valid_from"), tieBreak)
    changes
      .select(key +: ts.as("valid_from") +: tieBreak +: attrs: _*)
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time SCD2 lookup — join facts to the dimension VERSION that
    * was valid at each fact's timestamp (the kimball "type-2 dimension at
    * transaction time" join every warehouse mart needs). Because
    * [[intervals]] chain half-open (each version valid until the next
    * one's `valid_from`), membership `valid_from ≤ ts < valid_to` is
    * EXACTLY "latest version with valid_from ≤ ts" — so the lookup rides
    * [[AsOfJoin.asOf]]'s carried-window plan: one shuffle + sort per key,
    * ZERO fact×version intermediate blowup (the naive equi-join +
    * interval filter multiplies every fact by its key's version count
    * before filtering — a deep-history dimension detonates it).
    *
    * `dim` must carry `valid_from` and `version` (from [[intervals]])
    * plus the attributes to attach; facts earlier than their key's first
    * version drop (inner semantics — no dimension existed yet).
    */
  def lookup(facts: DataFrame, dim: DataFrame, keys: Seq[(String, String)],
             factTs: String): DataFrame =
    AsOfJoin.asOf(facts, dim, keys, factTs, "valid_from",
      tiebreak = Seq("version"))

  /** Time-weighted mean of a held value (TWAP): each observation's value
    * holds from its timestamp until the NEXT observation (the [[intervals]]
    * validity semantics), the key's final value holding until `horizonTs`
    * (ISO timestamp, e.g. the query date) — so a value held for a month
    * weighs a month, where a plain `avg` weighs every tick equally and a
    * burst of updates drowns the stable regime.
    *
    * Exactness: values enter as integer MILLI-units (caller converts once),
    * durations in integer µs; `Σ(value_milli·duration_µs) DIV Σduration_µs`
    * is all-integer (order-independent sums, one floor division). Overflow
    * headroom: Σ v·dur per key ≤ max_value_milli · key_horizon_µs — 5·10⁵
    * milli-units held over 30 days is ~1.3·10¹⁸, inside int64; re-unit the
    * value (centi, deci) for wider horizons or larger magnitudes.
    *
    * Plan shape: one shuffle — the `lead` window partitions by the key and
    * the per-key rollup reuses that clustering (the [[Sessionize]]
    * precedent). Ties on `ts` order by `tieBreak` deterministically; a
    * tied pair contributes zero duration to its first member, exactly like
    * the oracle's window replay.
    */
  def timeWeightedMean(changes: DataFrame, key: Column, ts: Column,
                       tieBreak: Column, valueMilli: Column,
                       horizonTs: String): DataFrame = {
    val keyName = changes.select(key).columns.head
    val w = Window.partitionBy(col(keyName)).orderBy(col("__us"), tieBreak)
    changes
      .select(key, unix_micros(ts).as("__us"), tieBreak,
        valueMilli.as("__vm"))
      .withColumn("__end", coalesce(lead(col("__us"), 1).over(w),
        unix_micros(to_timestamp(lit(horizonTs)))))
      .withColumn("__dur", col("__end") - col("__us"))
      .groupBy(col(keyName))
      .agg(sum(col("__dur")).as("held_us"),
        sum(col("__vm") * col("__dur")).as("__wsum"))
      .select(col(keyName), col("held_us"),
        // a key whose only observation sits AT the horizon held nothing
        when(col("held_us") > 0, expr("__wsum DIV held_us"))
          .otherwise(lit(0L)).as("twap_milli"))
  }
}
