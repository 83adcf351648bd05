package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management join helpers for the 100 TB path.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but it cannot help when (a) the skew is in a broadcast-disabled
  * join, or (b) a single key's rows must meet a single build row over and
  * over (hot-key fan-in). Salting fixes (b) statically: scatter the probe
  * side's hot key across `salt` sub-keys and replicate the matching build
  * rows once per sub-key, so no task sees the whole hot key.
  */
object ScaleJoins {

  /** Salted equi-join (left side = big/skewed probe, right side = the
    * smaller build side whose rows get replicated `salt`×).
    *
    * @param scatter column with high cardinality INSIDE a hot key (any
    *                unique-ish probe column) — drives the deterministic
    *                spread of the key's rows across salt buckets
    */
  def saltedEquiJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      scatter: Column,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val p = probe.withColumn("__salt", pmod(hash(scatter), lit(salt)))
    val b = build.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
