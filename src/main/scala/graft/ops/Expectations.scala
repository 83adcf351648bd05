package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Great-Expectations-shaped
  * gate a pipeline runs before promoting a batch: a rule list
  * (name → boolean predicate) evaluated in ONE aggregate pass over the
  * table, each rule reporting its violation count, integer ppm rate, and
  * a pass flag against a per-suite tolerance.
  *
  * NULL is a violation: a predicate that cannot evaluate (null operand)
  * is `when(rule, 0).otherwise(1)` — the pessimistic reading every
  * quality gate wants (an unknown value never silently passes a range
  * check). Pinned identically in the oracle's CASE.
  *
  * Scale shape: ALL rules share one map-side-combined aggregate — the
  * table is scanned once no matter how many expectations the suite
  * carries (the naive one-query-per-rule form scans N times); the
  * unpivot to one row per rule is a literal-array explode over the
  * single 1-row aggregate. Adding a rule costs one more codegen'd sum,
  * zero additional I/O.
  */
object Expectations {

  /** One row per rule: (rule, n_rows, n_violations, viol_ppm, pass). */
  def check(df: DataFrame, rules: Seq[(String, Column)],
            tolerancePpm: Long = 0L): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    require(tolerancePpm >= 0, "tolerancePpm must be >= 0")
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, rule) =>
      // coalesce: sum over ZERO rows is NULL — an empty batch has zero
      // violations, and the gate must still answer (a NULL pass flag
      // fails both `filter(pass)` and `filter(!pass)` silently)
      coalesce(sum(when(rule, 0L).otherwise(1L)), lit(0L)).as(s"__v_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(s"__v_$name").as("n_violations"))
    }
    one
      .select(col("__n").as("n_rows"), explode(array(rows: _*)).as("kv"))
      .select(col("kv.rule").as("rule"), col("n_rows"),
        col("kv.n_violations").as("n_violations"))
      // empty batch: 0/0 would be NULL (or an ANSI error) — vacuous pass
      .withColumn("viol_ppm",
        when(col("n_rows") > 0,
          expr("(n_violations * 1000000) div n_rows")).otherwise(0L))
      .withColumn("pass", col("viol_ppm") <= tolerancePpm)
  }
}
