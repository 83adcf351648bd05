package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed extraction over embedded JSON columns — the consume-side
  * reality that event `props` / payload columns arrive as JSON
  * strings and every downstream aggregate needs one typed field out
  * of them. `get_json_object` is Spark's codegen'd path evaluator
  * (no UDF, no full `from_json` struct materialization when one
  * field is needed); malformed documents and missing paths yield
  * NULL, and the profile REPORTS that parse rate instead of hiding
  * it — the schema-on-read trust gate before a field graduates into
  * a real column.
  *
  * Plan: pure projection into the scan stage, then one rollup with
  * map-side partials. At 100 TB the JSON parse is the CPU cost —
  * that is exactly why the extraction must stay inside whole-stage
  * codegen (a Python/Scala UDF here would dominate the job).
  */
object Json {

  /** Per-`group` profile of integer JSON field `$.field` inside
    * `json`: row count, parsed (non-null, numeric) count, and
    * exact integer sum/min/max of the parsed values.
    */
  def fieldProfile(df: DataFrame, group: Column, json: Column,
                   field: String): DataFrame = {
    require(field.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"plain identifier field names only, got $field")
    // TRY_CAST, not cast: ANSI mode (Spark 4 default) makes a plain
    // cast THROW on a non-numeric field value — a poison document
    // would kill the whole job instead of landing in the parse-rate
    // report, which is the opposite of what a trust gate is for.
    df.select(group.as("group"),
        get_json_object(json, s"$$.$field").as("__raw"))
      .select(col("group"), expr("TRY_CAST(__raw AS BIGINT)").as("__v"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        count(col("__v")).as("n_parsed"),
        sum(col("__v")).as("sum_v"),
        min(col("__v")).as("min_v"),
        max(col("__v")).as("max_v"))
  }

  /** Parse-rate and value drift of JSON field `$.field` between two
    * populations of the SAME stream (`isB` splits them — typically a
    * time cutoff): per group, counts and parse rates on each side plus
    * the signed rate delta, and the exact value sums for a mean-shift
    * read. The schema-on-read health check to diff after a producer
    * deploy: a falling parse rate means the field moved or changed type;
    * matching rates with a jumped sum means semantic drift.
    *
    * ONE scan — the split flag is a predicate driving conditional
    * partials (the [[Profile.snapshotDrift]] posture), never a second
    * read or a self-join. All emissions exact int64; the delta may be
    * negative (both engines truncate integer division toward zero, and
    * the two rate divisions happen independently before subtracting,
    * so the replay is exact).
    */
  def fieldDrift(df: DataFrame, group: Column, json: Column,
                 field: String, isB: Column): DataFrame = {
    require(field.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"plain identifier field names only, got $field")
    val rateA = call_function("div",
      col("parsed_a") * 1000000L, greatest(col("n_a"), lit(1L)))
    val rateB = call_function("div",
      col("parsed_b") * 1000000L, greatest(col("n_b"), lit(1L)))
    df.select(group.as("group"), isB.as("__b"),
        get_json_object(json, s"$$.$field").as("__raw"))
      .select(col("group"), col("__b"),
        expr("TRY_CAST(__raw AS BIGINT)").as("__v"))
      .groupBy(col("group"))
      .agg(count(when(!col("__b"), 1)).as("n_a"),
        count(when(col("__b"), 1)).as("n_b"),
        count(when(!col("__b"), col("__v"))).as("parsed_a"),
        count(when(col("__b"), col("__v"))).as("parsed_b"),
        coalesce(sum(when(!col("__b"), col("__v"))), lit(0L)).as("sum_a"),
        coalesce(sum(when(col("__b"), col("__v"))), lit(0L)).as("sum_b"))
      .select(col("group"), col("n_a"), col("n_b"),
        col("parsed_a"), col("parsed_b"),
        rateA.as("rate_a_ppm"), rateB.as("rate_b_ppm"),
        (rateB - rateA).as("rate_delta_ppm"),
        col("sum_a"), col("sum_b"))
  }
}
