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
}
