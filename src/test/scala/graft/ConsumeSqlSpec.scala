package graft

import graft.pipeline.{ConsumePipeline, ConsumeSqlPipeline}

/** The SQL-template pipeline must be row-identical to the DataFrame
  * pipeline — same stages, two execution modes (reference fidelity:
  * `script/helper.py:64-72` runs the real job from `.sql` files).
  */
class ConsumeSqlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("SQL-template pipeline is row-identical to the DataFrame pipeline") {
    val df = ConsumePipeline.build(spark, sf)
    val sql = ConsumeSqlPipeline.build(spark, sf)
    assert(df.columns.toSeq == sql.columns.toSeq)
    // multiset compare on collected rows (combining the two plans in one
    // exceptAll trips DeduplicateRelations on the temp-view plan)
    def multiset(d: org.apache.spark.sql.DataFrame) =
      d.collect().toSeq.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val (a, b) = (multiset(df), multiset(sql))
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("templates interpolate with str.format semantics (escaped braces kept)") {
    val out = graft.io.Sources.readAndFormatSqlResource(
      "graft/queries/0-merge_delete.sql",
      Map("cdc_view" -> "v", "delete_value" -> "error",
        "extra_columns_wo_prefix" -> "value",
        "extra_columns_with_prefix" -> "b.value"))
    assert(out.contains("from v") && out.contains("= 'error'"))
    assert(!out.contains("{")) // every placeholder resolved
  }
}
