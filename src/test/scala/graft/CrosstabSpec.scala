package graft

import org.apache.spark.sql.functions._
import graft.ops.Crosstab

class CrosstabSpec extends SparkSpec {
  import spark.implicits._

  test("counts: dense matrix with explicit values, absent cells are 0") {
    val df = Seq(
      ("d1", "a"), ("d1", "a"), ("d1", "b"),
      ("d2", "b"),
      ("d3", "c") // value not in the list — must be dropped, not a column
    ).toDF("day", "t")
    val out = Crosstab.counts(df, col("day"), col("t"), Seq("a", "b"))
      .orderBy("day").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("d1", 2L, 1L), ("d2", 0L, 1L), ("d3", 0L, 0L)))
  }

  test("counts: schema is value-list-ordered and data-independent") {
    val df = Seq(("d1", "b")).toDF("day", "t")
    val out = Crosstab.counts(df, col("day"), col("t"), Seq("x", "b", "a"))
    assert(out.columns.toSeq == Seq("day", "x", "b", "a"))
    // single shuffle: pivot must compile to one aggregate, no extra
    // distinct-discovery job
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
