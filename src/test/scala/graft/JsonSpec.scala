package graft

import org.apache.spark.sql.functions._
import graft.ops.Json

class JsonSpec extends SparkSpec {
  import spark.implicits._

  private def profile(rows: Seq[(String, String)]) =
    Json.fieldProfile(rows.toDF("g", "j"), col("g"), col("j"), "k")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("typed extraction with exact stats") {
    val out = profile(Seq(
      ("a", """{"k": 5}"""), ("a", """{"k": -2}"""),
      ("b", """{"k": 7, "x": 1}""")))
    assert(out("a") == ((2L, 2L, Some(3L), Some(-2L), Some(5L))))
    assert(out("b") == ((1L, 1L, Some(7L), Some(7L), Some(7L))))
  }

  test("malformed docs, missing paths, and non-numeric values parse to null") {
    val out = profile(Seq(
      ("a", """{"k": 5}"""),
      ("a", """not json"""),
      ("a", """{"other": 1}"""),
      ("a", """{"k": "abc"}"""),
      ("a", null)))
    assert(out("a") == ((5L, 1L, Some(5L), Some(5L), Some(5L))))
  }

  test("a group with zero parses keeps null stats, not zeros") {
    val out = profile(Seq(("a", """{"x": 1}""")))
    assert(out("a") == ((1L, 0L, None, None, None)))
  }

  test("field name is validated") {
    intercept[IllegalArgumentException] {
      Json.fieldProfile(Seq(("a", "{}")).toDF("g", "j"), col("g"),
        col("j"), "bad-name")
    }
  }

  test("fieldDrift: conditional partials split sides; poison docs land in the rate") {
    val df = Seq(
      // side A: 2 rows, 1 parses (the string "x" does not)
      ("t", false, """{"k": 5}"""),
      ("t", false, """{"k": "x"}"""),
      // side B: 3 rows, 2 parse; one malformed JSON
      ("t", true, """{"k": 7}"""),
      ("t", true, """{"k": 9}"""),
      ("t", true, """not json""")
    ).toDF("g", "b", "j")
    val out = Json.fieldDrift(df, col("g"), col("j"), "k", col("b"))
      .select("group", "n_a", "n_b", "parsed_a", "parsed_b",
        "rate_a_ppm", "rate_b_ppm", "rate_delta_ppm", "sum_a", "sum_b")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      ("t", 2L, 3L, 1L, 2L, 500000L, 666666L, 166666L, 5L, 16L)))
  }

  test("fieldDrift: a side with no rows rates 0, not a division error") {
    val df = Seq(("t", false, """{"k": 1}""")).toDF("g", "b", "j")
    val out = Json.fieldDrift(df, col("g"), col("j"), "k", col("b"))
      .select("rate_a_ppm", "rate_b_ppm", "rate_delta_ppm")
      .as[(Long, Long, Long)].head()
    assert(out == ((1000000L, 0L, -1000000L)))
  }
}
