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
}
