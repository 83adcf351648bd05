package graft

import org.apache.spark.sql.functions._
import graft.ops.Expectations

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some(10L), "A"),
    (2L, Some(60L), "A"),   // qty out of range
    (3L, None, "A"),        // null qty → violation (pessimistic)
    (4L, Some(20L), "X")    // bad flag
  ).toDF("id", "qty", "flag")

  test("check: one row per rule, null counts as violation, exact ppm") {
    val out = Expectations.check(rows, Seq(
        "qty_range" -> (col("qty") >= 1 && col("qty") <= 50),
        "flag_domain" -> col("flag").isin("A", "N", "R"),
        "id_positive" -> (col("id") > 0)))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("qty_range") == ((4L, 2L, 500000L, false)))
    assert(out("flag_domain") == ((4L, 1L, 250000L, false)))
    assert(out("id_positive") == ((4L, 0L, 0L, true)))
  }

  test("check: tolerance lets bounded violation rates pass") {
    val out = Expectations.check(rows, Seq(
        "flag_domain" -> col("flag").isin("A", "N", "R")),
        tolerancePpm = 300000L)
      .select("pass").as[Boolean].head()
    assert(out) // 250000 ppm <= 300000 tolerance
  }

  test("check: an empty batch passes vacuously — never a NULL gate") {
    val out = Expectations.check(rows.filter(col("id") > 100),
        Seq("qty_range" -> (col("qty") >= 1)))
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(("qty_range", 0L, 0L, 0L, true)))
  }
}
