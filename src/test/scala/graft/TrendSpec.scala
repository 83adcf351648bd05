package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Trend

class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def e(u: Long, day: String, vm: Long) =
    (u, Timestamp.valueOf(day + " 09:00:00"), vm)

  test("slopePerKey: exact OLS slope on a perfect line; null on one day") {
    val events = Seq(
      // user 1: y = 2000·x + 1000 (milli) → slope 2000 milli/day
      e(1L, "1970-01-01", 1000L), e(1L, "1970-01-02", 3000L),
      e(1L, "1970-01-03", 5000L),
      // user 2: falling line, slope −500 milli/day
      e(2L, "1970-01-01", 1000L), e(2L, "1970-01-03", 0L),
      // user 3: one day, two observations → no slope
      e(3L, "1970-01-05", 7L), e(3L, "1970-01-05", 9L)
    ).toDF("user_id", "ts", "vm")
    val out = Trend.slopePerKey(events, col("user_id"), col("ts"),
        col("vm"))
      .orderBy("user_id")
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, 3L, Some(2000L * 1000000L)),
      (2L, 2L, Some(-500L * 1000000L)),
      (3L, 2L, None)))
  }

  test("slopePerKey: repeated days weight the regression correctly") {
    // x = 0, 0, 1; y = 0, 2000, 1000 → slope = (3·1000 − 1·3000)·1e6
    //   / (3·1 − 1) = 0 exactly (the duplicated day pulls it flat)
    val events = Seq(
      e(1L, "1970-01-01", 0L), e(1L, "1970-01-01", 2000L),
      e(1L, "1970-01-02", 1000L)
    ).toDF("user_id", "ts", "vm")
    val out = Trend.slopePerKey(events, col("user_id"), col("ts"),
        col("vm"))
      .as[(Long, Long, Option[Long])].collect().head
    assert(out == ((1L, 3L, Some(0L))))
  }
}
