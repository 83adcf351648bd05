package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.ops.GapFill

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  test("dailyForwardFill: spine spans first..last, gaps fill forward") {
    val events = Seq(
      // user 1: obs on day 1 (two events — later wins), gap, obs day 4
      (1L, ts("2024-01-01 08:00:00"), 1L, 10L),
      (1L, ts("2024-01-01 09:00:00"), 2L, 11L),
      (1L, ts("2024-01-04 00:00:00"), 3L, 40L),
      // user 2: single day
      (2L, ts("2024-02-01 00:00:00"), 4L, 7L)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = GapFill.dailyForwardFill(events, col("user_id"), col("ts"),
        col("event_id"), col("value"))
      .orderBy("user_id", "day")
      .as[(Long, Date, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, d("2024-01-01"), 11L, true),  // last event of the day wins
      (1L, d("2024-01-02"), 11L, false), // filled
      (1L, d("2024-01-03"), 11L, false), // filled
      (1L, d("2024-01-04"), 40L, true),
      (2L, d("2024-02-01"), 7L, true)))
  }

  test("dailyForwardFill: same-timestamp ties break by event id") {
    val t = ts("2024-01-01 00:00:00")
    val events = Seq((1L, t, 2L, 20L), (1L, t, 1L, 10L))
      .toDF("user_id", "ts", "event_id", "value")
    val out = GapFill.dailyForwardFill(events, col("user_id"), col("ts"),
        col("event_id"), col("value"))
      .select("value").as[Long].collect().toSeq
    assert(out == Seq(20L))
  }
}
