package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Streaks

class StreaksSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 10:00:00")

  test("dailyStreaks: islands split on gaps, longest ties break earliest") {
    val events = Seq(
      // user 1: [1..3], gap, [5..6] → streaks 3 and 2
      (1L, ts("2024-01-01")), (1L, ts("2024-01-02")), (1L, ts("2024-01-03")),
      (1L, ts("2024-01-05")), (1L, ts("2024-01-06")),
      // user 2: two equal-length streaks [1..2] and [4..5] → earliest wins
      (2L, ts("2024-01-01")), (2L, ts("2024-01-02")),
      (2L, ts("2024-01-04")), (2L, ts("2024-01-05")),
      // user 3: single day, duplicated events (distinct must collapse)
      (3L, ts("2024-01-09")), (3L, ts("2024-01-09"))
    ).toDF("user_id", "ts")
    val out = Streaks.dailyStreaks(events, col("user_id"), col("ts"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, java.sql.Date)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 2L, 3L, java.sql.Date.valueOf("2024-01-01")),
      (2L, 4L, 2L, 2L, java.sql.Date.valueOf("2024-01-01")),
      (3L, 1L, 1L, 1L, java.sql.Date.valueOf("2024-01-09"))))
  }

  test("dailyStreaks: multiple events per day count that day once") {
    val events = Seq(
      (1L, ts("2024-02-01")), (1L, Timestamp.valueOf("2024-02-01 23:59:59")),
      (1L, ts("2024-02-02"))
    ).toDF("user_id", "ts")
    val out = Streaks.dailyStreaks(events, col("user_id"), col("ts"))
      .select("n_active_days", "longest_streak")
      .as[(Long, Long)].collect().head
    assert(out == ((2L, 2L)))
  }
}
