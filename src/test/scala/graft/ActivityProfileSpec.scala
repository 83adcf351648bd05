package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.ActivityProfile

class ActivityProfileSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyRegularity: bot-like key scores ~1e6, spread key scores low") {
    val events = (
      // user 1: a cron job — 10 events, all at 03:xx
      (1 to 10).map(i => (1L, ts(f"2024-01-01 03:$i%02d:00"))) ++
      // user 2: spread over 5 distinct hours, 2 events each
      (0 until 10).map(i => (2L, ts(f"2024-01-0${i % 2 + 1} ${10 + i % 5}%02d:00:00")))
    ).toDF("user_id", "ts")
    val out = ActivityProfile.hourlyRegularity(events, col("user_id"),
        col("ts"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 10L, 1L, 1000000L),
      (2L, 10L, 5L, 200000L)))
  }

  test("hourlyRegularity: same hour on different days buckets together") {
    // hour-of-day profile, not hour-of-timeline: 2 days × 09:00 → 1 hour
    val events = Seq((1L, ts("2024-01-01 09:00:00")),
      (1L, ts("2024-01-02 09:30:00"))).toDF("user_id", "ts")
    val out = ActivityProfile.hourlyRegularity(events, col("user_id"),
        col("ts"))
      .select("n_hours").as[Long].head()
    assert(out == 1L)
  }

  test("dowSeasonality: ISO Monday=1, exact shares and flat-week index") {
    // 2024-01-01 is a Monday; type 'a': 3×Mon + 1×Tue; type 'b': 2×Sun
    val events = Seq(
      ("a", ts("2024-01-01 09:00:00")), ("a", ts("2024-01-08 10:00:00")),
      ("a", ts("2024-01-15 11:00:00")), ("a", ts("2024-01-02 09:00:00")),
      ("b", ts("2024-01-07 09:00:00")), ("b", ts("2024-01-14 09:00:00"))
    ).toDF("event_type", "ts")
    val out = ActivityProfile.dowSeasonality(events, col("event_type"),
        col("ts"))
      .orderBy("event_type", "iso_dow")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 1, 3L, 750000L, 5250000L),
      ("a", 2, 1L, 250000L, 1750000L),
      ("b", 7, 2L, 1000000L, 7000000L)))
  }

  test("dowSeasonality: the window runs over rollup rows, not events") {
    val events = Seq(("a", ts("2024-01-01 09:00:00"))).toDF("event_type", "ts")
    val plan = ActivityProfile.dowSeasonality(events, col("event_type"),
      col("ts")).queryExecution.executedPlan.toString
    // partial-before-shuffle rollup feeds the window: the Window's child
    // chain must contain the final HashAggregate, i.e. aggregation
    // happens BELOW the window, never after it
    assert(plan.contains("Window"), s"expected a window in:\n$plan")
    assert(plan.indexOf("Window") < plan.indexOf("HashAggregate"),
      s"window must sit above the rollup in:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"expected map-side partial aggregation in:\n$plan")
  }

  test("dowHourHeatmap: cells key on (iso_dow, hour); shares sum to ~1e6") {
    // Monday 09h ×2, Monday 10h ×1, Sunday 23h ×1 for one type
    val events = Seq(
      ("a", ts("2024-01-01 09:05:00")), ("a", ts("2024-01-08 09:55:00")),
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-07 23:59:59"))
    ).toDF("event_type", "ts")
    val out = ActivityProfile.dowHourHeatmap(events, col("event_type"),
        col("ts"))
      .orderBy("iso_dow", "hour")
      .as[(String, Int, Int, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 1, 9, 2L, 500000L),
      ("a", 1, 10, 1L, 250000L),
      ("a", 7, 23, 1L, 250000L)))
    assert(out.map(_._5).sum == 1000000L)
  }

  test("hourlyRegularity plans no window and no sort") {
    val events = Seq((1L, ts("2024-01-01 09:00:00"))).toDF("user_id", "ts")
    val plan = ActivityProfile.hourlyRegularity(events, col("user_id"),
      col("ts")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert(!"(?m)^\\s*[*+:-]*\\s*Sort ".r.findFirstIn(plan).isDefined,
      s"unexpected Sort in:\n$plan")
  }
}
