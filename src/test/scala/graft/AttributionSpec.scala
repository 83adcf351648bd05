package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Attribution

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("firstTouch: lookback bound, strict-before, no-touch null, counts") {
    val events = Seq(
      // user 1: touch 8 days before conversion — OUTSIDE the 7d window
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-09 00:00:00"), 2L, "purchase"),
      // user 2: two touches in window; earliest wins, both counted; a
      // same-µs touch at conversion time must NOT count (strict before)
      (2L, ts("2024-01-05 00:00:00"), 3L, "view"),
      (2L, ts("2024-01-06 00:00:00"), 4L, "click"),
      (2L, ts("2024-01-07 12:00:00"), 5L, "view"),
      (2L, ts("2024-01-07 12:00:00"), 6L, "purchase"),
      // user 3: conversion with no touches ever
      (3L, ts("2024-01-10 00:00:00"), 7L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Attribution.firstTouch(events, col("user_id"), col("ts"),
        col("event_id"),
        isTouch = col("event_type").isin("view", "click"),
        isConversion = col("event_type") === "purchase",
        lookbackSeconds = 7L * 86400)
      .orderBy("user_id")
      .select("user_id", "conversion_id", "first_touch_us", "n_touches")
      .as[(Long, Long, Option[Long], Long)].collect().toSeq
    def us(s: String) = ts(s).getTime * 1000L
    assert(out == Seq(
      (1L, 2L, None, 0L),
      (2L, 6L, Some(us("2024-01-05 00:00:00")), 2L),
      (3L, 7L, None, 0L)))
  }

  test("firstTouch: the window boundary is inclusive at exactly lookback") {
    // touch exactly 7 days before: -lookback*1e6 PRECEDING is inclusive
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-08 00:00:00"), 2L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Attribution.firstTouch(events, col("user_id"), col("ts"),
        col("event_id"), col("event_type") === "view",
        col("event_type") === "purchase", lookbackSeconds = 7L * 86400)
      .select("n_touches").as[Long].head()
    assert(out == 1L)
  }

  test("unconvertedTouches: abandonment window is strict-after and bounded") {
    val events = Seq(
      // user 1: click converts 30 min later → NOT abandoned
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 10:30:00"), 2L, "purchase"),
      // user 2: click converts 2h later — outside the 1h window
      (2L, ts("2024-01-01 10:00:00"), 3L, "click"),
      (2L, ts("2024-01-01 12:00:00"), 4L, "purchase"),
      // user 3: same-µs purchase does NOT count (strict after)
      (3L, ts("2024-01-01 10:00:00"), 5L, "view"),
      (3L, ts("2024-01-01 10:00:00"), 6L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Attribution.unconvertedTouches(events,
        col("user_id"), col("ts"), col("event_id"),
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase", windowSeconds = 3600L)
      .orderBy("user_id")
      .select("user_id", "touch_id", "abandoned")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1L, false), (2L, 3L, true), (3L, 5L, true)))
  }

  test("unconvertedTouches: window boundary inclusive at exactly +window") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Attribution.unconvertedTouches(events,
        col("user_id"), col("ts"), col("event_id"),
        col("event_type") === "click", col("event_type") === "purchase",
        windowSeconds = 3600L)
      .select("abandoned").as[Boolean].head()
    assert(!out)
  }

  test("positionCredit: U-shape 40/20/40, middle remainder to earliest") {
    // 5 touches before one purchase: credits 400000 | middle 200000/3 =
    // 66666 r2 → positions 1,2 get +1 | 400000
    val events = ((1 to 5).map(i =>
      (1L, ts(f"2024-01-01 0$i:00:00"), i.toLong, "view")) :+
      (1L, ts("2024-01-01 06:00:00"), 6L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Attribution.positionCredit(events, col("user_id"),
        col("ts"), col("event_id"), col("event_type") === "view",
        col("event_type") === "purchase", lookbackSeconds = 86400L)
      .orderBy("position")
      .select("touch_id", "position", "credit_ppm")
      .as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 400000L), (2L, 1, 66667L), (3L, 2, 66667L),
      (4L, 3, 66666L), (5L, 4, 400000L)))
    assert(out.map(_._3).sum == 1000000L)
  }

  test("positionCredit: n=1 and n=2 conventions; no-touch conversion drops") {
    val events = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 02:00:00"), 2L, "purchase"),   // n=1 → 1e6
      (2L, ts("2024-01-01 01:00:00"), 3L, "view"),
      (2L, ts("2024-01-01 01:30:00"), 4L, "click"),
      (2L, ts("2024-01-01 02:00:00"), 5L, "purchase"),   // n=2 → 500k each
      (3L, ts("2024-01-01 02:00:00"), 6L, "purchase")    // n=0 → no rows
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Attribution.positionCredit(events, col("user_id"),
        col("ts"), col("event_id"),
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase", lookbackSeconds = 86400L)
      .orderBy("user_id", "position")
      .select("user_id", "credit_ppm").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1000000L), (2L, 500000L), (2L, 500000L)))
  }

  test("firstTouch plans exactly one hash exchange and one RANGE window") {
    val events = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val plan = Attribution.firstTouch(events, col("user_id"), col("ts"),
        col("event_id"), col("event_type") === "view",
        col("event_type") === "purchase", lookbackSeconds = 86400)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$plan")
    // both aggregates ride ONE Window node (no second sort/window pass)
    val windows = "(?m)^\\s*[*+:-]*\\s*Window ".r.findAllIn(plan).length
    assert(windows == 1, s"expected 1 Window node, got $windows in:\n$plan")
    assert(plan.contains("RangeFrame"), s"expected RANGE frame in:\n$plan")
  }

  test("timeDecayCredit: power-of-two decay, Hamilton exact 1e6 split") {
    // touches 2/1/0 whole half-lives (1 day) before the conversion →
    // weights 2^38 : 2^39 : 2^40, shares 1/7, 2/7, 4/7 of 1e6; the one
    // leftover ppm goes to the largest remainder (the newest touch)
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 12:00:00", 2L, "click"),
      (1L, "2024-01-02 12:00:00", 3L, "view"),
      (1L, "2024-01-03 00:00:00", 9L, "purchase")
    ).map { case (u, t, e, ty) =>
      (u, java.sql.Timestamp.valueOf(t), e, ty)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val out = Attribution.timeDecayCredit(events, col("user_id"),
        col("ts"), col("event_id"),
        isTouch = col("event_type").isin("view", "click"),
        isConversion = col("event_type") === "purchase",
        lookbackSeconds = 7L * 86400, halflifeSeconds = 86400L)
      .orderBy("position")
      .as[(Long, Long, Long, Int, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 9L, 1L, 0, 1L << 38, 142857L),
      (1L, 9L, 2L, 1, 1L << 39, 285714L),
      (1L, 9L, 3L, 2, 1L << 40, 571429L)))
    assert(out.map(_._6).sum == 1000000L)
  }

  test("timeDecayCredit: equal weights tie the leftover to the earliest") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 11:00:00", 2L, "view"),
      (1L, "2024-01-01 12:00:00", 3L, "view"),
      (1L, "2024-01-01 13:00:00", 9L, "purchase")
    ).map { case (u, t, e, ty) =>
      (u, java.sql.Timestamp.valueOf(t), e, ty)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val out = Attribution.timeDecayCredit(events, col("user_id"),
        col("ts"), col("event_id"),
        isTouch = col("event_type") === "view",
        isConversion = col("event_type") === "purchase",
        lookbackSeconds = 86400L, halflifeSeconds = 86400L)
      .orderBy("position")
      .as[(Long, Long, Long, Int, Long, Long)].collect().toSeq
    assert(out.map(_._6) == Seq(333334L, 333333L, 333333L))
  }

  test("timeDecayCredit: 40-half-life cap floors the weight at 1") {
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),   // 3000 s = 50 half-lives
      (1L, "2024-01-01 00:50:00", 9L, "purchase")
    ).map { case (u, t, e, ty) =>
      (u, java.sql.Timestamp.valueOf(t), e, ty)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val out = Attribution.timeDecayCredit(events, col("user_id"),
        col("ts"), col("event_id"),
        isTouch = col("event_type") === "view",
        isConversion = col("event_type") === "purchase",
        lookbackSeconds = 86400L, halflifeSeconds = 60L)
      .as[(Long, Long, Long, Int, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 9L, 1L, 0, 1L, 1000000L)))
  }
}
