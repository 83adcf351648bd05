package graft

import org.apache.spark.sql.functions._
import graft.ops.Rolling

class RollingSpec extends SparkSpec {
  import spark.implicits._

  test("trailing: RANGE frame ages gaps out — hand-computed 3-period window") {
    // key 1 active on days 0, 1, 5: day 5's trailing-3 window is days 3..5,
    // so ONLY day 5 contributes (a ROWS frame would wrongly reach day 1)
    val events = Seq(
      (1L, 0L, 10L), (1L, 0L, 20L), (1L, 1L, 5L), (1L, 5L, 7L),
      (2L, 4L, 100L)
    ).toDF("user_id", "day", "vm")
    val out = Rolling.trailing(events, col("user_id"), col("day"),
        col("vm"), windowPeriods = 3)
      .orderBy("user_id", "period")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 2L, 30L, 2L, 30L),
      (1L, 1L, 1L, 5L, 3L, 35L),   // days -1..1 → 0 and 1
      (1L, 5L, 1L, 7L, 1L, 7L),    // days 3..5 → just itself
      (2L, 4L, 1L, 100L, 1L, 100L)))
  }

  test("trailing: events shuffle once map-side combined; window exchange is daily-scale") {
    spark.conf.set("spark.graft.parallelizeInputs", "false")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("w9_rolling_window")(
        spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      val p = plan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges in:\n$p")
      // the event-scale exchange must sit ABOVE a partial aggregate (map-side
      // combine), so raw events never cross the wire uncombined
      assert(p.contains("HashAggregate"), s"expected partial aggregation in:\n$p")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.graft.parallelizeInputs", "true")
    }
  }

  test("trailingMedian: lower median over the RANGE frame, gaps age out") {
    import java.sql.Timestamp
    def ev(u: Long, day: Int, v: Double) =
      (u, new Timestamp(86400000L * day), v)
    // user 1 daily totals: day0=10, day1=1000 (spike), day2=20
    val rows = Seq(ev(1L, 0, 10.0), ev(1L, 1, 1000.0), ev(1L, 2, 20.0),
      // day 10: far past the 3-day window — frame resets to itself
      ev(1L, 10, 7.0))
    val out = graft.ops.Rolling.trailingMedian(
        rows.toDF("user_id", "ts", "value"), col("user_id"),
        expr("CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)"),
        expr("CAST(round(value * 1000000) AS BIGINT)"), windowPeriods = 3)
      .orderBy("period")
      .select("period", "n_frame", "median_micro_trail")
      .as[(Long, Long, Long)].collect().toSeq
    // day0: [10] → 10; day1: [10,1000] lower median → 10 (the spike
    // does NOT drag it, unlike the trailing mean); day2: [10,1000,20]
    // → 20; day10: [7] → 7
    assert(out == Seq((0L, 1L, 10000000L), (1L, 2L, 10000000L),
      (2L, 3L, 20000000L), (10L, 1L, 7000000L)))
  }

  test("rollingCorr: perfect correlation, broken tail, degenerate frames null") {
    // daily panel (x = type p, y = type c): day0 (1,2), day1 (2,4),
    // day2 (3,6) — collinear so corr is exactly 1.0; day3 (1,0) breaks it
    val events = Seq(
      (0L, "p", 1L), (0L, "c", 2L),
      (1L, "p", 2L), (1L, "c", 4L),
      (2L, "p", 3L), (2L, "c", 6L),
      (3L, "p", 1L),
      (0L, "view", 999L)  // other types never enter the panel
    ).toDF("day", "et", "vm")
    val out = Rolling.rollingCorr(events, col("day"), col("et"),
        col("vm"), typeX = "p", typeY = "c", windowPeriods = 3)
      .orderBy("period")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    // day3 frame = days 1..3: x [2,3,1], y [4,6,0] →
    // 18 / sqrt(6·56) = 0.9819805… → 0.981981 at 6dp
    assert(out == Seq(
      (0L, 1L, 2L, 1L, None),          // n=1 → null
      (1L, 2L, 4L, 2L, Some(1.0)),
      (2L, 3L, 6L, 3L, Some(1.0)),
      (3L, 1L, 0L, 3L, Some(0.981981))))
  }

  test("rollingCorr: constant series has zero variance — null, not NaN") {
    val events = Seq(
      (0L, "p", 5L), (0L, "c", 1L),
      (1L, "p", 5L), (1L, "c", 9L),
      (2L, "p", 5L), (2L, "c", 4L)
    ).toDF("day", "et", "vm")
    val out = Rolling.rollingCorr(events, col("day"), col("et"),
        col("vm"), typeX = "p", typeY = "c", windowPeriods = 3)
      .orderBy("period")
      .select("corr_trail").as[Option[Double]].collect().toSeq
    assert(out == Seq(None, None, None))
  }

  test("bollingerBreakouts: flat series never flags, a spike does, minPeriods gates") {
    // Max z-score of a single outlier among n samples is (n−1)/√n — for
    // k=2 a spike can only flag at n ≥ 6 (4/√5 ≈ 1.79 < 2 at n=5, the
    // degenerate case that makes a 5-day fixture IMPOSSIBLE to flag).
    // Six flat days then a spike: z = 6/√7 ≈ 2.27 > 2.
    val ev = ((0L to 5L).map(d => (1L, d, 100L)) :+ ((1L, 6L, 2000L)))
      .toDF("user_id", "day", "vm")
    val out = Rolling.bollingerBreakouts(ev, col("user_id"), col("day"),
        col("vm"), windowPeriods = 7, k = 2L, minPeriods = 3)
      .orderBy("period")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    // days 0-1 drop (n < 3); flat windows never break out; the spike:
    // dev² = (7·2000−2600)² = 129,960,000 > 4·(7·4,060,000−2600²)
    //      = 86,640,000 → flags
    assert(out == Seq(
      (1L, 2L, 100L, 3L, 300L, false),
      (1L, 3L, 100L, 4L, 400L, false),
      (1L, 4L, 100L, 5L, 500L, false),
      (1L, 5L, 100L, 6L, 600L, false),
      (1L, 6L, 2000L, 7L, 2600L, true)))
  }
}
