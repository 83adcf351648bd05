package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Ewma

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("smooth: integer recurrence in (ts, event_id) order") {
    // α=0.5: s0=1000, s1=(500000·3000+500000·1000)/1e6=2000,
    // s2=(500000·500+500000·2000)/1e6=1250
    val df = Seq(
      (1L, ts("2024-01-01 00:00:02"), 3L, 500L),
      (1L, ts("2024-01-01 00:00:00"), 1L, 1000L),
      (1L, ts("2024-01-01 00:00:01"), 2L, 3000L)
    ).toDF("user_id", "ts", "event_id", "vm")
    val out = Ewma.smooth(df, col("user_id"), col("ts"), col("event_id"),
        col("vm"), alphaPpm = 500000L)
      .as[(Long, Long, Long, Long)].head()
    assert(out._2 == 3L)                       // n_obs
    assert(out._4 == 1250L)                    // ewma_milli
  }

  test("smooth: same-timestamp ties break on event_id") {
    // two events at the same µs: order must be eid 1 then eid 2
    // α=0.5: s0=100 (eid 1), s1=(0.5·900+0.5·100)=500
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, 900L),
      (1L, ts("2024-01-01 00:00:00"), 1L, 100L)
    ).toDF("user_id", "ts", "event_id", "vm")
    val out = Ewma.smooth(df, col("user_id"), col("ts"), col("event_id"),
        col("vm"), alphaPpm = 500000L)
      .select("ewma_milli").as[Long].head()
    assert(out == 500L)
  }

  test("smooth: truncating DIV matches for negative values too") {
    // α=0.5, series (-3, -4): s1 = (0.5·(-4) + 0.5·(-3)) = -3.5 →
    // integer DIV truncates toward zero → -3 (floor would give -4)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, -3L),
      (1L, ts("2024-01-01 00:00:01"), 2L, -4L)
    ).toDF("user_id", "ts", "event_id", "vm")
    val out = Ewma.smooth(df, col("user_id"), col("ts"), col("event_id"),
        col("vm"), alphaPpm = 500000L)
      .select("ewma_milli").as[Long].head()
    assert(out == -3L)
  }

  test("smooth: single observation is its own EWMA; keys are independent") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 42L),
      (2L, ts("2024-01-01 00:00:00"), 2L, 7L),
      (2L, ts("2024-01-01 00:00:01"), 3L, 7L)
    ).toDF("user_id", "ts", "event_id", "vm")
    val out = Ewma.smooth(df, col("user_id"), col("ts"), col("event_id"),
        col("vm"), alphaPpm = 300000L)
      .orderBy("user_id")
      .select("ewma_milli").as[Long].collect().toSeq
    assert(out == Seq(42L, 7L))  // constant series stays constant
  }

  test("smooth plans exactly one shuffle (partial-aggregated groupBy)") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1L))
      .toDF("user_id", "ts", "event_id", "vm")
    val plan = Ewma.smooth(df, col("user_id"), col("ts"), col("event_id"),
      col("vm"), alphaPpm = 200000L).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$plan")
  }

  test("holt: level+trend fold matches the hand recurrence") {
    // v = 1000, 2000, 3000; α=0.2, β=0.3:
    // l0=1000 b0=0 → l1=1200 b1=60 → l2=1608 b2=164
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 1000L),
      (1L, ts("2024-01-01 00:00:01"), 2L, 2000L),
      (1L, ts("2024-01-01 00:00:02"), 3L, 3000L),
      // single-observation key: level = v, trend = 0
      (2L, ts("2024-01-01 00:00:00"), 4L, 500L)
    ).toDF("user_id", "ts", "event_id", "vm")
    val out = graft.ops.Ewma.holt(events, col("user_id"), col("ts"),
        col("event_id"), col("vm"), alphaPpm = 200000L, betaPpm = 300000L)
      .orderBy("user_id")
      .select("user_id", "level_milli", "trend_milli", "forecast_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1608L, 164L, 1772L), (2L, 500L, 0L, 500L)))
  }

  test("holt: a falling series yields a negative trend (truncation-safe)") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 3000L),
      (1L, ts("2024-01-01 00:00:01"), 2L, 2000L),
      (1L, ts("2024-01-01 00:00:02"), 3L, 1000L)
    ).toDF("user_id", "ts", "event_id", "vm")
    val out = graft.ops.Ewma.holt(events, col("user_id"), col("ts"),
        col("event_id"), col("vm"), alphaPpm = 200000L, betaPpm = 300000L)
      .select("level_milli", "trend_milli").as[(Long, Long)]
      .collect().head
    // l1=(0.2·2000+0.8·3000)=2800, b1=(0.3·(−200))=−60
    // l2=(0.2·1000+0.8·2740)=200+2192=2392, b2=(0.3·(−408)+0.7·(−60))
    //   = (−122400000−42000000) DIV 1e6 = −164 (truncation toward zero)
    assert(out == ((2392L, -164L)))
  }

  test("holtWinters: fold matches an in-test integer reference; short keys drop") {
    import java.sql.Timestamp
    val vs = Seq(100L, 200L, 300L, 400L, 500L, 600L, 700L, 800L, 150L)
    val rows = vs.zipWithIndex.map { case (v, i) =>
      (1L, new Timestamp(1000L * (i + 1)), i.toLong, v)
    } ++ Seq((2L, new Timestamp(1000L), 0L, 50L)) // 1 obs — must drop
    val df = rows.toDF("user_id", "ts", "event_id", "vm")
    val (a, na) = (200000L, 800000L); val (b, nb) = (300000L, 700000L)
    val (g, ng) = (400000L, 600000L)
    // reference: same three phases, Scala / truncates like Spark DIV
    var (l, tr, i) = (0L, 0L, 0)
    val s = Array.fill(8)(0L)
    for (v <- vs) {
      if (i < 6) { l += v; s(i + 1) = v; i += 1 }
      else if (i == 6) {
        val lf = (l + v) / 7
        for (k <- 1 to 6) s(k) -= lf
        s(7) = v - lf; l = lf; tr = 0; i = 7
      } else {
        val j = (i % 7) + 1; val sj = s(j)
        val ln = (a * (v - sj) + na * (l + tr)) / 1000000
        val bn = (b * (ln - l) + nb * tr) / 1000000
        s(j) = (g * (v - ln) + ng * sj) / 1000000
        l = ln; tr = bn; i += 1
      }
    }
    val jn = (vs.size % 7) + 1
    val out = graft.ops.Ewma.holtWinters(df, col("user_id"), col("ts"),
        col("event_id"), col("vm"), 200000L, 300000L, 400000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, vs.size.toLong, 9000000L, l, tr, s(jn),
      l + tr + s(jn))))
  }

  test("holtWinters: constant series converges to zero trend and season") {
    import java.sql.Timestamp
    val rows = (0 until 20).map(i =>
      (1L, new Timestamp(1000L * (i + 1)), i.toLong, 500L))
    val out = graft.ops.Ewma.holtWinters(rows.toDF("user_id", "ts",
        "event_id", "vm"), col("user_id"), col("ts"), col("event_id"),
        col("vm"), 200000L, 300000L, 400000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // constant input: level = the constant, trend = 0, seasonals = 0
    assert(out._4 == 500L && out._5 == 0L && out._6 == 0L && out._7 == 500L)
  }

  test("backtest: one-step-ahead errors against the PREVIOUS state") {
    import java.sql.Timestamp
    val ev = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:00:01"), 1L, 10L),
      ("a", Timestamp.valueOf("2024-01-01 00:00:02"), 2L, 20L),
      ("a", Timestamp.valueOf("2024-01-01 00:00:03"), 3L, 0L),
      ("b", Timestamp.valueOf("2024-01-01 00:00:01"), 4L, 7L)
    ).toDF("k", "ts", "eid", "vm")
    val out = Ewma.backtest(ev, col("k"), col("ts"), col("eid"),
        col("vm"), alphaPpm = 200000L)
      .as[(String, Long, Long, Option[Long], Option[Long], Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // a: s0=10; err1=+10 (s->12); err2=-12 (vs s=12, NOT the updated 9)
    assert(out("a") == (("a", 3L, 2L, Some(11L), Some(-1L), 22L, -2L)))
    // b: single obs -> no forecasts, null metrics
    assert(out("b") == (("b", 1L, 0L, None, None, 0L, 0L)))
  }

  test("backtest bias division truncates toward zero on both engines") {
    import java.sql.Timestamp
    // errors +1, -4: se=-3, nf=2 -> bias = -3 DIV 2 = -1 (not floor -2)
    val ev = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:00:01"), 1L, 0L),
      ("a", Timestamp.valueOf("2024-01-01 00:00:02"), 2L, 1L),
      ("a", Timestamp.valueOf("2024-01-01 00:00:03"), 3L, -4L)
    ).toDF("k", "ts", "eid", "vm")
    val out = Ewma.backtest(ev, col("k"), col("ts"), col("eid"),
        col("vm"), alphaPpm = 200000L)
      .select("bias_milli").as[Long].collect().head
    assert(out == -1L)
  }
}
