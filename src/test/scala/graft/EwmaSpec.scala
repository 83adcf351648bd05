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
}
