package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Survival

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def e(u: Long, day: String) =
    (u, Timestamp.valueOf(day + " 12:00:00"))

  test("kaplanMeier: censoring shrinks the risk set without an event") {
    // corpus edge = 2024-01-20
    val events = Seq(
      e(1L, "2024-01-01"), e(1L, "2024-01-02"), // T=1, churned
      e(2L, "2024-01-01"), e(2L, "2024-01-10"), // T=9, churned
      e(3L, "2024-01-05"), e(3L, "2024-01-18"), // T=13, censored (gap 2)
      e(4L, "2024-01-20")                       // T=0, censored (gap 0)
    ).toDF("user_id", "ts")
    val out = Survival.kaplanMeier(events, col("user_id"), col("ts"),
        churnGapDays = 7)
      .orderBy("duration_days")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 4L, 0L, 1L, 1000000L),  // censor-only: S unchanged
      (1L, 3L, 1L, 0L, 666666L),   // 1e6·2/3
      (9L, 2L, 1L, 0L, 333333L),   // 666666·1/2
      (13L, 1L, 0L, 1L, 333333L))) // censor-only again
  }

  test("kaplanMeier: everyone churns at once → survival drops to zero") {
    val events = Seq(
      e(1L, "2024-01-01"), e(1L, "2024-01-03"),
      e(2L, "2024-01-01"), e(2L, "2024-01-03"),
      e(9L, "2024-01-30") // pushes the edge out so 1 and 2 are churned
    ).toDF("user_id", "ts")
    val out = Survival.kaplanMeier(events, col("user_id"), col("ts"),
        churnGapDays = 7)
      .orderBy("duration_days")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 0L, 1L, 1000000L),  // user 9 is the censored edge user
      (2L, 2L, 2L, 0L, 0L)))       // both remaining users churn at T=2
  }
}
