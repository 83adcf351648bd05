package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.ops.Concurrency

class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("peakPerDay: overlaps counted, carry-in base across midnight") {
    val ivals = Seq(
      // day 1: three sessions, two overlapping at 10:30
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")),
      (ts("2024-01-01 23:00:00"), ts("2024-01-02 02:00:00")), // spans midnight
      // day 2: one more while the spanning one is still open
      (ts("2024-01-02 01:00:00"), ts("2024-01-02 01:30:00"))
    ).toDF("session_start", "session_end")
    val out = Concurrency.peakPerDay(ivals, col("session_start"),
        col("session_end"))
      .orderBy("day")
      .as[(Date, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      // day 1 starts at 0, peaks at 2 (10:30-11:00), 3 starts / 2 ends
      (Date.valueOf("2024-01-01"), 0L, 2L, 3L, 2L),
      // day 2 opens with the spanning session (base 1), peaks at 2
      (Date.valueOf("2024-01-02"), 1L, 2L, 1L, 2L)))
  }

  test("peakPerDay: touching intervals are concurrent (inclusive ends)") {
    val ivals = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"))
    ).toDF("session_start", "session_end")
    val out = Concurrency.peakPerDay(ivals, col("session_start"),
        col("session_end"))
      .select("peak_concurrency").as[Long].collect().head
    assert(out == 2L) // +1 sorts before −1 at the shared instant
  }

  test("peakPerDay: an end-only day never peaks above its base") {
    val ivals = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-02 10:00:00"))
    ).toDF("session_start", "session_end")
    val out = Concurrency.peakPerDay(ivals, col("session_start"),
        col("session_end"))
      .orderBy("day")
      .as[(Date, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (Date.valueOf("2024-01-01"), 0L, 1L, 1L, 0L),
      (Date.valueOf("2024-01-02"), 1L, 1L, 0L, 1L)))
  }
}
