package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions: gap threshold splits, boundary gap stays, ties share a session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:29:00")), // 29 min — same session
      (1L, ts("2024-01-01 10:59:00")), // exactly 30 min — gap NOT > threshold
      (1L, ts("2024-01-01 12:00:00")), // 61 min — new session
      (1L, ts("2024-01-01 12:00:00")), // tie: same session as its twin
      (2L, ts("2024-01-01 09:00:00"))  // other key: own numbering
    ).toDF("user_id", "ts")
    val out = Sessionize.sessions(events, col("user_id"), col("ts"),
        gapSeconds = 1800)
      .orderBy("user_id", "session_seq")
      .as[(Long, Long, Long, Timestamp, Timestamp)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:59:00")),
      (1L, 2L, 2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00")),
      (2L, 1L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"))))
  }

  test("sessions: sub-second gaps compare in microseconds, not truncated seconds") {
    // 0.9 s apart straddling a second boundary: a seconds cast would see
    // gap=1 > 0 but misclassify 1.5 s as 1 s etc. — with a 1 s threshold
    // the 0.9 s gap must NOT split and the 1.1 s gap MUST
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00.500")),
      (1L, Timestamp.valueOf("2024-01-01 10:00:01.400")), // +0.9 s: same
      (1L, Timestamp.valueOf("2024-01-01 10:00:02.600"))  // +1.2 s: splits
    ).toDF("user_id", "ts")
    val out = Sessionize.sessions(events, col("user_id"), col("ts"),
        gapSeconds = 1)
      .orderBy("session_seq").select("session_seq", "n_events")
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("sessions costs exactly one hash exchange (rollup reuses the window partitioning)") {
    spark.conf.set("spark.graft.parallelizeInputs", "false")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.queries("w5_sessionize")(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.graft.parallelizeInputs", "true")
    }
  }

  test("depthHistogram: session sizes bucket with exact ppm shares") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: one 3-event session + one 1-event session (gap > 30 min);
    // user 2: one 1-event session
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 09:10:00")),
      (1L, ts("2024-01-01 09:20:00")),
      (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val out = graft.ops.Sessionize.depthHistogram(events, col("user_id"),
        col("ts"), gapSeconds = 1800)
      .orderBy("n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 666666L), (3L, 1L, 333333L)))
  }

  test("interArrivalSpectrum: bands are binary digit counts, zeros band 0") {
    import java.sql.Timestamp
    def at(sec: Int) = Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))
    // one user: gaps 0, 1, 5, 300 s → bands 0, 1, 3, 9 (300 = 100101100b)
    val events = Seq(0, 0, 1, 6, 306).map(s => (1L, at(s)))
      .toDF("user_id", "ts")
    val out = graft.ops.Sessionize.interArrivalSpectrum(events,
        col("user_id"), col("ts"))
      .orderBy("band")
      .select("band", "n_gaps", "min_gap_s", "max_gap_s", "share_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 1L, 0L, 0L, 250000L),
      (1L, 1L, 1L, 1L, 250000L),
      (3L, 1L, 5L, 5L, 250000L),
      (9L, 1L, 300L, 300L, 250000L)))
  }
}
