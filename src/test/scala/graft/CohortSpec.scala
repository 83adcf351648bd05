package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Cohort

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention: cohorts by first period, offsets count distinct-active keys") {
    val events = Seq(
      // user 1: cohort week 0, active weeks 0, 2 (twice in week 2 — counts once)
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-18 10:00:00")),
      (1L, ts("2024-01-19 10:00:00")),
      // user 2: cohort week 0, active weeks 0 and 1
      (2L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-09 10:00:00")),
      // user 3: cohort week 1 only
      (3L, ts("2024-01-10 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Cohort.retention(events, col("user_id"), col("ts"),
        originDate = "2024-01-01", bucketDays = 7)
      .orderBy("cohort_period", "period_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 2L, 1000L), // both week-0 users
      (0L, 1L, 1L, 500L),  // user 2
      (0L, 2L, 1L, 500L),  // user 1 (deduped within the week)
      (1L, 0L, 1L, 1000L))) // user 3's own cohort
  }

  test("retention: offset-0 cell equals the cohort size for every cohort") {
    val out = SparkEntry.queries("w8_cohort_retention")(
      spark, "/root/testdata/sf0.001")
    val bad = out.filter(col("period_offset") === 0 &&
      col("retention_permille") =!= 1000)
    assert(bad.isEmpty, "offset 0 must be 1000 permille by construction")
  }
}
