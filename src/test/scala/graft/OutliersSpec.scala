package graft

import org.apache.spark.sql.functions._
import graft.ops.Outliers

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers: flags only beyond k·MAD, per-key statistics") {
    // user 1: values 10,12,14,16,100 → med 14 (disc), devs {4,2,0,2,86}
    //   → MAD 2, threshold 6 → only the 100 flags
    // user 2: tight cluster, no flags
    val events = Seq(
      (1L, 1L, 10L), (1L, 2L, 12L), (1L, 3L, 14L), (1L, 4L, 16L),
      (1L, 5L, 100L),
      (2L, 6L, 50L), (2L, 7L, 51L), (2L, 8L, 52L)
    ).toDF("user_id", "event_id", "value")
    val out = Outliers.madOutliers(events, col("user_id"), col("event_id"),
        col("value"), k = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 5L, 100L, 14L, 2L, 86L)))
  }

  test("madOutliers: zero MAD flags any deviation; z-score would not") {
    // majority identical → MAD 0: the single deviant flags even though
    // its absolute distance is tiny (documented degenerate case)
    val events = Seq(
      (1L, 1L, 5L), (1L, 2L, 5L), (1L, 3L, 5L), (1L, 4L, 6L)
    ).toDF("user_id", "event_id", "value")
    val out = Outliers.madOutliers(events, col("user_id"), col("event_id"),
        col("value"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L, 6L, 5L, 0L, 1L)))
  }
}
