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

  test("seasonalAnomalies: each hour-of-week slot has its own baseline") {
    import java.sql.Timestamp
    // Three Mondays 09:00 (2024-01-01/08/15 are Mondays): counts 3,3,9
    // → slot 109 med 3, MAD 0, the 9 flags. Saturday 02:00 counts 1,1
    // → quiet slot, no flag even though 9 would dwarf it globally.
    def at(day: String, h: Int, n: Int) = (1 to n).map(i =>
      Timestamp.valueOf(f"$day $h%02d:${i % 60}%02d:00"))
    val ts = (at("2024-01-01", 9, 3) ++ at("2024-01-08", 9, 3) ++
      at("2024-01-15", 9, 9) ++ at("2024-01-06", 2, 1) ++
      at("2024-01-13", 2, 1)).map(Tuple1(_))
    val events = ts.toDF("ts")
    val out = Outliers.seasonalAnomalies(events, col("ts"), k = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val mon9us = Timestamp.valueOf("2024-01-15 09:00:00").getTime * 1000
    assert(out == Seq((109L, mon9us, 9L, 3L, 0L, 6L)))
  }

  test("seasonalAnomalies: a total-outage hour (zero events) flags via the dense spine") {
    import java.sql.Timestamp
    // Tuesday 10:00 on 3 consecutive weeks carries ~8 events; the 4th
    // Tuesday 10:00 has NONE — the densified spine must surface it
    def at(day: String, n: Int) = (1 to n).map(i =>
      Timestamp.valueOf(f"$day 10:${i % 60}%02d:00"))
    // the 4th week's only event sits in the NEXT hour, so it extends the
    // spine past the outage without filling the outage slot itself
    val events = (at("2024-01-02", 8) ++ at("2024-01-09", 8) ++
      at("2024-01-16", 8) ++
      Seq(Timestamp.valueOf("2024-01-23 11:00:00"))).map(Tuple1(_))
      .toSeq.toDF("ts")
    val out = Outliers.seasonalAnomalies(events, col("ts"), k = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val tue10us = Timestamp.valueOf("2024-01-23 10:00:00").getTime * 1000
    // slot 210 (Tue 10:00) counts are 8,8,8,0 → med 8, MAD 0, the zero
    // hour deviates by 8 and flags
    assert(out.contains((210L, tue10us, 0L, 8L, 0L, 8L)),
      s"outage hour missing from $out")
  }
}
