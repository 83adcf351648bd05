package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Changepoint

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(vals: Seq[Long]) = {
    val df = vals.zipWithIndex.map { case (v, i) =>
      (1L, ts(f"2024-01-01 00:${i}%02d:00"), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "vm")
    Changepoint.cusum(df, col("user_id"), col("ts"), col("event_id"),
        col("vm"))
      .as[(Long, Long, Long, Long, Long)].head()
  }

  test("cusum: a level shift peaks AT the changepoint") {
    // 0,0,0,0 then 100,100,100,100: mean 50; cusum walks -50·i to -200
    // at index 3 (the last pre-shift point), then climbs back to 0
    val (_, n, mean, peak, atUs) = run(Seq(0L, 0L, 0L, 0L, 100L, 100L, 100L, 100L))
    assert(n == 8 && mean == 50L && peak == 200L)
    assert(atUs == ts("2024-01-01 00:03:00").getTime * 1000L)
  }

  test("cusum: a flat series has zero peak everywhere, earliest tie wins") {
    val (_, n, mean, peak, atUs) = run(Seq(7L, 7L, 7L))
    assert(n == 3 && mean == 7L && peak == 0L)
    assert(atUs == ts("2024-01-01 00:00:00").getTime * 1000L)
  }

  test("cusum: truncated mean leaks at most n-1 into the tail, not the peak") {
    // sum 10 over n=3 → mean 3 (truncated); cusum: -2, 3, 1 (tail ≠ 0)
    val (_, _, mean, peak, atUs) = run(Seq(1L, 8L, 1L))
    assert(mean == 3L && peak == 3L)
    assert(atUs == ts("2024-01-01 00:01:00").getTime * 1000L)
  }

  test("cusum plans one hash exchange; window and rollup share it") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1L))
      .toDF("user_id", "ts", "event_id", "vm")
    val plan = Changepoint.cusum(df, col("user_id"), col("ts"),
      col("event_id"), col("vm")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$plan")
  }
}
