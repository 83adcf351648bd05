package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.ops.ActiveUsers

class ActiveUsersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 12:00:00")

  test("dedup is per grain: repeat visits count once per day/week/month") {
    // 2024-01: Mon 1st, Tue 2nd (same ISO week), Mon 15th (other week)
    val ev = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-01")),  // dup same day
      (2L, ts("2024-01-01")),
      (1L, ts("2024-01-02")),
      (3L, ts("2024-01-15"))
    ).toDF("user_id", "ts")
    val out = ActiveUsers.dauWauMau(ev, col("user_id"), col("ts"))
      .as[(Date, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // week of Jan 1-2: users {1,2}; month: {1,2,3}
    assert(out("2024-01-01") == ((2L, 2L, 3L, 1000000L, 666666L)))
    assert(out("2024-01-02") == ((1L, 2L, 3L, 500000L, 333333L)))
    assert(out("2024-01-15") == ((1L, 1L, 3L, 1000000L, 333333L)))
  }

  test("weeks are ISO (Monday-anchored) and cross month boundaries") {
    // Fri 2024-03-29 and Mon 2024-04-01 are different ISO weeks;
    // Sun 2024-03-31 and Fri 2024-03-29 share one
    val ev = Seq(
      (1L, ts("2024-03-29")), (2L, ts("2024-03-31")),
      (1L, ts("2024-04-01"))
    ).toDF("user_id", "ts")
    val out = ActiveUsers.dauWauMau(ev, col("user_id"), col("ts"))
      .as[(Date, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1.toString -> r._3).toMap
    assert(out("2024-03-29") == 2L)  // users 1 and 2 in week of Mar 25
    assert(out("2024-03-31") == 2L)
    assert(out("2024-04-01") == 1L)  // new ISO week
  }
}
