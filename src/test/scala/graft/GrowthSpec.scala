package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.ops.Growth

class GrowthSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 10:00:00")

  test("monthly flows: new, retained, resurrected, churned all classify") {
    // u1: jan, feb, apr (gap -> churn into mar, resurrect in apr)
    // u2: jan only (churns into feb)
    val ev = Seq(
      (1L, ts("2024-01-05")), (1L, ts("2024-02-10")), (1L, ts("2024-04-01")),
      (2L, ts("2024-01-20"))
    ).toDF("user_id", "ts")
    val out = Growth.accounting(ev, col("user_id"), col("ts"))
      .as[(Date, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // (active, new, retained, resurrected, churned)
    assert(out("2024-01-01") == ((2L, 2L, 0L, 0L, 0L)))
    assert(out("2024-02-01") == ((1L, 0L, 1L, 0L, 1L)))  // u2 churned
    assert(out("2024-03-01") == ((0L, 0L, 0L, 0L, 1L)))  // u1 gap
    assert(out("2024-04-01") == ((1L, 0L, 0L, 1L, 0L)))  // u1 back
    assert(out("2024-05-01") == ((0L, 0L, 0L, 0L, 1L)))  // trailing churn
  }

  test("active(p) identity: new + retained + resurrected") {
    val ev = Seq(
      (1L, ts("2024-01-05")), (2L, ts("2024-01-06")),
      (1L, ts("2024-02-07")), (3L, ts("2024-02-08")),
      (2L, ts("2024-03-09")), (1L, ts("2024-03-10"))
    ).toDF("user_id", "ts")
    Growth.accounting(ev, col("user_id"), col("ts"))
      .as[(Date, Long, Long, Long, Long, Long)].collect().foreach { r =>
        assert(r._2 == r._3 + r._4 + r._5, s"identity broken at $r")
      }
  }

  test("weekly grain steps by 7 days from ISO Mondays") {
    val ev = Seq(
      (1L, ts("2024-01-02")),  // week of Jan 1
      (1L, ts("2024-01-10")),  // week of Jan 8 -> retained
      (1L, ts("2024-01-22"))   // week of Jan 22 -> resurrected (gap)
    ).toDF("user_id", "ts")
    val out = Growth.accounting(ev, col("user_id"), col("ts"), "week")
      .as[(Date, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("2024-01-01") == ((1L, 1L, 0L, 0L, 0L)))
    assert(out("2024-01-08") == ((1L, 0L, 1L, 0L, 0L)))
    assert(out("2024-01-15") == ((0L, 0L, 0L, 0L, 1L)))
    assert(out("2024-01-22") == ((1L, 0L, 0L, 1L, 0L)))
    assert(out("2024-01-29") == ((0L, 0L, 0L, 0L, 1L)))
  }

  test("cumulativeDistinct: first-seen month only, running total accumulates") {
    val orders = Seq(
      (1L, ts("2024-01-05")),  // u1 first in Jan
      (1L, ts("2024-03-09")),  // reappears in Mar -> must NOT count again
      (2L, ts("2024-01-20")),  // u2 first in Jan
      (3L, ts("2024-02-11")),  // u3 first in Feb
      (4L, ts("2024-03-01"))   // u4 first in Mar
    ).toDF("user_id", "ts")
    val out = Growth.cumulativeDistinct(orders, col("user_id"), col("ts"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("2024-01", 2L, 2L), ("2024-02", 1L, 3L), ("2024-03", 1L, 4L)))
  }
}
