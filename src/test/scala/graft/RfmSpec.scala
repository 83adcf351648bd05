package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Rfm

class RfmSpec extends SparkSpec {
  import spark.implicits._

  private def ord(cust: Long, day: String, price: Double) =
    (cust, Timestamp.valueOf(day + " 00:00:00"), price)

  test("segment: quartile scores against percentile_disc thresholds") {
    // 4 customers with strictly ordered metrics on every axis:
    // cust 1 = oldest/least/cheapest … cust 4 = newest/most/biggest.
    val orders = Seq(
      ord(1L, "2024-01-01", 10.0),
      ord(2L, "2024-01-05", 10.0), ord(2L, "2024-01-05", 10.0),
      ord(3L, "2024-01-10", 20.0), ord(3L, "2024-01-10", 20.0),
      ord(3L, "2024-01-10", 20.0),
      ord(4L, "2024-01-20", 50.0), ord(4L, "2024-01-20", 50.0),
      ord(4L, "2024-01-20", 50.0), ord(4L, "2024-01-20", 50.0)
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Rfm.segment(orders, col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
      .orderBy("cust")
      .select("cust", "recency_days", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score", "rfm_code")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // percentile_disc thresholds over {19,15,10,0} days / {1,2,3,4}
    // orders / {10,20,60,200} units: q25/q50/q75 are the 1st/2nd/3rd
    // smallest values, so exactly one customer lands in each quartile.
    assert(out == Seq(
      (1L, 19L, 1L, 1000L, 1L, 1L, 1L, 111L),
      (2L, 15L, 2L, 2000L, 2L, 2L, 2L, 222L),
      (3L, 10L, 3L, 6000L, 3L, 3L, 3L, 333L),
      (4L, 0L, 4L, 20000L, 4L, 4L, 4L, 444L)))
  }

  test("segment: identical metrics collapse to one score") {
    val orders = Seq(ord(1L, "2024-01-01", 10.0), ord(2L, "2024-01-01", 10.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Rfm.segment(orders, col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
      .select("rfm_code").as[Long].collect().toSet
    // every metric equals every threshold (v > q never holds):
    // f/m score 1, recency score 4 (most recent possible)
    assert(out == Set(411L))
  }
}
