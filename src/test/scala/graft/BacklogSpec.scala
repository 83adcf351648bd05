package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Backlog

class BacklogSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("monthlyBacklog: flows balance, lineless orders never ship") {
    val orders = Seq(
      (1L, ts("2024-01-05")), // ships in Feb
      (2L, ts("2024-01-20")), // ships in Jan (same month)
      (3L, ts("2024-02-10")), // no lines: permanent backlog
      (4L, ts("2024-02-15"))  // ships in Feb (last line decides)
    ).toDF("o_orderkey", "o_orderdate")
    val lineitem = Seq(
      (1L, ts("2024-02-01")),
      (2L, ts("2024-01-25")),
      (4L, ts("2024-02-16")), (4L, ts("2024-02-20"))
    ).toDF("l_orderkey", "l_shipdate")
    val out = Backlog.monthlyBacklog(orders, lineitem)
      .orderBy("month")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01", 2L, 1L, 1L),   // placed 1,2; shipped 2 → backlog 1
      ("2024-02", 2L, 2L, 1L)))  // placed 3,4; shipped 1,4 → order 3 open
  }

  test("monthlyBacklog: a ship-only month still emits (full outer flows)") {
    val orders = Seq((1L, ts("2024-01-05"))).toDF("o_orderkey", "o_orderdate")
    val lineitem = Seq((1L, ts("2024-03-01"))).toDF("l_orderkey", "l_shipdate")
    val out = Backlog.monthlyBacklog(orders, lineitem)
      .orderBy("month")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("2024-01", 1L, 0L, 1L), ("2024-03", 0L, 1L, 0L)))
  }
}
