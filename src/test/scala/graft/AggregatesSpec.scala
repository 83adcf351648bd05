package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Aggregates

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("cubeReport: all 8 grouping sets, grouping_id bit order, exact cents") {
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      ("A", "O", ts("1995-03-01"), 10.0),
      ("A", "F", ts("1996-03-01"), 20.0),
      ("R", "O", ts("1995-06-01"), 5.0)
    ).toDF("l_returnflag", "l_linestatus", "l_shipdate", "l_extendedprice")
    val out = Aggregates.cubeReport(li, col("l_returnflag"),
        col("l_linestatus"), year(col("l_shipdate")).cast("long"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // 8 grouping sets; distinct keys per set: detail 3, flag×status 3,
    // flag×year 3, status×year 2 (O only in 1995, F only in 1996),
    // flag 2, status 2, year 2, grand total 1
    assert(out.size == 3 + 3 + 3 + 2 + 2 + 2 + 2 + 1)
    // grand total: gid = 0b111
    assert(out((None, None, None)) == ((7L, 3L, 3500L)))
    // flag subtotal: status+year aggregated → gid = 0b011
    assert(out((Some("A"), None, None)) == ((3L, 2L, 3000L)))
    // year subtotal: flag+status aggregated → gid = 0b110
    assert(out((None, None, Some(1995L))) == ((6L, 2L, 1500L)))
    // detail row: gid = 0
    assert(out((Some("R"), Some("O"), Some(1995L))) == ((0L, 1L, 500L)))
  }
}
