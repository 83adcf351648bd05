package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{DateWindows, IterationSpec}
import org.apache.spark.sql.functions.lit

class DateWindowsSpec extends AnyFunSuite {

  test("look-back counts from the FIRST of the month, not the partition date") {
    // reference script/main.py:206-208: first_day_past =
    // partition_date.replace(day=1) - days_ago
    val dw = DateWindows.resolve("2024-06-15", "10")
    assert(dw.firstDayCurrentMonth == "2024-06-01")
    assert(dw.firstDayPast == "2024-05-22") // June 1 - 10 days, NOT June 5
    assert(dw.partitionDate == "2024-06-15")
    assert(dw.partitionMonth == "2024-06")
  }

  test("full_refresh pins the look-back to the data epoch") {
    val dw = DateWindows.resolve("2024-08-03", "full_refresh")
    assert(dw.firstDayPast == DateWindows.fullRefreshEpoch)
    assert(dw.firstDayCurrentMonth == "2024-08-01")
  }

  test("'yesterday' resolves against the injected clock") {
    val dw = DateWindows.resolve("yesterday", "10",
      today = LocalDate.parse("2024-03-01"))
    assert(dw.partitionDate == "2024-02-29") // leap year
    assert(dw.firstDayCurrentMonth == "2024-02-01")
    assert(dw.firstDayPast == "2024-01-22")
    assert(dw.partitionMonth == "2024-02")
  }

  test("catalog predicates are closed intervals on the partition column") {
    val dw = DateWindows.resolve("2024-06-15", "10")
    assert(dw.lookbackPredicate("pcd") ==
      "(pcd >= date'2024-05-22' and pcd <= date'2024-06-15')")
    assert(dw.currentMonthPredicate("pcd") ==
      "(pcd >= date'2024-06-01' and pcd <= date'2024-06-15')")
  }

  test("toParams maps anchors onto half-open pipeline windows") {
    val p = DateWindows.toParams(DateWindows.resolve("2024-06-15", "10"),
      Seq(IterationSpec("only", lit(true))))
    assert(p.monthStart == "2024-06-01" && p.monthEnd == "2024-06-16")
    assert(p.activityFrom == "2024-05-22" && p.activityTo == "2024-06-16")
    assert(p.iterations.map(_.name) == Seq("only"))
  }
}
