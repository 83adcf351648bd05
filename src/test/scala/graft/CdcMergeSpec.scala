package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.CdcMerge

class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val snapshot = Seq((1L, 100L), (2L, 200L), (3L, 300L))
    .toDF("k", "sv")

  private def run(changes: Seq[(Long, Timestamp, Long, String, Long)]) =
    CdcMerge.merge(snapshot, col("k"), col("sv"),
        changes.toDF("k", "ts", "eid", "op", "vm"),
        col("k"), col("ts"), col("eid"), col("op"), col("vm"))
      .orderBy("k")
      .as[(Long, String, Long, Option[Long])].collect().toSeq

  test("merge: upsert wins, delete drops, untouched passes through") {
    val out = run(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "U", 111L),   // update key 1
      (2L, ts("2024-01-01 00:00:00"), 2L, "D", 0L),     // delete key 2
      (9L, ts("2024-01-01 00:00:00"), 3L, "I", 999L)))  // insert new key
    assert(out == Seq(
      (1L, "changelog", 111L, Some(ts("2024-01-01 00:00:00").getTime * 1000)),
      (3L, "snapshot", 300L, None),
      (9L, "changelog", 999L, Some(ts("2024-01-01 00:00:00").getTime * 1000))))
  }

  test("merge: only the LATEST change per key applies, (ts, eid) order") {
    val out = run(Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "U", 111L),
      (1L, ts("2024-01-01 00:00:02"), 2L, "D", 0L),     // latest: delete
      (2L, ts("2024-01-01 00:00:01"), 3L, "D", 0L),
      (2L, ts("2024-01-01 00:00:02"), 4L, "U", 222L)))  // resurrected
    assert(out == Seq(
      (2L, "changelog", 222L, Some(ts("2024-01-01 00:00:02").getTime * 1000)),
      (3L, "snapshot", 300L, None)))
  }

  test("merge: same-µs ties break on event_id") {
    val t = ts("2024-01-01 00:00:00")
    val out = run(Seq(
      (1L, t, 5L, "U", 555L),   // higher eid wins
      (1L, t, 4L, "D", 0L)))
    assert(out.head == ((1L, "changelog", 555L, Some(t.getTime * 1000))))
  }

  test("merge: delete of an absent key vanishes (replay-idempotent)") {
    val out = run(Seq((42L, ts("2024-01-01 00:00:00"), 1L, "D", 0L)))
    assert(out == Seq(
      (1L, "snapshot", 100L, None),
      (2L, "snapshot", 200L, None),
      (3L, "snapshot", 300L, None)))
  }

  test("merge: changelog reduces via one max(struct) agg, no Window node") {
    val changes = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "U", 1L))
      .toDF("k", "ts", "eid", "op", "vm")
    val plan = CdcMerge.merge(snapshot, col("k"), col("sv"), changes,
        col("k"), col("ts"), col("eid"), col("op"), col("vm"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no Window node in:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"expected partial-aggregated max in:\n$plan")
  }
}
