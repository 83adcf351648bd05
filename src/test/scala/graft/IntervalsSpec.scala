package graft

import org.apache.spark.sql.functions._
import graft.ops.Intervals

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def cov(rows: Seq[(String, Long, Long)]) =
    Intervals.unionCoverage(
        rows.toDF("key_in", "st", "en"), col("key_in"), col("st"), col("en"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  private val M = 1000000L

  test("overlapping intervals merge; disjoint ones don't") {
    val out = cov(Seq(
      ("a", 0L, 10 * M), ("a", 5 * M, 20 * M),   // one island [0,20)
      ("a", 30 * M, 40 * M),                     // second island
      ("b", 0L, 10 * M)))
    // (n_intervals, n_islands, covered_s, span_s, idle_s)
    assert(out("a") == ((3L, 2L, 30L, 40L, 10L)))
    assert(out("b") == ((1L, 1L, 10L, 10L, 0L)))
  }

  test("touching intervals (end == next start) stay separate islands") {
    // end is exclusive, and a new island opens when st > prev max end
    // is FALSE only for st <= prevEnd — touching [0,10),[10,20) has
    // st == prevEnd, so they merge (contiguous coverage, no gap).
    val out = cov(Seq(("a", 0L, 10 * M), ("a", 10 * M, 20 * M)))
    assert(out("a") == ((2L, 1L, 20L, 20L, 0L)))
  }

  test("containment and equal-start ties are order-invariant") {
    val out = cov(Seq(
      ("a", 0L, 100 * M), ("a", 10 * M, 20 * M),   // contained
      ("a", 0L, 5 * M)))                           // equal-start tie
    assert(out("a") == ((3L, 1L, 100L, 100L, 0L)))
  }

  test("zero/negative-length intervals are dropped") {
    val out = cov(Seq(("a", 5 * M, 5 * M), ("a", 9 * M, 2 * M),
      ("a", 0L, 1 * M)))
    assert(out("a") == ((1L, 1L, 1L, 1L, 0L)))
  }
}
