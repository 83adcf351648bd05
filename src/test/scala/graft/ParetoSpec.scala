package graft

import org.apache.spark.sql.functions._
import graft.ops.Pareto

class ParetoSpec extends SparkSpec {
  import spark.implicits._

  private def front(rows: Seq[(Long, Long, Long)]) =
    Pareto.frontier2d(rows.toDF("id", "c", "g"), col("id"), col("c"),
        col("g"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._2, r._3) -> ((r._1, r._4))).toMap

  test("dominated points drop, frontier is the staircase") {
    val out = front(Seq(
      (1L, 10L, 100L),   // frontier (cheapest)
      (2L, 20L, 150L),   // frontier (more gain, pricier)
      (3L, 30L, 120L),   // dominated by 2 (pricier, less gain)
      (4L, 40L, 150L),   // dominated by 2 (same gain, pricier)
      (5L, 50L, 200L)))  // frontier
    assert(out.keySet == Set((10L, 100L), (20L, 150L), (50L, 200L)))
  }

  test("equal-cost ties: only the max gain at that cost survives") {
    val out = front(Seq((1L, 10L, 50L), (2L, 10L, 80L), (3L, 10L, 80L)))
    // the two (10, 80) rows tie on both axes: one output row, n_tied 2
    assert(out == Map((10L, 80L) -> ((2L, 2L))))
  }

  test("matching the quadratic NOT-EXISTS definition") {
    val pts = Seq((1L, 3L, 7L), (2L, 5L, 7L), (3L, 1L, 2L), (4L, 3L, 9L),
      (5L, 8L, 11L), (6L, 8L, 11L), (7L, 2L, 2L), (8L, 6L, 10L))
    val naive = pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g) }
    }.map { case (_, c, g) => (c, g) }.toSet
    assert(front(pts).keySet == naive)
  }
}
