package graft

import graft.graph.Bfs

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], hops: Int) =
    Bfs.hops(spark, edges.toDF("src", "dst"), seeds, hops)
      .as[(Long, Long)].collect().toMap

  test("path graph: hop = distance, cut off at maxHops") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(path, Seq(0L), 3) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("edges are undirected and multi-seed takes the min hop") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    // seed 4 reaches 2 in 2 hops before seed 0's 2-hop does too; both
    // settle at their true min distance
    assert(run(path, Seq(0L, 4L), 4) ==
      Map(0L -> 0L, 4L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L))
  }

  test("disconnected component never appears; self-loops ignored") {
    val g = Seq((0L, 1L), (1L, 1L), (7L, 8L))
    assert(run(g, Seq(0L), 5) == Map(0L -> 0L, 1L -> 1L))
  }

  test("cycle: each node settled once at min distance") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(run(cyc, Seq(0L), 4) ==
      Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L))
  }
}
