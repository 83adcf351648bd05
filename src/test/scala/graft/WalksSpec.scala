package graft

import org.apache.spark.sql.functions._
import graft.graph.Walks
import graft.sim.Ivf.{PickA, PickB, PickP}

class WalksSpec extends SparkSpec {
  import spark.implicits._

  test("randomWalks: affine picks replayed against a Scala reference") {
    // ring with chords: every node has out-degree 2
    val n = 6L
    val edges = (0L until n).flatMap(v => Seq((v, (v + 1) % n), (v, (v + 2) % n)))
      .toDF("src", "dst")
    val out = Walks.randomWalks(edges, length = 3)
      .as[(Long, Long, Long)].collect().toSet

    def step(w: Long, t: Long, node: Long): Long = {
      val nbrs = Seq((node + 1) % n, (node + 2) % n).sorted
      nbrs((((w * PickA + t * PickB) % PickP) % nbrs.size).toInt)
    }
    val expected = (0L until n).flatMap { w =>
      var node = w
      (w, 0L, w) +: (1L to 3L).map { t =>
        node = step(w, t, node); (w, t, node)
      }
    }.toSet
    assert(out == expected)
  }

  test("randomWalks: dead ends terminate the walk honestly") {
    // 1 -> 2 -> 3, node 3 has no out-edges
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Walks.randomWalks(edges, length = 4)
      .as[(Long, Long, Long)].collect().toSet
    // walks start only from nodes WITH out-edges (1 and 2)
    assert(out == Set(
      (1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 3L),
      (2L, 0L, 2L), (2L, 1L, 3L)))
  }

  test("skipgramPairs: within-walk window pairs, ordered, counted") {
    // two hand-written walks: 10-11-12 and 10-11 (walk ids 1, 2)
    val walks = Seq(
      (1L, 0L, 10L), (1L, 1L, 11L), (1L, 2L, 12L),
      (2L, 0L, 10L), (2L, 1L, 11L)
    ).toDF("walk_id", "step", "node")
    val out = Walks.skipgramPairs(walks, window = 1, k = 100)
      .as[(Long, Long, Long)].collect().toSet
    // adjacent pairs only, both directions; (10,11) occurs in both walks
    assert(out == Set((10L, 11L, 2L), (11L, 10L, 2L),
      (11L, 12L, 1L), (12L, 11L, 1L)))
  }

  test("skipgramPairs: window 2 reaches across one hop; k trims the tail") {
    val walks = Seq((1L, 0L, 5L), (1L, 1L, 6L), (1L, 2L, 7L))
      .toDF("walk_id", "step", "node")
    val all = Walks.skipgramPairs(walks, window = 2, k = 100)
      .as[(Long, Long, Long)].collect().toSet
    assert(all.contains((5L, 7L, 1L)) && all.size == 6)
    // top-1 under (n desc, center, context): all counts 1 → smallest pair
    val top = Walks.skipgramPairs(walks, window = 2, k = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(top == Seq((5L, 6L, 1L)))
  }
}
