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
}
