package graft

import graft.graph.LabelPropagation

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  test("communities: two cliques joined by a bridge split cleanly") {
    // clique {1,2,3}, clique {10,11,12}, bridge 3–10
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (3L, 10L)
    ).toDF("src", "dst")
    val out = LabelPropagation.communities(edges, rounds = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (n, l, s) => n -> ((l, s)) }.toMap
    // both cliques collapse to their min member's label; the bridge
    // endpoints stay with their own clique (2 clique votes vs 1 bridge)
    assert(Set(1L, 2L, 3L).map(out(_)._1).size == 1)
    assert(Set(10L, 11L, 12L).map(out(_)._1).size == 1)
    assert(out(1L)._1 != out(10L)._1, "cliques must separate")
    assert(out(1L)._2 == 3L && out(10L)._2 == 3L)
  }

  test("communities: synchronous update, min-label ties, self-loops drop") {
    // path 1–2–3 plus a self-loop on 2 and a duplicated edge: after one
    // round, node 2 sees {1, 3} (tie) → min label 1; nodes 1 and 3 see
    // only 2 → label 2. Self-loop and the parallel 1–2 edge change nothing.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = LabelPropagation.communities(edges, rounds = 1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }
}
