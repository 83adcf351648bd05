package graft

import graft.graph.Hits

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("hubsAndAuthorities: star graph — pure hubs and one authority") {
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = Hits.hubsAndAuthorities(edges, rounds = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> ((0L, 1000000L)),        // pure hub
      2L -> ((0L, 1000000L)),        // pure hub
      3L -> ((1000000L, 0L))))       // pure authority
  }

  test("hubsAndAuthorities: chain 1→2→3 plus 1→3 ranks roles, exact round") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = Hits.hubsAndAuthorities(edges, rounds = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // round 1 by hand: a = (0, 1e6, 2e6) → rescaled (0, 500000, 1e6);
    // h = (a2+a3, a3, 0) = (1.5e6, 1e6, 0) → rescaled (1e6, 666666, 0)
    assert(out == Map(
      1L -> ((0L, 1000000L)),
      2L -> ((500000L, 666666L)),
      3L -> ((1000000L, 0L))))
  }

  test("hubsAndAuthorities: self-loops and duplicate edges are ignored") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 2L)).toDF("src", "dst")
    val out = Hits.hubsAndAuthorities(edges, rounds = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((0L, 1000000L)), 2L -> ((1000000L, 0L))))
  }
}
