package graft

import graft.graph.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("decompose: peels a pendant tail, keeps the clique at its degree") {
    // 5-clique {0..4} plus pendant 9 hanging off node 0
    val clique = for (i <- 0 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val edges = (clique :+ ((0L, 9L))).toDF("src", "dst")
    val out = KCore.decompose(edges, k = 2, maxRounds = 4)
      .as[(Long, Long)].collect().toMap
    // 9 peels (degree 1); node 0 drops back to in-clique degree 4
    assert(out == Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L))
    assert(KCore.decompose(edges, k = 5, maxRounds = 4).count() == 0)
  }

  test("decompose: cascade over multiple rounds empties a path graph") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    // k=2: endpoints peel round 1, the middle pair becomes degree-1 and
    // peels round 2 — a single degree filter would wrongly keep 2 and 3
    assert(KCore.decompose(path, k = 2, maxRounds = 4).count() == 0)
    // k=1 is the whole (self-loop-free) graph
    val all = KCore.decompose(path, k = 1, maxRounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(all == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("decompose: duplicate and reversed input edges collapse first") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L))
      .toDF("src", "dst")
    val out = KCore.decompose(edges, k = 1, maxRounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}
