package graft

import graft.graph.LinkPredict

class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int = 10,
                  cap: Long = 10000L) =
    LinkPredict.commonNeighbors(edges.toDF("src", "dst"), k, cap)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("scores non-adjacent pairs only; jaccard over union of hoods") {
    // square 0-1-2-3-0: diagonals (0,2) and (1,3) share 2 neighbors
    val out = run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    // every node has degree 2: jaccard = 2/(2+2-2) = 1e6
    assert(out == Map((0L, 2L) -> ((2L, 1000000L)),
      (1L, 3L) -> ((2L, 1000000L))))
  }

  test("existing edges never appear even with common neighbors") {
    // triangle + pendant: (0,1),(1,2),(0,2) adjacent; only (0,3)? no —
    // 3 hangs off 2, so candidates are (0,3),(1,3) via center 2
    val out = run(Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)))
    assert(out.keySet == Set((0L, 3L), (1L, 3L)))
    // deg(0)=2, deg(3)=1, cn=1: jaccard = 1e6/2
    assert(out((0L, 3L)) == ((1L, 500000L)))
  }

  test("maxCenterDegree excludes hub wedges but keeps exact degrees") {
    // star center 9 with leaves 1..4 plus edge (1,2): capping out the
    // hub removes all star wedges; center 1/2 wedges remain
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (1L, 2L))
    val capped = run(star, cap = 3L)
    // centers 1 and 2 have degree 2 (hub + each other): wedges (9,2)
    // via 1 and (9,1) via 2 are existing edges -> dropped; nothing else
    assert(capped.isEmpty)
    val uncapped = run(star)
    // with the hub allowed, leaf pairs (1,3),(1,4),(2,3),(2,4),(3,4) appear
    assert(uncapped.keySet == Set((1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
  }

  test("top-k cuts on the (score desc, u, v) total order") {
    // path 0-1-2-3-4: pairs (0,2),(1,3),(2,4) each share exactly 1
    val out = run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)), k = 2)
    assert(out.keySet == Set((0L, 2L), (1L, 3L)))
  }
}
