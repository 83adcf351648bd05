package graft

import org.apache.spark.sql.functions._
import graft.ops.Associations

class AssociationsSpec extends SparkSpec {
  import spark.implicits._

  // baskets: c1{1,2,3} c2{1,2} c3{1,2,4} c4{3,4} — item counts 1→3, 2→3,
  // 3→2, 4→2; N = 4; pair (1,2) co-occurs 3×, everything else once
  private val baskets = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L), (2L, 2L), (2L, 2L), // dup row: distinct() must collapse it
    (3L, 1L), (3L, 2L), (3L, 4L),
    (4L, 3L), (4L, 4L)
  ).toDF("cust", "part")

  test("copurchasePairs: hand-computed co-counts, lift, and support floor") {
    val out = Associations.copurchasePairs(baskets, col("cust"), col("part"),
        minSupport = 2, topK = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // lift(1,2) = 3·4·10⁶ DIV (3·3) = 1333333
    assert(out == Seq((1L, 2L, 3L, 3L, 3L, 1333333L)))
  }

  test("copurchasePairs: deterministic (co DESC, pair) order at minSupport 1") {
    val out = Associations.copurchasePairs(baskets, col("cust"), col("part"),
        minSupport = 1, topK = 10)
      .select("item_a", "item_b", "co_count")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)))
  }

  test("itemNeighbors: per-item top-k, cosine + integer tie-breaks") {
    val out = Associations.itemNeighbors(baskets, col("cust"), col("part"),
        minSupport = 1, k = 2)
      .as[(Long, Long, Long, Long, Long, Double, Long)].collect().toSet
    // cos(1,2)=3/√9=1.0, cos(3,4)=1/√4=0.5, the rest 1/√6→0.408248;
    // rank-2 ties break on neighbor id ascending
    assert(out == Set(
      (1L, 2L, 3L, 3L, 3L, 1.0, 1L), (1L, 3L, 1L, 3L, 2L, 0.408248, 2L),
      (2L, 1L, 3L, 3L, 3L, 1.0, 1L), (2L, 3L, 1L, 3L, 2L, 0.408248, 2L),
      (3L, 4L, 1L, 2L, 2L, 0.5, 1L), (3L, 1L, 1L, 2L, 3L, 0.408248, 2L),
      (4L, 3L, 1L, 2L, 2L, 0.5, 1L), (4L, 1L, 1L, 2L, 3L, 0.408248, 2L)))
  }

  test("itemNeighbors: support floor prunes before ranking") {
    val out = Associations.itemNeighbors(baskets, col("cust"), col("part"),
        minSupport = 2, k = 5)
      .select("item", "neighbor", "rank")
      .as[(Long, Long, Long)].collect().toSet
    // only (1,2) survives co >= 2 — each direction ranks first
    assert(out == Set((1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("copurchasePairs: result is salt-invariant (bucketedSelfPairs contract)") {
    val base = Associations.copurchasePairs(baskets, col("cust"), col("part"),
      minSupport = 1, topK = 10, salt = 1).collect().toSeq
    for (s <- Seq(2, 4, 16)) {
      val out = Associations.copurchasePairs(baskets, col("cust"),
        col("part"), minSupport = 1, topK = 10, salt = s).collect().toSeq
      assert(out == base, s"salt=$s changed the result")
    }
  }
}
