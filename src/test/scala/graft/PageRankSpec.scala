package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("ranks: hand-computed integer fixpoint on a 3-node cycle + dangler") {
    // a -> b, a -> d, b -> a (d dangling). Micro-unit arithmetic by hand:
    // iter 1: contrib(a)=1000000/2=500000 to b and d; contrib(b)=1000000 to a
    //   a = 150000 + 850*1000000/1000  = 1000000
    //   b = 150000 + 850*500000/1000   = 575000
    //   d = 575000; (d leaks its mass — the documented simplification)
    // iter 2: a: 150000 + 850*575000/1000 = 638750
    //   b = d = 150000 + 850*(1000000/2)/1000 = 575000
    val edges = Seq(("a", "b"), ("a", "d"), ("b", "a")).toDF("src", "dst")
    val out = PageRank.ranks(edges, iterations = 2)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 638750L), ("b", 575000L), ("d", 575000L)))
  }

  test("ranks: duplicate edges and self-loops are dropped before degrees") {
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "a"), ("b", "a"))
      .toDF("src", "dst")
    // after normalization: a->b, b->a — symmetric 2-cycle, every iteration
    // keeps both at exactly 1000000
    val out = PageRank.ranks(edges, iterations = 3)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 1000000L), ("b", 1000000L)))
  }

  test("ranks: total mass is bounded by nodes x 1e6 (damping leak only)") {
    val out = SparkEntry.queries("g1_pagerank")(spark, "/root/testdata/sf0.001")
    val (total, n) = out.agg(sum("rank_micro"), count(lit(1)))
      .as[(Long, Long)].head()
    assert(total <= n * 1000000L,
      s"mass grew: $total over $n nodes — damping must only leak")
    assert(out.filter(col("rank_micro") < 150000L).isEmpty,
      "every node keeps at least the base 150000 micro-rank")
  }
}
