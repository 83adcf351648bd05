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

  test("ranks: dangling redistribution, hand-computed integer fixpoint") {
    // a -> b, a -> d, b -> a (d dangling), redistributeDangling = true.
    // iter 1: share = 1000000 DIV 3 = 333333
    //   a = 150000 + 850*(1000000+333333) DIV 1000 = 1283333
    //   b = 150000 + 850*(500000+333333)  DIV 1000 =  858333 ; d same
    // iter 2: dangling mass = d = 858333, share = 286111
    //   a = 150000 + 850*(858333+286111) DIV 1000 = 1122777
    //   b = 150000 + 850*(641666+286111) DIV 1000 =  938610 ; d same
    val edges = Seq(("a", "b"), ("a", "d"), ("b", "a")).toDF("src", "dst")
    val out = PageRank.ranks(edges, iterations = 2,
        redistributeDangling = true)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 1122777L), ("b", 938610L), ("d", 938610L)))
  }

  test("ranks: redistribution conserves mass to floor losses EXACTLY " +
    "(two-sided bound) and strictly beats the leaky variant") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("g16_pagerank_dangling")(spark, sf)
    val (total, n) = out.agg(sum("rank_micro"), count(lit(1)))
      .as[(Long, Long)].head()
    // the same edge set, leak variant, for the strict comparison + E
    val d = Tables.documents(spark, sf)
    val edges = d.select((col("doc_id") % 23).as("src"),
        ((col("doc_id") * 7 + 3) % 31).as("dst"))
      .unionAll(d.select((col("doc_id") % 23).as("src"),
        ((col("doc_id") * 11 + 5) % 31).as("dst")))
    val e = edges.filter(col("src") =!= col("dst")).distinct().count()
    val leaky = PageRank.ranks(edges, iterations = 5)
      .agg(sum("rank_micro")).as[Long].head()
    // real-valued redistribution conserves N·1e6 exactly; the integer form
    // only loses floor remainders — per round < E (contrib floors)
    // + N (share floor) + N (damping DIV 1000), damped below 1 so 5
    // rounds bound the loss at 5·(E + 2N) micro
    assert(total <= n * 1000000L, s"mass grew: $total over $n nodes")
    assert(total >= n * 1000000L - 5L * (e + 2L * n),
      s"lost more than floor remainders: $total vs ${n * 1000000L} " +
        s"(n=$n, e=$e)")
    assert(total > leaky,
      s"redistribution must strictly beat the leak: $total vs $leaky")
  }

  test("personalized: restart mass lands only on seeds") {
    // 2-cycle a<->b with seed a (ids as longs: 1, 2)
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = PageRank.personalized(edges, Seq(1L), iterations = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // r0: a=1e6, b=0. iter1: a gets base 150000 + 850*contrib(b=0)/1000;
    // b gets 0 + 850*1e6/1000 = 850000
    assert(out == Seq((1L, 150000L), (2L, 850000L)))
  }

  test("personalized: unreachable nodes hold rank 0 forever") {
    val edges = Seq((1L, 2L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val out = PageRank.personalized(edges, Seq(1L), iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(out(3L) == 0L && out(4L) == 0L)
    assert(out(1L) > 0L && out(2L) > 0L)
  }

  test("personalized: total mass bounded by seeds + damping flow") {
    val out = SparkEntry.queries("g9_ppr")(spark, "/root/testdata/sf0.001")
    val total = out.agg(sum("rank_micro")).as[Long].head()
    // restart mass 3 seeds x 1e6 scaled by the geometric damping series:
    // sum <= |seeds| * 1e6 / (1 - 0.85) ~ 2e7; integer floors only shrink it
    assert(total > 0L && total <= 3L * 1000000L * 1000L / 150L,
      s"mass out of bounds: $total")
  }
}
