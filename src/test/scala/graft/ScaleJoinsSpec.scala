package graft

import org.apache.spark.sql.functions._
import graft.ops.ScaleJoins
import graft.io.Sinks

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result") {
    val probe = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v") // 3 hot keys
    val build = Seq((0, "a"), (1, "b"), (2, "c"), (9, "z")).toDF("k", "name")
    val salted = ScaleJoins.saltedEquiJoin(probe, build, "k", col("v"), salt = 8)
      .select("k", "v", "name")
    val plain = probe.join(build, Seq("k")).select("k", "v", "name")
    assert(salted.count() == 1000)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join spreads a hot key across salt buckets") {
    val probe = (1 to 1000).map(i => (0, i)).toDF("k", "v") // ONE hot key
    val build = Seq((0, "a")).toDF("k", "name")
    val p = probe.withColumn("__salt", pmod(hash(col("v")), lit(8)))
    val buckets = p.groupBy("__salt").count().collect()
    assert(buckets.length == 8, "hot key should scatter across all 8 salts")
    assert(buckets.map(_.getLong(1)).max < 1000, "no bucket holds the whole key")
  }

  test("bucketedSelfPairs: result-identical to the naive bucket self-join, any salt") {
    val rows = (1 to 200).map(i => (i % 5, i.toLong, s"p$i")).toDF("b", "id", "pay")
    val naive = rows.as("x").join(rows.as("y"),
        col("x.b") === col("y.b") && col("x.id") < col("y.id"))
      .select(col("x.b").as("b"), col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.pay").as("pay_a"), col("y.pay").as("pay_b"))
      .as[(Int, Long, Long, String, String)].collect().toSet
    for (salt <- Seq(1, 3, 8)) {
      val salted = ScaleJoins.bucketedSelfPairs(rows, Seq("b"), "id",
          Seq("pay"), salt)
        .as[(Int, Long, Long, String, String)].collect().toSet
      assert(salted == naive, s"salt=$salt diverged from the naive pair set")
    }
    // normalization: every emitted pair is id_a < id_b
    val pairs = ScaleJoins.bucketedSelfPairs(rows, Seq("b"), "id", Nil, 4)
    assert(pairs.filter(col("id_a") >= col("id_b")).count() == 0)
  }

  test("rangeJoinBinned: identical to the naive non-equi join for any bin width") {
    val points = (0L to 500L).map(p => (p, p * 7 % 400)).toDF("pid", "p")
    val intervals = (0L to 30L).map { i =>
      val lo = i * 13 % 350; (i, lo, lo + 1 + i % 40)
    }.toDF("iid", "lo", "hi")
    val naive = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty, "fixture must produce matches")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val binned = ScaleJoins.rangeJoinBinned(points, col("p"), intervals,
          col("lo"), col("hi"), w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(binned == naive, s"binWidth=$w diverged from the naive join")
    }
  }

  test("intervalJoinBinned: identical to the naive overlap join, no dup pairs") {
    val left = (0L to 60L).map { i =>
      val lo = i * 31 % 400; (i, lo, lo + 1 + i % 55)
    }.toDF("lid", "a_lo", "a_hi")
    val right = (0L to 40L).map { i =>
      val lo = i * 17 % 380; (i, lo, lo + 1 + i % 30)
    }.toDF("rid", "b_lo", "b_hi")
    val naive = left.join(right,
        greatest(col("a_lo"), col("b_lo")) < least(col("a_hi"), col("b_hi")))
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(naive.nonEmpty && naive.length == naive.toSet.size)
    for (w <- Seq(1L, 8L, 64L, 1000L)) {
      val binned = ScaleJoins.intervalJoinBinned(left, col("a_lo"),
          col("a_hi"), right, col("b_lo"), col("b_hi"), w)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(binned.length == binned.toSet.size,
        s"binWidth=$w emitted duplicate pairs — first-bin ownership broken")
      assert(binned.toSet == naive.toSet,
        s"binWidth=$w diverged from the naive overlap join")
    }
  }

  test("intervalJoinBinned: touching half-open intervals do not overlap") {
    val left = Seq((1L, 0L, 10L)).toDF("lid", "a_lo", "a_hi")
    val right = Seq((1L, 10L, 20L), (2L, 9L, 20L)).toDF("rid", "b_lo", "b_hi")
    val out = ScaleJoins.intervalJoinBinned(left, col("a_lo"), col("a_hi"),
        right, col("b_lo"), col("b_hi"), 5L)
      .select("rid").as[Long].collect().toSeq
    assert(out == Seq(2L), "[0,10) must meet [9,20) but not [10,20)")
  }

  test("rangeJoinBinned: exact past 2^53 (epoch-ns magnitudes)") {
    // points one ulp(double) apart around 2^60: a double-divide bin would
    // collapse or shift bins and drop matches; the decimal floorDiv must not
    val base = 1L << 60 // ~1.15e18, double ulp here is 256
    val points = Seq((1L, base + 999L), (2L, base + 1000L), (3L, base + 1001L))
      .toDF("pid", "p")
    val intervals = Seq((10L, base + 1000L, base + 1002L)).toDF("iid", "lo", "hi")
    for (w <- Seq(1L, 3L, 1000L, 1L << 40)) {
      val got = ScaleJoins.rangeJoinBinned(points, col("p"), intervals,
          col("lo"), col("hi"), w)
        .select("pid").as[Long].collect().toSeq.sorted
      assert(got == Seq(2L, 3L), s"binWidth=$w wrong matches past 2^53: $got")
    }
    // interval×interval at the same magnitude: exact-boundary overlap only
    val l = Seq((1L, base + 1000L, base + 1004L)).toDF("lid", "a_lo", "a_hi")
    val r = Seq((1L, base + 1003L, base + 1010L), (2L, base + 1004L, base + 1010L))
      .toDF("rid", "b_lo", "b_hi")
    val out = ScaleJoins.intervalJoinBinned(l, col("a_lo"), col("a_hi"),
        r, col("b_lo"), col("b_hi"), 7L)
      .select("rid").as[Long].collect().toSeq
    assert(out == Seq(1L), "half-open boundary at 2^60 must stay exact")
  }

  test("rangeJoinBinned plans an equi shuffle join, not a nested loop") {
    val points = (0L to 500L).map(p => (p, p)).toDF("pid", "p")
    val intervals = (0L to 30L).map(i => (i, i * 15, i * 15 + 20))
      .toDF("iid", "lo", "hi")
    val plan = ScaleJoins.rangeJoinBinned(points, col("p"),
      intervals, col("lo"), col("hi"), 16L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"binned range join must be an equi join:\n$plan")
  }

  test("keySkewAudit: hand-computed counts, shares, and skew ratio") {
    // keys: a×6, b×3, c×1 → total 10, distinct 3, mean 10/3, max 6
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val out = ScaleJoins.keySkewAudit(df, col("k"), topK = 2)
      .orderBy("rank")
      .select("key", "cnt", "rank", "share_ppm", "distinct_keys",
        "total_rows", "skew_ratio_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    // topK=2 truncates c; shares are floor(cnt*1e6/10)
    assert(out == List(
      ("a", 6L, 1L, 600000L, 3L, 10L, 1800000L),
      ("b", 3L, 2L, 300000L, 3L, 10L, 1800000L)))
    // uniform keys → skew ratio exactly 1e6 (max == mean)
    val uniform = (0 until 8).map(i => (i.toLong, s"k${i % 4}")).toDF("id", "k")
    val u = ScaleJoins.keySkewAudit(uniform, col("k"), topK = 4)
      .select("skew_ratio_ppm").distinct().as[Long].collect().toList
    assert(u == List(1000000L))
    // tie at the boundary breaks by key order: both b-count keys tie at 3
    val tied = (Seq.fill(3)("x") ++ Seq.fill(3)("y") ++ Seq.fill(1)("z"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val t = ScaleJoins.keySkewAudit(tied, col("k"), topK = 1)
      .select("key").as[String].collect().toList
    assert(t == List("x"))
  }

  test("same-bucketed tables join with zero exchanges") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val l = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Sinks.writeBucketed(o, "orders_b", "o_orderkey", 4)
    Sinks.writeBucketed(l, "lineitem_b", "o_orderkey", 4)

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
