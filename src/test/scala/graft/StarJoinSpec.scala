package graft

import org.apache.spark.sql.functions._
import graft.ops.StarJoin

class StarJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("revenueByRegion: integer revenue equals the per-item product sum") {
    val out = StarJoin.revenueByRegion(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf),
      Tables.region(spark, sf))
    val rows = out.as[(String, String, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    // every (region, nation) pair is consistent with the nation table
    val natReg = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name").as[(String, String)].collect().toSet
    rows.foreach { case (r, n, _, _, _) => assert(natReg.contains((r, n))) }
    // revenue per item is bounded by cents·100 — no negative, no overflow
    rows.foreach { case (_, _, _, items, rev) =>
      assert(items > 0 && rev >= 0)
    }
  }

  test("promoShareByMonth: ppm share from the conditional sum, part broadcasts") {
    val out = StarJoin.promoShareByMonth(Tables.lineitem(spark, sf),
      Tables.part(spark, sf))
    val rows = out.as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (m, items, rev, promo, ppm) =>
      assert(m.matches("\\d{4}-\\d{2}"))
      assert(promo >= 0 && promo <= rev && items > 0)
      assert(ppm == (BigInt(promo) * 1000000 / BigInt(rev)).toLong)
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"part dimension must broadcast in:\n$plan")
  }

  test("revenueByRegion: one shuffle join, every dimension broadcasts") {
    val plan = StarJoin.revenueByRegion(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf),
      Tables.region(spark, sf)).queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    val smj = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).length
    // at testdata scale even orders broadcasts (5 BHJ, 0 shuffle); the
    // invariant that must hold at ANY scale: 5 joins total, at most ONE
    // is a shuffle join (lineitem⋈orders), and it is never a cartesian
    assert(bhj + smj == 5, s"expected 5 joins, got $bhj BHJ + $smj shuffle in:\n$plan")
    assert(smj <= 1, s"more than one shuffle join in:\n$plan")
    assert(bhj >= 4, s"dimensions must broadcast, got $bhj BHJ in:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"expected map-side partial aggregation in:\n$plan")
  }

  test("bigSpenders: HAVING before the joins, exact integer emission") {
    import java.sql.Timestamp
    val li = Seq(
      (1L, 200.0, 10.0), (1L, 60.0, 20.0), // order 1: 260 > 250 ✓
      (2L, 250.0, 5.0), // order 2: exactly 250 — strict > excludes
      (3L, 300.0, 7.5) // order 3: 300 ✓
    ).toDF("l_orderkey", "l_quantity", "l_extendedprice")
    val ords = Seq(
      (1L, 10L, Timestamp.valueOf("2024-03-01 00:00:00"), 123.45),
      (2L, 10L, Timestamp.valueOf("2024-03-02 00:00:00"), 67.89),
      (3L, 20L, Timestamp.valueOf("2024-03-03 00:00:00"), 10.01)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((10L, "alice"), (20L, "bob"), (30L, "carol"))
      .toDF("c_custkey", "c_name")
    val out = StarJoin.bigSpenders(li, ords, cust, minQty = 250L)
      .orderBy("o_orderkey")
      .select("c_custkey", "c_name", "o_orderkey", "total_price_cents",
        "sum_qty", "n_lines")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (10L, "alice", 1L, 12345L, 260L, 2L),
      (20L, "bob", 3L, 1001L, 300L, 1L)))
  }
}
