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

  test("topUnshipped: cutoff splits orders/ships, segment gates, top-k order") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      // order 1: one item ships after cutoff (counts), one before (not)
      (1L, ts("2024-07-01"), 100.0, 0.10),
      (1L, ts("2024-05-01"), 999.0, 0.00),
      // order 2: ships after cutoff but order placed after cutoff — out
      (2L, ts("2024-07-02"), 50.0, 0.00),
      // order 3: wrong segment customer — out
      (3L, ts("2024-07-03"), 70.0, 0.00),
      // order 4: bigger revenue than order 1 — ranks first
      (4L, ts("2024-08-01"), 300.0, 0.50)
    ).toDF("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    val ords = Seq(
      (1L, 10L, ts("2024-01-01"), "1-URGENT"),
      (2L, 10L, ts("2024-06-20"), "2-HIGH"),
      (3L, 30L, ts("2024-02-01"), "3-MEDIUM"),
      (4L, 10L, ts("2024-03-01"), "4-NOT SPECIFIED")
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val cust = Seq((10L, "BUILDING"), (30L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val out = StarJoin.topUnshipped(li, ords, cust,
        segment = "BUILDING", cutoff = "2024-06-15", k = 10)
      .select("o_orderkey", "revenue_micro4")
      .as[(Long, Long)].collect().toSeq
    // order 4: 30000 cents · (100-50) = 1_500_000; order 1: 10000·90 = 900_000
    assert(out == Seq((4L, 1500000L), (1L, 900000L)))
  }

  test("returnLoss: only R items count, dims broadcast, TakeOrdered cut") {
    import java.sql.Timestamp
    val li = Seq(
      (1L, "R", 100.0, 0.10), (1L, "N", 500.0, 0.00),
      (2L, "R", 200.0, 0.00), (3L, "A", 50.0, 0.00)
    ).toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val ords = Seq((1L, 10L), (2L, 20L), (3L, 10L))
      .toDF("o_orderkey", "o_custkey")
    val cust = Seq((10L, "alice", 1L), (20L, "bob", 2L))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val nat = Seq((1L, "FRANCE"), (2L, "KENYA"))
      .toDF("n_nationkey", "n_name")
    val q = StarJoin.returnLoss(li, ords, cust, nat, k = 5)
    val out = q.select("c_custkey", "c_name", "nation", "n_items",
        "loss_micro4")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    // bob: 20000·100 = 2_000_000; alice: 10000·90 = 900_000
    assert(out == Seq(
      (20L, "bob", "KENYA", 1L, 2000000L),
      (10L, "alice", "FRANCE", 1L, 900000L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("latePriorityCount: semi join never multiplies, window gates") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val ords = Seq(
      (1L, ts("2024-02-01"), "1-URGENT"),   // two late lines — counts ONCE
      (2L, ts("2024-03-01"), "1-URGENT"),   // on-time only — out
      (3L, ts("2024-06-01"), "2-HIGH"),     // exactly 90 days — strict >, out
      (4L, ts("2023-12-31"), "2-HIGH")      // late but before window — out
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, ts("2024-06-01")), (1L, ts("2024-07-01")),
      (2L, ts("2024-03-15")),
      (3L, ts("2024-08-30")), // 2024-06-01 + 90d = 2024-08-30, not late
      (4L, ts("2024-06-01"))
    ).toDF("l_orderkey", "l_shipdate")
    val out = StarJoin.latePriorityCount(li, ords,
        from = "2024-01-01", until = "2025-01-01", lateDays = 90)
      .as[(String, Long)].collect().toMap
    assert(out == Map("1-URGENT" -> 1L))
  }

  test("idleRichCustomers: exact mean boundary excluded, anti join gates") {
    import java.sql.Timestamp
    // positive balances: 100, 500, 400, 600 → mean exactly 400.00
    val cust = Seq(
      (1L, 1, 100.0),  // below mean — out
      (2L, 1, 500.0),  // above mean, no recent order — in
      (3L, 2, 400.0),  // EXACTLY the mean — strict >, out
      (4L, 2, -50.0),  // negative — excluded from mean, below it anyway
      (5L, 2, 600.0)   // above mean but recently active — out
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
    val ords = Seq(
      (10L, 5L, Timestamp.valueOf("2024-06-01 00:00:00")),
      (11L, 2L, Timestamp.valueOf("2023-01-01 00:00:00")) // too old
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = StarJoin.idleRichCustomers(cust, ords, since = "2024-01-01")
      .as[(Int, Long, Long)].collect().toSet
    assert(out == Set((1, 1L, 50000L)))
  }

  test("supplierBreadth: distinct suppliers, brand excluded, total order") {
    val li = Seq(
      (1L, 100L), (1L, 100L), (1L, 101L), // part 1: suppliers {100, 101}
      (2L, 100L),                          // part 2: {100}
      (3L, 102L)                           // part 3: excluded brand
    ).toDF("l_partkey", "l_suppkey")
    val part = Seq(
      (1L, "Brand#2", "typeA", 5),
      (2L, "Brand#3", "typeA", 5),
      (3L, "Brand#1", "typeB", 9)
    ).toDF("p_partkey", "p_brand", "p_type", "p_size")
    val q = StarJoin.supplierBreadth(li, part, excludeBrand = "Brand#1",
      k = 10)
    val out = q.as[(String, String, Int, Long)].collect().toSeq
    assert(out == Seq(
      ("Brand#2", "typeA", 5, 2L),
      ("Brand#3", "typeA", 5, 1L)))
    // NOTE: no TakeOrdered assert here — on LocalRelation inputs the
    // optimizer KNOWS maxRows ≤ k and EliminateLimits drops the limit
    // node entirely; the plan pin lives in PlanAuditSpec over parquet
    // tables, where maxRows is unknown and the TopK operator must form.
  }

  test("marketShare: region gates demand, shares partition per year") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, 100L, 300.0, 0.00),  // eu order, supplier nation X: 3_000_000
      (1L, 101L, 100.0, 0.00),  // eu order, supplier nation Y: 1_000_000
      (2L, 100L, 999.0, 0.00)   // non-eu customer's order — out entirely
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ords = Seq((1L, 10L, ts("2024-03-01")), (2L, 20L, ts("2024-03-02")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((10L, 1L), (20L, 2L)).toDF("c_custkey", "c_nationkey")
    val sup = Seq((100L, 3L), (101L, 4L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "GERMANY", 0L), (2L, "BRAZIL", 1L),
        (3L, "FRANCE", 0L), (4L, "CHINA", 2L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((0L, "EUROPE"), (1L, "AMERICA"), (2L, "ASIA"))
      .toDF("r_regionkey", "r_name")
    val out = StarJoin.marketShare(li, ords, cust, sup, nat, reg, "EUROPE")
      .select("order_year", "supplier_nation", "n_items", "revenue_micro4",
        "share_ppm")
      .as[(Int, String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (2024, "FRANCE", 1L, 3000000L, 750000L),
      (2024, "CHINA", 1L, 1000000L, 250000L)))
  }

  test("orderCountHistogram: the zero bucket survives the left join") {
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val ords = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .select("o_custkey")
    val out = StarJoin.orderCountHistogram(cust, ords)
      .orderBy("n_orders").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("topSupplier: window gates, exact revenue, ties both kept") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (100L, ts("2024-02-01"), 100.0, 0.00),
      (101L, ts("2024-02-02"), 50.0, 0.00),
      (101L, ts("2024-02-03"), 50.0, 0.00), // 101 ties 100 at 1_000_000
      (102L, ts("2023-01-01"), 999.0, 0.00) // outside window
    ).toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val sup = Seq((100L, "s100"), (101L, "s101"), (102L, "s102"))
      .toDF("s_suppkey", "s_name")
    val out = StarJoin.topSupplier(li, sup, "2024-01-01", "2025-01-01")
      .orderBy("s_suppkey")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((100L, "s100", 1000000L), (101L, "s101", 1000000L)))
  }

  test("smallOrderRevenue: exact 20%-of-average boundary excluded") {
    // part 1: quantities 1, 9, 10 → sum 20, count 3; threshold qty·15 < 20
    // → only qty 1 qualifies (1·15=15 < 20; 9·15=135 ≥ 20)
    val li = Seq(
      (1L, 1.0, 100.0), (1L, 9.0, 200.0), (1L, 10.0, 300.0),
      // part 2: single line — 5·5·1 < 5 is false (a lone line is never
      // below its own average)
      (2L, 5.0, 400.0)
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#11"), (2L, "Brand#22"))
      .toDF("p_partkey", "p_brand")
    val out = StarJoin.smallOrderRevenue(li, part)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("Brand#11", 1L, 10000L)))
  }

  test("bracketRevenue: each alternative gates on its own ranges") {
    val li = Seq(
      (1L, 5.0, 100.0, 0.00),   // Brand#12, size 3, qty 5 → alt1 hits
      (1L, 12.0, 100.0, 0.00),  // qty 12 outside alt1's 1-11 → out
      (2L, 15.0, 200.0, 0.50),  // Brand#23, size 8, qty 15 → alt2 hits
      (3L, 25.0, 300.0, 0.00),  // Brand#34, size 20 — outside union → out
      (4L, 25.0, 400.0, 0.00)   // Brand#55 never matches
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Seq(
      (1L, "Brand#12", 3), (2L, "Brand#23", 8),
      (3L, "Brand#34", 20), (4L, "Brand#55", 2)
    ).toDF("p_partkey", "p_brand", "p_size")
    val out = StarJoin.bracketRevenue(li, part)
      .as[(Long, Long)].collect().head
    // alt1: 10000·100 = 1_000_000; alt2: 20000·50 = 1_000_000
    assert(out == ((2L, 2000000L)))
  }

  test("volumeShipping: same-nation flows drop, both directions emit") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, 100L, 100.0, 0.00), // A-supplier → B-customer
      (2L, 101L, 200.0, 0.00), // B-supplier → A-customer
      (3L, 100L, 999.0, 0.00)  // A-supplier → A-customer: same nation, out
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ords = Seq((1L, 10L, ts("2024-01-01")), (2L, 11L, ts("2024-06-01")),
        (3L, 11L, ts("2024-07-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((10L, 2L), (11L, 1L)).toDF("c_custkey", "c_nationkey")
    val sup = Seq((100L, 1L), (101L, 2L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "A"), (2L, "B"), (3L, "C"))
      .toDF("n_nationkey", "n_name")
    val out = StarJoin.volumeShipping(li, ords, cust, sup, nat, "A", "B")
      .select("supp_nation", "cust_nation", "order_year", "n_items",
        "revenue_micro4")
      .as[(String, String, Int, Long, Long)].collect().toSet
    assert(out == Set(
      ("A", "B", 2024, 1L, 1000000L),
      ("B", "A", 2024, 1L, 2000000L)))
  }

  test("revenueYoy: signed ppm growth, first year null, halving = -500000") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, 100.0, 0.00), (2L, 200.0, 0.00), (3L, 100.0, 0.00)
    ).toDF("l_orderkey", "l_extendedprice", "l_discount")
    val ords = Seq(
      (1L, 10L, ts("2022-05-01")), (2L, 10L, ts("2023-05-01")),
      (3L, 10L, ts("2024-05-01"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((10L, 1L)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((1L, "A")).toDF("n_nationkey", "n_name")
    val out = StarJoin.revenueYoy(li, ords, cust, nat)
      .orderBy("order_year")
      .select("nation", "order_year", "revenue_micro4", "yoy_ppm")
      .as[(String, Int, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      ("A", 2022, 1000000L, None),          // no predecessor
      ("A", 2023, 2000000L, Some(1000000L)), // doubled: +100%
      ("A", 2024, 1000000L, Some(-500000L)))) // halved: -50%
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

  test("productProfit: losses stay negative, name token gates the family") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      // red part, profitable: rev 100.00·(100−0)=1000000, cost 10.00·100·2
      (1L, 1L, 100L, 100.0, 0.0, 2.0),
      // red part, LOSS: rev 5.00·(100−10)=45000, cost 10.00·100·40=4000000
      (1L, 1L, 100L, 5.0, 0.10, 40.0),
      // blue part — not in the family, out
      (2L, 2L, 100L, 999.0, 0.0, 1.0)
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
      "l_discount", "l_quantity")
    val part = Seq((1L, "small red widget", 10.0), (2L, "blue bolt", 1.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val ords = Seq((1L, ts("2024-03-01")), (2L, ts("2024-03-01")))
      .toDF("o_orderkey", "o_orderdate")
    val supp = Seq((100L, 1)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1, "FR")).toDF("n_nationkey", "n_name")
    val out = StarJoin.productProfit(li, ords, part, supp, nat, "red")
      .as[(String, Int, Long, Long)].collect().toSeq
    // 1000000 − 200000 = 800000; 45000 − 4000000 = −3955000 → net −3155000
    assert(out == Seq(("FR", 2024, 2L, -3155000L)))
  }

  test("minCostSupplier: truncating unit division, ties kept, region gates") {
    val li = Seq(
      // part 1, supp 100: 10.00 for qty 3 → 1000·1000/3 = 333333 (trunc)
      (1L, 100L, 10.0, 3.0),
      // part 1, supp 101: two lines, min unit wins → 5.00/2 = 250000
      (1L, 101L, 5.0, 2.0), (1L, 101L, 90.0, 1.0),
      // part 1, supp 102: TIES supp 101 at 250000 — both kept
      (1L, 102L, 2.5, 1.0),
      // part 1, supp 103: cheapest of all but OUTSIDE the region — out
      (1L, 103L, 0.01, 1.0),
      // part 2: only supp 100
      (2L, 100L, 7.0, 1.0)
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val part = Seq((1L, "Brand#1"), (2L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
    val supp = Seq((100L, "s-a", 1, 10.0), (101L, "s-b", 1, 20.0),
      (102L, "s-c", 1, 30.0), (103L, "s-far", 9, 40.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nat = Seq((1, "FR", 1), (9, "JP", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((1, "EUROPE"), (2, "ASIA")).toDF("r_regionkey", "r_name")
    val out = StarJoin.minCostSupplier(li, part, supp, nat, reg, "EUROPE")
      .select("p_partkey", "s_suppkey", "nation", "cost_milli")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(out == Set((1L, 101L, "FR", 250000L),
      (1L, 102L, "FR", 250000L), (2L, 100L, "FR", 700000L)))
  }

  test("importantParts: exact bp boundary excluded, nation gates value") {
    val li = Seq(
      // total from nation-1 suppliers: 100.00 → part 1 holds exactly
      // 50% (5000bp), part 2 holds 30%, part 3 holds 20%
      (1L, 100L, 50.0), (2L, 100L, 30.0), (3L, 100L, 20.0),
      // other-nation supplier value never counts
      (3L, 200L, 999.0)
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val supp = Seq((100L, 1), (200L, 2)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1, "FR"), (2, "JP")).toDF("n_nationkey", "n_name")
    // threshold 3000bp: part 1 (5000) in, part 2 (exactly 3000) OUT
    val out = StarJoin.importantParts(li, supp, nat, "FR", 3000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 5000L)))
  }

  test("waitingSuppliers: only the sole late supplier on shared orders") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val ords = Seq((1L, ts("2024-01-01")), (2L, ts("2024-01-01")),
      (3L, ts("2024-01-01")), (4L, ts("2024-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      // order 1: supp 100 late, supp 101 on time → 100 counts
      (1L, 100L, ts("2024-06-01")), (1L, 101L, ts("2024-01-15")),
      // order 2: BOTH late → nobody counts
      (2L, 100L, ts("2024-06-01")), (2L, 101L, ts("2024-06-01")),
      // order 3: single-supplier order, late → no other supplier, out
      (3L, 100L, ts("2024-06-01")),
      // order 4: supp 101 late twice (one agg row), supp 100 on time
      (4L, 101L, ts("2024-06-01")), (4L, 101L, ts("2024-07-01")),
      (4L, 100L, ts("2024-01-20"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((100L, "s-a", 1), (101L, "s-b", 1))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nat = Seq((1, "FR")).toDF("n_nationkey", "n_name")
    val out = StarJoin.waitingSuppliers(li, ords, supp, nat, lateDays = 90)
      .select("s_suppkey", "numwait").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 1L), (101L, 1L)))
  }

  test("priorityMixByFlag: urgent/high split from routine, window gates") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, "A", ts("1997-03-01")), // urgent order, in window
      (2L, "A", ts("1997-04-01")), // low order, in window
      (2L, "B", ts("1997-05-01")), // low order, class B
      (1L, "A", ts("1998-02-01"))  // urgent but ships out of window
    ).toDF("l_orderkey", "l_returnflag", "l_shipdate")
    val ords = Seq((1L, "1-URGENT"), (2L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
    val out = StarJoin.priorityMixByFlag(li, ords,
        from = "1997-01-01", until = "1998-01-01")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map("A" -> ((1L, 1L)), "B" -> ((0L, 1L))))
  }

  test("dominantFamilySuppliers: exactly-half excluded, window and family gate") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      // part 1 total 10: supp 100 ships 6 (>half, in), supp 101 ships 4
      (1L, 100L, ts("1997-03-01"), 6.0), (1L, 101L, ts("1997-04-01"), 4.0),
      // part 2 total 10: supp 100 ships EXACTLY half — strict >, out
      (2L, 100L, ts("1997-03-01"), 5.0), (2L, 101L, ts("1997-04-01"), 5.0),
      // part 1 shipment outside the window never counts
      (1L, 101L, ts("1998-02-01"), 99.0),
      // part 3 is not PROMO — out even though supp 101 ships all of it
      (3L, 101L, ts("1997-05-01"), 7.0)
    ).toDF("l_partkey", "l_suppkey", "l_shipdate", "l_quantity")
    val part = Seq((1L, "PROMO"), (2L, "PROMO"), (3L, "STANDARD"))
      .toDF("p_partkey", "p_type")
    val supp = Seq((100L, "s-a", 1), (101L, "s-b", 1))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nat = Seq((1, "FR")).toDF("n_nationkey", "n_name")
    val out = StarJoin.dominantFamilySuppliers(li, part, supp, nat,
        "PROMO", from = "1997-01-01", until = "1998-01-01")
      .select("s_suppkey", "n_dominated_parts")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 1L)))
  }

  test("pricingSummary: exact integer money units, truncating averages") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      ("A", "O", 5.0, 10.0, 0.05, 0.02, ts("1995-01-01")),
      ("A", "O", 10.0, 20.0, 0.10, 0.00, ts("1996-01-01")),
      // past the cutoff — filtered at the scan
      ("R", "F", 1.0, 1.0, 0.0, 0.0, ts("2001-01-01"))
    ).toDF("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    val out = StarJoin.pricingSummary(li, shipBefore = "2000-09-02")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // 1000·95 + 2000·90 = 275000 micro4; 1000·95·102 + 2000·90·100 =
    // 27 690 000 micro6; avgs truncate: 15·1000/2, 3000/2, 15·100/2
    assert(out == Seq(("A", "O", 2L, 15L, 3000L, 275000L, 27690000L,
      7500L, 1500L, 750L)))
  }

  test("forecastRevenue: bracket boundaries strict/inclusive, empty sum is 0") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      // qualifies: 1996 ship, disc 6 in [5,7], qty 10 < 24
      (10.0, 100.0, 0.06, ts("1996-06-01")),
      // disc 4 below the bracket
      (10.0, 100.0, 0.04, ts("1996-06-01")),
      // qty exactly at the cap — strict <, out
      (24.0, 100.0, 0.06, ts("1996-06-01")),
      // outside the ship year
      (10.0, 100.0, 0.06, ts("1995-06-01"))
    ).toDF("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
    val out = StarJoin.forecastRevenue(li, from = "1996-01-01",
        until = "1997-01-01", discLoPct = 5L, discHiPct = 7L, maxQty = 24L)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 60000L)))  // 10000 cents · 6 disc%
    // no qualifying rows: count 0, revenue coalesces to exact 0
    val empty = StarJoin.forecastRevenue(li, from = "1990-01-01",
        until = "1991-01-01", discLoPct = 5L, discHiPct = 7L, maxQty = 24L)
      .as[(Long, Long)].collect().toSeq
    assert(empty == Seq((0L, 0L)))
  }
}
