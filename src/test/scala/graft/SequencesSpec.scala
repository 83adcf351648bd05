package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Sequences

class SequencesSpec extends SparkSpec {
  import spark.implicits._

  private def o(ok: Long, cust: Long, day: String) =
    (ok, cust, Timestamp.valueOf(day + " 00:00:00"))

  test("sequentialRules: direction matters, same-day is not 'later'") {
    val orders = Seq(
      o(1L, 1L, "2024-01-01"), o(2L, 1L, "2024-01-05"),
      o(3L, 2L, "2024-01-01"), o(4L, 2L, "2024-01-05"),
      o(5L, 3L, "2024-01-03") // buys both A and B the same day
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (1L, 100L), (2L, 200L),  // cust 1: A then B
      (3L, 100L), (4L, 200L),  // cust 2: A then B
      (5L, 100L), (5L, 200L)   // cust 3: A and B same day → no witness
    ).toDF("l_orderkey", "l_partkey")
    val out = Sequences.sequentialRules(orders, li, minSupport = 1L, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // A→B: 2 of 3 A-buyers converted → 666666 ppm; B→A never (B is
    // always last); same-day pair contributes neither direction
    assert(out == Seq((100L, 200L, 2L, 3L, 666666L)))
  }

  test("sequentialRules: repeat purchases collapse to one span per item") {
    val orders = Seq(
      o(1L, 1L, "2024-01-01"), o(2L, 1L, "2024-01-02"),
      o(3L, 1L, "2024-01-03")
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (1L, 100L), (2L, 100L), (3L, 200L) // A twice, then B
    ).toDF("l_orderkey", "l_partkey")
    val out = Sequences.sequentialRules(orders, li, minSupport = 1L, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // exactly one A→B witness row despite two A orders; confidence 1e6
    assert(out == Seq((100L, 200L, 1L, 1L, 1000000L)))
  }

  test("sequentialRules: the salted pair stage (salt > 1) is " +
      "result-identical to the default plan on a random basket history") {
    val rnd = new scala.util.Random(11L)
    val orders = (1L to 120L).map(ok =>
      o(ok, rnd.nextInt(12).toLong,
        f"2024-01-${rnd.nextInt(28) + 1}%02d")).toDF(
      "o_orderkey", "o_custkey", "o_orderdate")
    val li = (1L to 120L).flatMap(ok => Seq.fill(rnd.nextInt(4) + 1)(
      (ok, (rnd.nextInt(9) + 100).toLong))).toDF("l_orderkey", "l_partkey")
    def run(salt: Int) = Sequences.sequentialRules(orders, li,
        minSupport = 2L, k = 1000, salt = salt)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val naive = run(1)
    assert(naive.nonEmpty)
    assert(run(4) == naive)
  }
}
