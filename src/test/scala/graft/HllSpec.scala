package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class HllSpec extends SparkSpec {
  import spark.implicits._

  /** Scala reference for the register array, mirroring the oracle SQL. */
  private def referenceRegisters(values: Seq[Long], m: Int): Seq[Int] = {
    val w = TextAnalysis.hllQuotientBits(m)
    val regs = Array.fill(m)(0)
    values.foreach { h =>
      val b = (h % m).toInt
      val q = h / m
      val rank =
        if (q == 0) w + 1
        else w - (63 - java.lang.Long.numberOfLeadingZeros(q))
      if (rank > regs(b)) regs(b) = rank
    }
    regs.toSeq
  }

  private def mix(x: Long): Long = {
    val h = x % TextAnalysis.HashP
    (h * h + 13) % TextAnalysis.HashP
  }

  test("registers match the Scala reference and are partitioning-invariant") {
    val values = (0L until 5000L).map(mix)
    val df1 = values.toDF("h").repartition(1)
    val df7 = values.toDF("h").repartition(7)
    def regs(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
      import org.apache.spark.sql.graftfn.{asColumn, asExpression}
      df.agg(asColumn(graft.functions.HllRegisters(
          asExpression(col("h")), 64).toAggregateExpression()).as("r"))
        .as[Seq[Int]].head()
    }
    val expected = referenceRegisters(values, 64)
    assert(regs(df1) == expected)
    assert(regs(df7) == expected, "merge across partials must equal one-pass")
  }

  test("estimates land within 25% of truth on well-mixed inputs (raw regime)") {
    val df = (0L until 20000L).map(i => ("g", mix(i * 2654435761L)))
      .toDF("g", "h")
    val out = TextAnalysis.hllCardinality(df, col("g"),
      Seq("x" -> col("h")), m = 64)
    val (exact, est) = out.select("x_exact", "x_est")
      .as[(Long, Long)].head()
    assert(exact > 19000L)
    assert(math.abs(est - exact).toDouble / exact < 0.25,
      s"estimate $est too far from $exact")
  }

  test("linear-counting branch fires below 2.5m and is exact-ish at tiny n") {
    val df = (0L until 40L).map(i => ("g", mix(i * 2654435761L))).toDF("g", "h")
    val out = TextAnalysis.hllCardinality(df, col("g"),
      Seq("x" -> col("h")), m = 64)
    val (exact, zeros, est) = out.select("x_exact", "x_zero_regs", "x_est")
      .as[(Long, Long, Long)].head()
    assert(zeros > 0)
    // the branch replays the oracle arithmetic exactly
    assert(est == math.round(64.0 * math.log(64.0 / zeros)))
    assert(math.abs(est - exact) <= 10)
  }

  test("no linear-counting rounding boundary lies within 1e-6 (the t18 guard)") {
    // round(m·ln(m/V)) must be unambiguous for every reachable V, or the
    // engine and a libm-different oracle could round apart
    (1 until 64).foreach { v =>
      val x = 64.0 * math.log(64.0 / v)
      val frac = x - math.floor(x)
      assert(math.abs(frac - 0.5) > 1e-6,
        s"V=$v puts m*ln(m/V)=$x within 1e-6 of a rounding boundary")
    }
  }

  test("out-of-domain input is rejected, not silently mis-bucketed") {
    val err = intercept[Exception] {
      val df = Seq(TextAnalysis.HashP + 5L).toDF("h")
      import org.apache.spark.sql.graftfn.{asColumn, asExpression}
      df.agg(asColumn(graft.functions.HllRegisters(
          asExpression(col("h")), 64).toAggregateExpression())).collect()
    }
    assert(err.getMessage != null)
  }
}
