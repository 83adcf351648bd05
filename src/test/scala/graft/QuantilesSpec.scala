package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantiles

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exact: percentile_disc semantics — first cumulative crossing") {
    // group a: values 1..10 → p50 = ceil(0.5·10) = 5th value = 5;
    // p90 = 9; p100 = 10. group b: single value.
    val df = ((1 to 10).map(v => ("a", v.toLong)) :+ ("b", 7L))
      .toDF("g", "v")
    val out = Quantiles.exact(df, col("g"), col("v"),
        Seq("p50" -> 500000L, "p90" -> 900000L, "p100" -> 1000000L))
      .orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 10L, 5L, 9L, 10L), ("b", 1L, 7L, 7L, 7L)))
  }

  test("exact: duplicate values collapse into one crossing row") {
    // eight 3s then two 9s: p50 rank 5 → 3; p90 rank 9 → 9
    val df = (Seq.fill(8)(3L) ++ Seq(9L, 9L)).map(("g", _)).toDF("g", "v")
    val out = Quantiles.exact(df, col("g"), col("v"),
        Seq("p50" -> 500000L, "p90" -> 900000L))
      .as[(String, Long, Long, Long)].head()
    assert(out == (("g", 10L, 3L, 9L)))
  }

  test("exact: low quantiles pick the minimum (ceil never hits rank 0)") {
    val df = Seq(("g", 5L), ("g", 1L), ("g", 3L)).toDF("g", "v")
    val out = Quantiles.exact(df, col("g"), col("v"), Seq("p1" -> 10000L))
      .select("p1").as[Long].head()
    assert(out == 1L)
  }

  test("exact plans one exchange + one sort; agg reuses the partitioning") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    val plan = Quantiles.exact(df, col("g"), col("v"),
      Seq("p50" -> 500000L)).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one exchange for groupBy(g, v), the window + final agg both key on
    // a SUBSET (g) of that partitioning — Spark needs one repartition to
    // g for the window; the final agg reuses it. Budget: ≤ 2 total.
    assert(exchanges <= 2, s"expected <= 2 hash exchanges, got $exchanges in:\n$plan")
    val sorts = "(?m)^\\s*[*+:-]*\\s*Sort ".r.findAllIn(plan).length
    assert(sorts == 1, s"expected 1 sort, got $sorts in:\n$plan")
  }

  test("percentRanks: percent_rank semantics with ties, lone row is 0") {
    val df = Seq(
      ("a", 10L), ("a", 20L), ("a", 20L), ("a", 30L), // ranks 1,2,2,4
      ("b", 7L)
    ).toDF("g", "v")
    val out = graft.ops.Quantiles.percentRanks(df, col("g"), col("v"))
      .orderBy("g", "value")
      .as[(String, Long, Long, Long)].collect().toSeq
    // n=4 → pr = (rank−1)·1e6 div 3: 0, 333333, 1000000
    assert(out == Seq(
      ("a", 10L, 1L, 0L),
      ("a", 20L, 2L, 333333L),
      ("a", 30L, 1L, 1000000L),
      ("b", 7L, 1L, 0L)))
  }

  test("approxLogQuantiles: exact below 2^(k+1), lower bound within 2^-k above") {
    // small domain (all values ≤ 31 with subBits=4) → identical to exact
    val small = Seq.tabulate(20)(i => ("a", (i + 1).toLong)).toDF("g", "v")
    val qs = Seq("p50" -> 500000L, "p90" -> 900000L)
    val ex = graft.ops.Quantiles.exact(small, col("g"), col("v"), qs)
      .as[(String, Long, Long, Long)].collect().head
    val ap = graft.ops.Quantiles.approxLogQuantiles(small, col("g"),
      col("v"), qs).as[(String, Long, Long, Long)].collect().head
    assert(ap == ex)
    // large values: deterministic bucket lower bound, ≤ truth, within 1/16
    val big = Seq(("a", 1000L), ("a", 2000L), ("a", 4000L), ("a", 100000L))
      .toDF("g", "v")
    val r = graft.ops.Quantiles.approxLogQuantiles(big, col("g"), col("v"),
      Seq("p50" -> 500000L)).as[(String, Long, Long)].collect().head
    // 2000 = 0b11111010000 (11 digits): sub = (2000 >> 6) & 15 = 15,
    // lo = 2^10 + 15·2^6 = 1984
    assert(r == (("a", 4L, 1984L)))
    assert(2000L - r._3 <= 2000L / 16)
  }

  test("approxLogQuantiles: nulls and negatives are excluded from the histogram") {
    val df = Seq(("a", Some(5L)), ("a", None), ("a", Some(-3L)),
      ("a", Some(9L))).toDF("g", "v")
    val r = graft.ops.Quantiles.approxLogQuantiles(df, col("g"), col("v"),
      Seq("p50" -> 500000L)).as[(String, Long, Long)].collect().head
    assert(r == (("a", 2L, 5L)))
  }

  test("weightedExact: cumulative-weight crossing, zero weights dropped") {
    val df = Seq(("a", 10L, 1L), ("a", 20L, 8L), ("a", 30L, 1L),
      ("a", 99L, 0L), ("b", 5L, 3L)).toDF("g", "v", "w")
    val out = graft.ops.Quantiles.weightedExact(df, col("g"), col("v"),
        col("w"), Seq("p50" -> 500000L, "p90" -> 900000L))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a: W=10, p50 crossing at cum 5 -> v=20; p90 at cum 9 -> v=20
    assert(out("a") == ((10L, 20L, 20L)))
    assert(out("b") == ((3L, 5L, 5L)))
  }

  test("weightedExact: unit weights reduce to exact()") {
    val df = Seq.tabulate(101)(i => ("g", i.toLong)).toDF("g", "v")
    val qs = Seq("p50" -> 500000L, "p99" -> 990000L)
    val w = graft.ops.Quantiles.weightedExact(df.withColumn("w", lit(1L)),
        col("g"), col("v"), col("w"), qs)
      .as[(String, Long, Long, Long)].collect().head
    val e = graft.ops.Quantiles.exact(df, col("g"), col("v"), qs)
      .as[(String, Long, Long, Long)].collect().head
    assert(w == e)
  }
}
