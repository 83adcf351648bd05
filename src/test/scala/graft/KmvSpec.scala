package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.{asColumn, asExpression}
import graft.functions.KMinValues
import graft.text.TextAnalysis

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def kmv(c: org.apache.spark.sql.Column, k: Int) =
    asColumn(KMinValues(asExpression(c), k).toAggregateExpression())

  test("sketch keeps the k smallest distinct values, sorted") {
    val df = Seq(9L, 3L, 7L, 3L, 1L, 7L, 5L, 11L).toDF("v")
    val out = df.agg(kmv(col("v"), 4).as("s")).collect()(0).getSeq[Long](0)
    assert(out == Seq(1L, 3L, 5L, 7L))
    // below k distinct: holds everything
    val all = df.agg(kmv(col("v"), 100).as("s")).collect()(0).getSeq[Long](0)
    assert(all == Seq(1L, 3L, 5L, 7L, 9L, 11L))
  }

  test("merge is partition-invariant: any repartitioning gives the same sketch") {
    val rnd = new scala.util.Random(5)
    val vals = Seq.fill(5000)(rnd.nextLong().abs % 1000000007L)
    val expect = vals.distinct.sorted.take(64)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(kmv(col("v"), 64).as("s")).collect()(0).getSeq[Long](0)
      assert(got == expect, s"parts=$parts")
    }
  }

  test("estimator: exact below k, within 20% at 200x k") {
    val rnd = new scala.util.Random(17)
    // uniform hashes on [0, HashP) — the estimator's own assumption
    val n = 51200
    val hashes = Seq.fill(n)(rnd.nextLong().abs % TextAnalysis.HashP).distinct
    val df = hashes.toDF("h").select(lit("g").as("g"), col("h"))
    val k = 256
    val est = df.groupBy("g")
      .agg(kmv(col("h"), k).as("s"))
      .select(round(lit((k - 1).toDouble) * lit(TextAnalysis.HashP.toDouble) /
        element_at(col("s"), k)).cast("long"))
      .collect()(0).getLong(0)
    assert(math.abs(est.toDouble / hashes.size - 1.0) < 0.2,
      s"est $est vs exact ${hashes.size}")
    // below k: the sketch size IS the count
    val small = Seq(1L, 2L, 3L).toDF("h")
      .agg(kmv(col("h"), 64).as("s")).collect()(0).getSeq[Long](0)
    assert(small.size == 3)
  }

  test("kmvDistinctTokens: n_est is exact when a group has < k distinct tokens") {
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "a", "x y"), (3L, "b", "p q r s t")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.kmvDistinctTokens(docs, col("source"), col("text"), k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a") == ((3L, 3L)))
    assert(out("b") == ((5L, 5L)))
  }
}
