package graft

import org.apache.spark.sql.functions._
import graft.text.Importance

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("dsirWeights: target-like docs outweigh raw-only docs") {
    val df = Seq(
      (1L, true, "alpha beta alpha beta"),   // target vocabulary
      (2L, true, "alpha beta gamma alpha"),
      (3L, false, "alpha beta alpha beta"),  // raw doc, target-like content
      (4L, false, "omega psi chi phi"),      // raw doc, raw-only content
      (5L, false, "omega psi omega psi")).toDF("id", "t", "text")
    val w = Importance.dsirWeights(df, col("id"), col("text"), col("t"))
      .select("id", "logweight_micro").as[(Long, Long)].collect().toMap
    assert(w(3L) > w(4L), "target-vocabulary doc must score higher")
    assert(w(3L) > w(5L))
    assert(w.size == 5 && w(1L) == w(3L), "same text, same weight")
  }

  test("dsirWeights: n_tokens counts every token and weights are finite sums") {
    val df = Seq((1L, true, "a b c"), (2L, false, "a b c d"))
      .toDF("id", "t", "text")
    val out = Importance.dsirWeights(df, col("id"), col("text"), col("t"))
      .select("id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 4L))
  }
}
