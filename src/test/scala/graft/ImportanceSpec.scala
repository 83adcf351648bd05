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

  test("gumbelTopK: deterministic, honors k, and dominant weights win") {
    val df = (1L to 200L).map(i => (i, if (i <= 5) 10000000L else -10000000L))
      .toDF("id", "w")
    val pick = Importance.gumbelTopK(df, col("id"), col("w"), k = 5)
      .select("id").as[Long].collect().toSet
    // 20M micro-units of log-weight dwarf the Gumbel noise (~±3M micro):
    // the 5 heavy rows must win
    assert(pick == (1L to 5L).toSet)
    val again = Importance.gumbelTopK(df, col("id"), col("w"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(again == pick, "selection must be reproducible")
    // equal weights: the Gumbel keys decide, and they are NOT the id order
    val flat = (1L to 200L).map((_, 0L)).toDF("id", "w")
    val flatPick = Importance.gumbelTopK(flat, col("id"), col("w"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(flatPick != (1L to 5L).toSet, "noise, not id order, must rank ties")
    assert(flatPick.size == 5)
  }

  test("dsirWeights: n_tokens counts every token and weights are finite sums") {
    val df = Seq((1L, true, "a b c"), (2L, false, "a b c d"))
      .toDF("id", "t", "text")
    val out = Importance.dsirWeights(df, col("id"), col("text"), col("t"))
      .select("id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 4L))
  }
}
