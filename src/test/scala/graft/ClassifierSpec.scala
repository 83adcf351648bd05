package graft

import org.apache.spark.sql.functions._
import graft.text.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // a corpus where "alpha" marks the positive class; shared filler tokens
  // in both classes so the bias alone cannot win
  private def corpus = (0 until 40).map { i =>
    val marker = if (i % 2 == 0) "alpha" else "beta"
    (i.toLong, s"filler common words here $marker tail token$i end")
  }.toDF("doc_id", "text")

  test("trainLogistic separates a seed-keyword label; score is the " +
    "apply-side replay") {
    val label = array_contains(split(lower(col("text")), " "), "alpha")
    val w = Classifier.trainLogistic(corpus, label, col("text"),
      dim = 64, iters = 20, lr = 20.0)
    assert(w.length == 65)
    val scores = Classifier.score(corpus, col("doc_id"), col("text"), w)
      .as[(Long, Double)].collect().toMap
    val (pos, neg) = (0 until 40).partition(_ % 2 == 0)
    val posMin = pos.map(i => scores(i.toLong)).min
    val negMax = neg.map(i => scores(i.toLong)).max
    assert(posMin > 0.9, s"positives must score high, min=$posMin")
    assert(negMax < 0.1, s"negatives must score low, max=$negMax")
  }

  test("weights are 6dp-quantized every round and training is " +
    "deterministic across runs") {
    val label = array_contains(split(lower(col("text")), " "), "alpha")
    val w1 = Classifier.trainLogistic(corpus, label, col("text"),
      dim = 32, iters = 5, lr = 10.0)
    val w2 = Classifier.trainLogistic(corpus, label, col("text"),
      dim = 32, iters = 5, lr = 10.0)
    assert(w1.toSeq == w2.toSeq, "same data + config must reproduce bitwise")
    w1.foreach { v =>
      val scaled = BigDecimal(v) * BigDecimal(1000000)
      assert(scaled.isWhole, s"weight $v not 6dp-quantized")
    }
  }

  test("trainedWeights emits the (pos, weight) artifact with the bias in " +
    "the last slot; an empty-feature corpus learns exactly the prior " +
    "through it") {
    // every doc identical => only shared buckets + bias carry signal; a
    // 3:1 label imbalance must pull the scores toward the base rate
    val flat = (0 until 40).map(i => (i.toLong, "same text every time"))
      .toDF("doc_id", "text")
    // lr kept ≤1 here: with every doc identical the effective step is
    // lr·(p−ȳ)·Σx² and larger rates 2-cycle around the optimum instead
    // of settling on it
    val w = Classifier.trainedWeights(flat, col("doc_id") % 4 === 0,
        col("text"), dim = 16, iters = 60, lr = 1.0)
      .as[(Int, Double)].collect().sortBy(_._1)
    assert(w.map(_._1).toSeq == (0 to 16))
    val model = w.map(_._2)
    val score = Classifier.score(flat, col("doc_id"), col("text"), model)
      .as[(Long, Double)].collect().map(_._2)
    assert(score.distinct.length == 1, "identical docs must score equally")
    assert(math.abs(score.head - 0.25) < 0.05,
      s"prior fit should approach the 0.25 base rate, got ${score.head}")
  }
}
