package graft

import org.apache.spark.sql.functions._
import graft.text.Rake

class RakeSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq("the", "of")

  test("keywords: stopwords delimit phrases, scores are deg/freq sums") {
    // doc: "deep learning of the deep learning stack"
    // phrases: "deep learning", "deep learning stack"
    // freq: deep 2, learning 2, stack 1; deg: deep 2+3=5, learning 5,
    // stack 3 → scores (micro): deep 2500000, learning 2500000,
    // stack 3000000
    val docs = Seq((1L, "deep learning of the deep learning stack"))
      .toDF("doc_id", "text")
    val out = Rake.keywords(docs, col("doc_id"), col("text"), stops, k = 5)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("deep learning stack", 3L, 1L, 8000000L),
      ("deep learning", 2L, 1L, 5000000L)))
  }

  test("keywords: repeated phrase counts occurrences once per instance") {
    val docs = Seq((1L, "alpha beta of alpha beta"), (2L, "alpha beta"))
      .toDF("doc_id", "text")
    val out = Rake.keywords(docs, col("doc_id"), col("text"), stops, k = 5)
      .as[(String, Long, Long, Long)].collect().toSeq
    // one unique phrase, three instances; deg=freq ⇒ every word scores
    // exactly 2·1e6 (phrase length), phrase score 4e6
    assert(out == Seq(("alpha beta", 2L, 3L, 4000000L)))
  }

  test("keywords: leading/trailing/double stopwords yield clean phrases") {
    val docs = Seq((1L, "the of alpha the the beta gamma of"))
      .toDF("doc_id", "text")
    val out = Rake.keywords(docs, col("doc_id"), col("text"), stops, k = 5)
      .select("phrase").as[String].collect().toSet
    assert(out == Set("alpha", "beta gamma"))
  }
}
