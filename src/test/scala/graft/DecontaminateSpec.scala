package graft

import org.apache.spark.sql.functions._
import graft.text.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val eval = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "pack my box with liquor jugs")
  ).toDF("doc_id", "text")

  test("report: exact overlap ppm over distinct trigrams, threshold flag") {
    val corpus = Seq(
      // 4 trigrams; "the quick brown" + "quick brown fox" hit → 500000 ppm
      (10L, "the quick brown fox sleeps now"),
      // zero overlap
      (11L, "completely different words entirely here"),
      // full leak: every trigram of eval doc 1 → 1000000 ppm
      (12L, "the quick brown fox jumps")
    ).toDF("doc_id", "text")
    val out = Decontaminate.report(corpus, col("doc_id"), col("text"),
        eval, col("text"), n = 3, thresholdPpm = 500000L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(10L) == ((4L, 2L, 500000L, 1L)))
    assert(out(11L) == ((3L, 0L, 0L, 0L)))
    assert(out(12L) == ((3L, 3L, 1000000L, 1L)))
  }

  test("report: docs shorter than n emit a clean zero-gram row") {
    val corpus = Seq((20L, "two words"), (21L, "one")).toDF("doc_id", "text")
    val out = Decontaminate.report(corpus, col("doc_id"), col("text"),
        eval, col("text"), n = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set((20L, 0L, 0L, 0L, 0L), (21L, 0L, 0L, 0L, 0L)))
  }

  test("report: repeated grams inside one doc count once (distinct semantics)") {
    val corpus = Seq(
      (30L, "the quick brown fox the quick brown fox")
    ).toDF("doc_id", "text")
    // distinct trigrams: {the quick brown, quick brown fox, brown fox the,
    //  fox the quick} = 4; hits = 2
    val out = Decontaminate.report(corpus, col("doc_id"), col("text"),
        eval, col("text"), n = 3)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out == ((30L, 4L, 2L, 500000L, 1L)))
  }
}
