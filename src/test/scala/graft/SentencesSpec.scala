package graft

import org.apache.spark.sql.functions._
import graft.text.Sentences

class SentencesSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: Seq[(String, String)]) =
    Sentences.stats(rows.toDF("g", "t"), col("g"), col("t"))
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("terminal-punctuation runs split; whitespace segments drop") {
    val out = stats(Seq(
      ("a", "one two. three!! four five six?  "),
      ("a", "seven eight")))
    // doc 1: 3 sentences (2 + 1 + 3 words), doc 2: 1 sentence (2 words)
    // (n_docs, n_sentences, n_words, wps_ppm, max_sentence_words)
    assert(out("a") == ((2L, 4L, 8L, Some(2000000L), Some(3L))))
  }

  test("no terminal punctuation at all: one sentence per doc") {
    val out = stats(Seq(("a", "just words no stops")))
    assert(out("a") == ((1L, 1L, 4L, Some(4000000L), Some(4L))))
  }

  test("punctuation-only text: zero sentences, null averages") {
    val out = stats(Seq(("a", "... !!! ??")))
    assert(out("a") == ((1L, 0L, 0L, None, None)))
  }

  test("floor ppm: 7 words over 3 sentences") {
    val out = stats(Seq(("a", "a b c. d e. f g.")))
    assert(out("a")._4 == Some(7L * 1000000L / 3L))
  }
}
