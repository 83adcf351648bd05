package graft

import org.apache.spark.sql.functions._
import graft.text.Bitext

class BitextSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // en/fr pair sharing two rare shingles ("alpha beta gamma delta" and
    // "delta epsilon zeta eta"); the de doc shares only ONE
    (1L, "en", "alpha beta gamma delta epsilon zeta eta common tail one"),
    (2L, "fr", "alpha beta gamma delta epsilon zeta eta autre queue deux"),
    (3L, "de", "alpha beta gamma delta anders weiter und so fort hier"),
    // same-language near-copy of doc 1 must NOT pair (bitext = cross-lang)
    (4L, "en", "alpha beta gamma delta epsilon zeta eta common tail uno")
  ).toDF("doc_id", "lang", "text")

  test("candidatePairs: cross-lang only, shared-shingle floor enforced") {
    val out = Bitext.candidatePairs(docs, col("doc_id"), col("lang"),
        col("text"), gram = 4, maxDf = 3, minShared = 3)
      .select("doc_a", "doc_b", "lang_a", "lang_b")
      .as[(Long, Long, String, String)].collect().toSet
    // the 7-token shared run yields 4 shingles, but "alpha beta gamma
    // delta" sits in ALL FOUR docs (df=4 > maxDf) and is floor-dropped →
    // cross-lang pairs (1,2) and (2,4) share the remaining 3; doc 3
    // shared only the dropped shingle; (1,4) shares plenty but same lang
    assert(out == Set((1L, 2L, "en", "fr"), (2L, 4L, "fr", "en")))
  }

  test("candidatePairs: the df floor drops shingles common to many docs") {
    // a shingle present in all four docs anchors nothing at maxDf=3
    val boiler = Seq(
      (1L, "en", "same same same same x1 y1"),
      (2L, "fr", "same same same same x2 y2"),
      (3L, "de", "same same same same x3 y3"),
      (4L, "zh", "same same same same x4 y4")
    ).toDF("doc_id", "lang", "text")
    val out = Bitext.candidatePairs(boiler, col("doc_id"), col("lang"),
      col("text"), gram = 4, maxDf = 3, minShared = 1)
    assert(out.count() == 0)
  }
}
