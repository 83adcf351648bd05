package graft

import org.apache.spark.sql.functions._
import graft.text.{LineDedup, TextAnalysis}

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("removeCommonLines: lines in >=3 docs struck everywhere, order kept") {
    val df = Seq(
      (1L, Seq("cookie banner", "real content one", "footer")),
      (2L, Seq("cookie banner", "real content two", "footer")),
      (3L, Seq("cookie banner", "unique text", "footer")),
      (4L, Seq("cookie banner", "footer")) // fully boilerplate
    ).toDF("doc_id", "lines")
    val out = LineDedup.removeCommonLines(df, col("doc_id"), col("lines"),
        minDf = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept", "n_dropped")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 1L, 2L), (2L, 3L, 1L, 2L), (3L, 3L, 1L, 2L),
      (4L, 2L, 0L, 2L)))
  }

  test("removeCommonLines: clean_fp equals the fingerprint of the kept text") {
    val df = Seq(
      (1L, Seq("dup", "alpha beta", "dup", "gamma")),
      (2L, Seq("dup")), (3L, Seq("dup"))
    ).toDF("doc_id", "lines")
    val out = LineDedup.removeCommonLines(df, col("doc_id"), col("lines"),
        minDf = 3)
      .filter(col("doc_id") === 1L).select("clean_fp").as[Long].head()
    // kept text for doc 1 = "alpha beta gamma" (positions 2 and 4 in order)
    val expect = Seq((1L, "alpha beta gamma")).toDF("id", "t")
      .select(TextAnalysis.fingerprintHof(col("t"))).as[Long].head()
    assert(out == expect)
    // the fully-dropped docs carry the empty-string fingerprint
    val empty = LineDedup.removeCommonLines(df, col("doc_id"), col("lines"),
        minDf = 3)
      .filter(col("doc_id") === 2L).select("clean_fp").as[Long].head()
    val expectEmpty = Seq((1L, "")).toDF("id", "t")
      .select(TextAnalysis.fingerprintHof(col("t"))).as[Long].head()
    assert(empty == expectEmpty)
  }

  test("duplicate lines INSIDE one doc never reach the boilerplate bar alone") {
    // "x" appears 3 times but only in ONE document: distinct-doc df = 1
    val df = Seq(
      (1L, Seq("x", "x", "x", "keep")),
      (2L, Seq("other"))
    ).toDF("doc_id", "lines")
    val out = LineDedup.removeCommonLines(df, col("doc_id"), col("lines"),
        minDf = 2)
      .filter(col("doc_id") === 1L)
      .select("n_dropped").as[Long].head()
    assert(out == 0L)
  }
}
