package graft

import org.apache.spark.sql.functions._
import graft.text.Lexicon

class LexiconSpec extends SparkSpec {
  import spark.implicits._

  private val lex = Seq("fast" -> 3L, "slow" -> -3L, "big" -> 1L)

  private def run(rows: Seq[(String, String)]) =
    Lexicon.score(rows.toDF("g", "t"), col("g"), col("t"), lex)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("weights sum per doc; unknown tokens weigh zero; case-folded") {
    val out = run(Seq(
      ("a", "FAST fast table"),   // +6
      ("a", "slow slow big"),     // -5
      ("a", "table scan")))       // 0
    // (n_docs, total, n_pos, n_neg, min, max)
    assert(out("a") == ((3L, 1L, 1L, 1L, -5L, 6L)))
  }

  test("repeated spaces tokenize like single spaces") {
    val out = run(Seq(("a", "fast   fast")))
    assert(out("a") == ((1L, 6L, 1L, 0L, 6L, 6L)))
  }

  test("empty lexicon rejected; duplicate terms rejected") {
    intercept[IllegalArgumentException] {
      Lexicon.score(Seq(("a", "x")).toDF("g", "t"), col("g"), col("t"),
        Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Lexicon.score(Seq(("a", "x")).toDF("g", "t"), col("g"), col("t"),
        Seq("fast" -> 1L, "fast" -> 2L))
    }
  }
}
