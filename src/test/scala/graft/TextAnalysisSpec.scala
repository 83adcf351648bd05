package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("qualityMetrics computes token stats on a known sentence") {
    val df = Seq((1L, "The quick fox and the dog")).toDF("id", "text")
    val r = TextAnalysis.qualityMetrics(df, col("id"), col("text"),
      Seq("the", "a", "of", "and", "is")).collect()(0)
    assert(r.getAs[Int]("n_chars") == 25)
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_uniq_tokens") == 5) // 'the' twice after lower()
    assert(r.getAs[Double]("stopword_ratio") == 0.5) // the, and, the
    assert(r.getAs[Int]("n_bpe_tokens") == 6)
  }

  test("languageId picks profile languages on real sentences") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el perro es de la casa y los gatos en un patio"),
      (3L, "der hund ist ein tier und die katze ist zu haus"),
      (4L, "这是一个中文句子没有空格")
    ).toDF("id", "text")
    val out = TextAnalysis.languageId(df, col("id"), col("text"))
      .select("id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
    assert(out(4L) == "zh")
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")
    ).toDF("id", "text")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("nfc: decomposed and composed forms converge, fingerprints then agree") {
    val composed = "café naïve"          // é, ï precomposed
    val decomposed = "café naïve"      // e+U+0301, i+U+0308
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
    val out = df.select(col("id"),
        TextAnalysis.nfc(col("t")).as("n"),
        TextAnalysis.fingerprint(TextAnalysis.nfc(col("t"))).as("fp"),
        length(col("t")).as("lb"), length(TextAnalysis.nfc(col("t"))).as("la"))
      .orderBy("id").collect()
    assert(out(0).getAs[String]("n") == out(1).getAs[String]("n"))
    assert(out(0).getAs[Long]("fp") == out(1).getAs[Long]("fp"))
    assert(out(0).getAs[Int]("lb") == 10 && out(1).getAs[Int]("lb") == 12)
    assert(out.forall(_.getAs[Int]("la") == 10))
    // WITHOUT normalization the fingerprints split — the bug nfc prevents
    val raw = df.select(TextAnalysis.fingerprint(col("t"))).as[Long].collect()
    assert(raw(0) != raw(1))
  }

  test("corpusStats: exact type-7 percentiles per group") {
    // group g: token counts 1,2,3,4,10 -> p50 = 3.0, p90 = 7.6 (type 7)
    val texts = Seq(1, 2, 3, 4, 10).zipWithIndex.map { case (n, i) =>
      (i.toLong, "g", (1 to n).map(k => s"w$k").mkString(" "))
    } :+ ((9L, "h", "solo"))
    val out = TextAnalysis.corpusStats(texts.toDF("id", "grp", "text"),
        col("grp"), col("text"))
      .orderBy("grp").collect()
    val g = out(0)
    assert(g.getAs[Long]("n_docs") == 5)
    assert(g.getAs[Long]("total_tokens") == 20)
    assert(g.getAs[Double]("avg_tokens") == 4.0)
    assert(g.getAs[Double]("p50_tokens") == 3.0)
    assert(g.getAs[Double]("p90_tokens") == 7.6)
    assert(out(1).getAs[Double]("p90_tokens") == 1.0)
  }
}
