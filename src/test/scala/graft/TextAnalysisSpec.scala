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

  test("rollupStats: detail + subtotal + grand-total rows, gid disambiguates") {
    val df = Seq(
      (1L, "s1", "en", "a b c"), (2L, "s1", "de", "a b"),
      (3L, "s2", "en", "a b c d")).toDF("id", "src", "lang", "text")
    val out = TextAnalysis.rollupStats(df, col("src"), col("lang"), col("text"))
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("lang"),
        r.getAs[Long]("gid"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
      .toSet
    assert(out == Set(
      ("s1", "en", 0L, 1L, 3L), ("s1", "de", 0L, 1L, 2L),
      ("s2", "en", 0L, 1L, 4L),
      ("s1", null, 1L, 2L, 5L), ("s2", null, 1L, 1L, 4L),
      (null, null, 3L, 3L, 9L)))
  }

  test("bagFingerprint: word-order invariant, vocabulary sensitive") {
    val df = Seq((1L, "the quick brown fox"), (2L, "fox brown the quick quick"),
      (3L, "the quick brown wolf")).toDF("id", "t")
    val fp = df.select(col("id"), TextAnalysis.bagFingerprint(col("t")).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L), "same bag of words must collide")
    assert(fp(1L) != fp(3L), "different vocabulary must separate")
  }

  test("sourceOverlap: counts distinct shared keys per unordered source pair") {
    val df = Seq(
      ("sA", "x y"), ("sB", "y x"),          // shared bag 1 (A,B)
      ("sA", "p q"), ("sB", "q p"), ("sC", "p q"), // shared bag 2 (A,B,C)
      ("sC", "only here")).toDF("src", "text")
    val out = TextAnalysis.sourceOverlap(df, col("src"),
        TextAnalysis.bagFingerprint(col("text")))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("sA", "sB", 2L), ("sA", "sC", 1L), ("sB", "sC", 1L)))
  }

  test("tokenEntropy: hand-computed micro-nat values") {
    val df = Seq((1L, "a a b b"), (2L, "a b c d"), (3L, "a a a"))
      .toDF("id", "text")
    val out = TextAnalysis.tokenEntropy(df, col("id"), col("text"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val h2 = 2 * math.round(0.5 * math.log(2.0) * 1e6) // two p=1/2 types
    val h4 = 4 * math.round(0.25 * math.log(4.0) * 1e6)
    assert(out(1L) == ((4L, 2L, h2)))
    assert(out(2L) == ((4L, 4L, h4)))
    assert(out(3L) == ((3L, 1L, 0L)), "single-type doc has zero entropy")
    assert(out(2L)._3 > out(1L)._3, "uniform 4 types beats 2 types")
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

  test("charsetProfile: exact class ppm and dominant script") {
    val docs = Seq(
      (1L, "Abc 12 漢字 Ж!"), // 12 chars: 3 latin, 2 digit,
                                           // 2 cjk, 1 cyrillic, 3 space, 1 other
      (2L, "") // empty → all zero, dominant 'none'
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charsetProfile(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 12L)
    assert(r1.getLong(2) == 250000L)     // latin
    assert(r1.getLong(3) == 166666L)     // digit
    assert(r1.getLong(4) == 166666L)     // cjk
    assert(r1.getLong(5) == 83333L)      // cyrillic
    assert(r1.getLong(6) == 0L)          // arabic
    assert(r1.getLong(7) == 250000L)     // space
    assert(r1.getLong(8) == 83333L)      // other (!)
    assert(r1.getString(9) == "latin")
    val r2 = out(2L)
    assert(r2.getLong(1) == 0L && r2.getString(9) == "none")
  }

  test("charsetProfile: ties break to the lexicographically largest script") {
    val docs = Seq(
      (1L, "a漢"),      // latin 1 = cjk 1 → 'latin'
      (2L, "漢Ж")  // cjk 1 = cyrillic 1 → 'cyrillic'
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charsetProfile(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(9)).toMap
    assert(out == Map(1L -> "latin", 2L -> "cyrillic"))
  }

  test("readability: exact integer Flesch components and score") {
    val docs = Seq(
      // 4 words, 2 sentences, syllables: the=1 cat=1 sat=1 down=1 = 4
      // fre = 206835 − 1015·4/2 − 84600·4/4 = 206835 − 2030 − 84600
      (1L, "The cat sat. Down!"),
      // no sentence punctuation → sentence floor 1; "rhythm" has no
      // vowel-group except 'y': r-h-y-t-h-m → [y] = 1
      (2L, "rhythm"),
      (3L, "") // empty → typed-null score, zero words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((4L, 2L, 4L, Some(206835L - 2030L - 84600L))))
    assert(out(2L) == ((1L, 1L, 1L, Some(206835L - 1015L - 84600L))))
    // "" splits to one empty token which the filter drops
    assert(out(3L) == ((0L, 1L, 0L, None)))
  }

  test("readability: vowel groups count once per run, zero-shuffle plan") {
    // "queueing" → [ueuei] = 1 group; "aeiou" → 1; "xyz" → y = 1
    val docs = Seq((1L, "queueing aeiou xyz strengths")).toDF("doc_id", "text")
    val q = TextAnalysis.readability(docs, col("doc_id"), col("text"))
    val r = q.as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(r._2 == 4L && r._4 == 4L)
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      "readability must stay a map-only projection")
  }

  test("codeDetect: symbol-heavy text flags, prose does not, ppm exact") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      (1L, "if (x) { y[0] = z; }"),   // 20 chars, 8 symbols + 1 digit
      (2L, "plain prose with words"),
      (3L, "Count 42 UPPER chars")
    ).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.codeDetect(df, col("doc_id"),
        col("text"))
      .orderBy("doc_id")
      .select("doc_id", "n_chars", "symbol_ppm", "digit_ppm", "upper_ppm",
        "is_code")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out.head == ((1L, 20L, 400000L, 50000L, 0L, true)))
    assert(out(1) == ((2L, 22L, 0L, 0L, 0L, false)))
    // "Count 42 UPPER chars": 20 chars, digits 2 → 100000, uppers C+UPPER=6
    assert(out(2) == ((3L, 20L, 0L, 100000L, 300000L, false)))
    val q = graft.text.TextAnalysis.codeDetect(df, col("doc_id"), col("text"))
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      "codeDetect must stay a map-only projection")
  }
}
