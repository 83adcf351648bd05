package graft

import org.apache.spark.sql.functions._
import graft.text.QualityFilters

class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Int, String)*) = texts.toSeq.toDF("doc_id", "text")

  test("repetitionMetrics: hand-computed fractions on crafted docs") {
    val df = QualityFilters.repetitionMetrics(
      docs(
        1 -> "a b a b a",   // 5 toks, 2 distinct; top tok a=3; bigrams: ab,ba,ab,ba → top 2/4
        2 -> "x y z w",     // all unique
        3 -> "q"),          // single token → bigram frac 0
      col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val r1 = df(0)
    assert(r1.getAs[Int]("n_tokens") == 5)
    assert(r1.getAs[Double]("dup_token_frac") == 0.6)
    assert(r1.getAs[Double]("top_token_frac") == 0.6)
    assert(r1.getAs[Double]("top_bigram_frac") == 0.5)
    val r2 = df(1)
    assert(r2.getAs[Double]("dup_token_frac") == 0.0)
    assert(r2.getAs[Double]("top_token_frac") == 0.25)
    val r3 = df(2)
    assert(r3.getAs[Double]("top_bigram_frac") == 0.0)
  }

  test("qualityFilter: first failing rule wins, NULL reason survives") {
    val sw = Seq("the", "a")
    val long = ("w " * 95).trim                       // 95 tokens -> too_long
    val dup = ("the x " * 15).trim                    // 30 toks, 2 uniq -> low_diversity
    val noStop = (1 to 30).map(i => s"t$i").mkString(" ") // no stopwords
    val good = ("the quick brown fox jumps over lazy dogs " * 3).trim + " a b c"
    val out = QualityFilters.qualityFilter(
        docs(1 -> "tiny doc", 2 -> long, 3 -> dup, 4 -> noStop, 5 -> good),
        col("doc_id"), col("text"), sw)
      .orderBy("doc_id").select("drop_reason").as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("too_short"), Some("too_long"),
      Some("low_diversity"), Some("low_stopword"), None))
  }

  test("blocklistFilter: occurrence counts, case folding, clean docs keep") {
    val out = QualityFilters.blocklistFilter(
      docs(
        1 -> "BAD word bad again",  // 'bad' twice (case-folded)
        2 -> "all clean here",
        3 -> "bad",                 // single hit
        4 -> "badge bads embad"),   // substrings do NOT match tokens
      col("doc_id"), col("text"), blocklist = Seq("BAD", "worse"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("n_hits"), r.getAs[Boolean]("keep"))).toSeq ==
      Seq((2L, false), (0L, true), (1L, false), (0L, true)))
  }

  test("stratifiedHashSample: deterministic, respects per-stratum rates") {
    val df = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 500, "zh" -> 100)
    val kept = QualityFilters.stratifiedHashSample(df, col("doc_id"), col("lang"), rates)
    val again = QualityFilters.stratifiedHashSample(
      df.repartition(13), col("doc_id"), col("lang"), rates)
    // identical selection regardless of partitioning
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    // 1000 docs per stratum; rate 0.5 / 0.1 with hash noise
    assert(byLang("en") > 400 && byLang("en") < 600)
    assert(byLang("zh") > 50 && byLang("zh") < 170)
    // unlisted strata default to dropped
    val dropped = QualityFilters.stratifiedHashSample(
      Seq((1L, "fr")).toDF("doc_id", "lang"), col("doc_id"), col("lang"), rates)
    assert(dropped.count() == 0)
  }

  test("stratifiedTopN: exact per-stratum budget, partition-invariant, WindowGroupLimit plan") {
    val df = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val top = QualityFilters.stratifiedTopN(df, col("doc_id"), col("lang"), n = 40)
    // exactly n rows per stratum (budget is exact, unlike the permille rate)
    val byLang = top.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 40L, "zh" -> 40L))
    // a stratum smaller than n yields all of it
    val tiny = QualityFilters.stratifiedTopN(
      Seq((1L, "fr"), (2L, "fr")).toDF("doc_id", "lang"),
      col("doc_id"), col("lang"), n = 40)
    assert(tiny.count() == 2)
    // identical selection regardless of partitioning
    val again = QualityFilters.stratifiedTopN(df.repartition(13),
      col("doc_id"), col("lang"), n = 40)
    assert(top.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
    // the rank<=n filter must plan the group-limit pushdown: the shuffle
    // then carries at most n rows per stratum per map partition
    assert(top.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "expected WindowGroupLimit below the rank filter")
  }

  test("redactPii: emails, IPv4s, phones; ordering prevents double-match") {
    val cases = Seq(
      "mail bob.smith+tag@sub.example.org now" -> "mail <EMAIL> now",
      "host 192.168.001.12 up" -> "host <IP> up",
      "call +1-555-867-5309 ok" -> "call <PHONE> ok",
      "a@b.co 10.0.0.1 +49-30-1234567" -> "<EMAIL> <IP> <PHONE>",
      "no pii here 12.5 degrees" -> "no pii here 12.5 degrees")
    val out = cases.map(_._1).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"), QualityFilters.redactPii(col("t")).as("r"))
      .orderBy("i").select("r").as[String].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  test("tokenBudgetSelect: exact greedy prefix, any granularity") {
    import graft.text.TextAnalysis
    // quality = uniq_ratio: d1 "a b c d" 1.0x4tok, d2 "a a b b" 0.5x4,
    // d3 "x y z" 1.0x3, d4 "p p p" ~0.333x3. Order (q desc, id):
    // d1(4) d3(3) d2(4) d4(3); cums 4 7 11 14 -> budget 8 keeps d1, d3
    val df = Seq((1L, "a b c d"), (2L, "a a b b"), (3L, "x y z"), (4L, "p p p"))
      .toDF("doc_id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    val q = round(size(array_distinct(toks)).cast("double") / size(toks), 6)
    def run(g: Int) = QualityFilters.tokenBudgetSelect(
      df, col("doc_id"), col("text"), q, budget = 8L, granularity = g)
      .orderBy("doc_id").select("doc_id", "cum_tokens")
      .as[(Long, Long)].collect().toList
    assert(run(1000) == List((1L, 4L), (3L, 7L)))
    // bucketing is parallelization only — the kept set is granularity-free
    // (g=1 puts EVERY doc in one or two buckets, the degenerate case)
    assert(run(1) == run(1000) && run(7) == run(1000))
    // budget smaller than the first doc keeps nothing; cum is exact
    assert(QualityFilters.tokenBudgetSelect(df, col("doc_id"), col("text"),
      q, budget = 3L).count() == 0)
    intercept[IllegalArgumentException] {
      QualityFilters.tokenBudgetSelect(df, col("doc_id"), col("text"), q, budget = 0L)
    }
  }

  test("tokenBudgetMixture: per-source budgets bind independently") {
    import graft.text.TextAnalysis
    // sources A (4+4 tokens) and B (3+3); total 10 ppm-split 600/400 ->
    // budgets 6 and 4: A keeps only its best doc (4 <= 6, 8 > 6), B keeps
    // its best (3 <= 4, 6 > 4); source C unlisted with default 0 -> dropped
    val df = Seq(
      (1L, "a b c d", "A"), (2L, "a a b b", "A"),
      (3L, "x y z", "B"), (4L, "p p q", "B"),
      (5L, "m n", "C"))
      .toDF("doc_id", "text", "source")
    val toks = TextAnalysis.tokens(col("text"))
    val q = round(size(array_distinct(toks)).cast("double") / size(toks), 6)
    val out = QualityFilters.tokenBudgetMixture(df, col("doc_id"), col("text"),
      q, col("source"), budgetPermille = Map("A" -> 600, "B" -> 400),
      totalBudget = 10L)
      .orderBy("doc_id").select("doc_id", "source", "cum_tokens")
      .as[(Long, String, Long)].collect().toList
    assert(out == List((1L, "A", 4L), (3L, "B", 3L)), s"got $out")
    intercept[IllegalArgumentException] {
      QualityFilters.tokenBudgetMixture(df, col("doc_id"), col("text"), q,
        col("source"), Map("A" -> 1200), 10L)
    }
  }

  test("tokenBudgetSelect agrees with the global-window formulation on testdata") {
    import graft.text.TextAnalysis
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = TextAnalysis.tokens(col("text"))
    val q = round(size(array_distinct(toks)).cast("double") / size(toks), 6)
    val fast = QualityFilters.tokenBudgetSelect(docs, col("doc_id"), col("text"),
      q, budget = 800L).orderBy("doc_id").collect().toSeq
    // the formulation the operator refuses at scale — fine on 50 rows
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val slow = docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"), q.as("q"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= 800L)
      .select("doc_id", "n_tokens", "q", "cum_tokens")
      .orderBy("doc_id").collect().toSeq
    assert(fast == slow, s"bucketed ${fast.size} rows vs global ${slow.size}")
  }

  test("leakSafeSplit: duplicate texts co-assign; buckets respect thresholds") {
    // docs 1 and 3 are byte-identical — a doc_id-keyed split could strand
    // them on opposite sides of train/test; the content key cannot
    val df = QualityFilters.leakSafeSplit(
      docs(1 -> "the cat sat", 2 -> "dogs bark loud", 3 -> "the cat sat"),
      col("text"))
    val rows = df.orderBy("doc_id")
      .select("doc_id", "split_bucket", "split")
      .as[(Int, Long, String)].collect().toList
    assert(rows(0)._2 == rows(2)._2 && rows(0)._3 == rows(2)._3,
      s"identical texts must co-assign: $rows")
    rows.foreach { case (_, b, s) =>
      assert(b >= 0 && b < 1000)
      val expect = if (b < 900) "train" else if (b < 950) "valid" else "test"
      assert(s == expect, s"bucket $b labeled $s")
    }
    intercept[IllegalArgumentException] {
      QualityFilters.leakSafeSplit(docs(1 -> "x"), col("text"),
        trainPermille = 980, validPermille = 50)
    }
  }

  test("zscoreNormalize: closed form from integer moments; constant group emits z=0") {
    // group a: 2, 4, 6 → mean 4, var (4+16+36)/3 − 16 = 56/3 − 16 = 8/3
    val df = (Seq((1L, "a", 2), (2L, "a", 4), (3L, "a", 6)) ++
      Seq((10L, "b", 7), (11L, "b", 7))).toDF("id", "src", "v")
    val out = QualityFilters.zscoreNormalize(df, col("id"), col("src"), col("v"))
      .orderBy("id")
      .as[(Long, String, Long, Double, Double, Long)].collect().toList
    // exact engine replica: s2/n − (s/n)·(s/n) with s=12, s2=56, n=3
    val std = math.sqrt(56.0 / 3 - (12.0 / 3) * (12.0 / 3))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ppm(x: Double) =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val a = out.filter(_._2 == "a")
    assert(a.forall(r => r._4 == 4.0 && r._5 == r6(std)))
    assert(a.map(_._6) == List(ppm((2 - 4.0) / std * 1e6), 0L,
      ppm((6 - 4.0) / std * 1e6)))
    // symmetric inputs give symmetric z
    assert(a(0)._6 == -a(2)._6)
    // constant group: std 0 → explicit z = 0, never NaN
    val b = out.filter(_._2 == "b")
    assert(b.forall(r => r._5 == 0.0 && r._6 == 0L))
  }

  test("winsorize: clips at interpolated group percentiles, interior values untouched") {
    // group a: values 0..10 → p25 = 2.5 (interpolated), p75 = 7.5;
    // group b: constant 5 → both bounds 5, everything clips to 5
    val df = ((0 to 10).map(v => (v.toLong, "a", v)) ++
      Seq((100L, "b", 5), (101L, "b", 5))).toDF("id", "src", "v")
    val out = QualityFilters.winsorize(df, col("id"), col("src"), col("v"),
        loPermille = 250, hiPermille = 750)
      .orderBy("id")
      .as[(Long, String, Long, Double, Double, Double)].collect().toList
    val a = out.filter(_._2 == "a")
    assert(a.forall(r => r._4 == 2.5 && r._5 == 7.5))
    assert(a.map(_._6) ==
      List(2.5, 2.5, 2.5, 3.0, 4.0, 5.0, 6.0, 7.0, 7.5, 7.5, 7.5))
    val b = out.filter(_._2 == "b")
    assert(b.forall(r => r._4 == 5.0 && r._5 == 5.0 && r._6 == 5.0))
    intercept[IllegalArgumentException] {
      QualityFilters.winsorize(df, col("id"), col("src"), col("v"),
        loPermille = 800, hiPermille = 200)
    }
  }

  test("qualityBuckets: equal-mass terciles with <= boundary; k=2 median split") {
    import spark.implicits._
    // scores 1..6: t1 = interp at (6-1)/3 ≈ 1.667 → 2.667; t2 → 4.333
    val df = (1 to 6).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val out = QualityFilters.qualityBuckets(df, col("s"),
        Seq("tail", "middle", "head"))
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "tail", 2L -> "tail", 3L -> "middle",
      4L -> "middle", 5L -> "head", 6L -> "head"))
    // k = 2: median of 1..5 is 3, and the boundary row goes LOW (<=)
    val df5 = (1 to 5).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val halves = QualityFilters.qualityBuckets(df5, col("s"),
        Seq("low", "high"))
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(halves == Map(1L -> "low", 2L -> "low", 3L -> "low",
      4L -> "high", 5L -> "high"))
  }
}
