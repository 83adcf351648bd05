package graft

import org.apache.spark.sql.functions._
import graft.text.Vocab

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("idf: ubiquitous token scores 0, rare token scores ln(N/df)") {
    val df = Seq((1L, "cat dog cat"), (2L, "cat bird"), (3L, "cat fish"))
      .toDF("doc_id", "text")
    val out = Vocab.idf(df, col("text"))
      .orderBy("token").as[(String, Long, Double)].collect().toList
    val m = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("cat") == ((3L, 0.0)))                               // in all 3 docs
    assert(m("dog")._1 == 1L)                                     // per-doc dedup: df=1
    assert(m("dog")._2 == BigDecimal(math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.map(_._1).toSet == Set("cat", "dog", "bird", "fish"))
  }

  test("bm25TopK: matches the closed form; non-matching docs absent; k truncates") {
    val df = Seq(
      (1L, "spark spark join x y"),      // both terms
      (2L, "spark a b c d e"),           // one term
      (3L, "nothing here at all"),       // no query terms — must be absent
      (4L, "join join join join"))       // saturating tf
      .toDF("doc_id", "text")
    // N=4, df(spark)=df(join)=2 → idf = round(ln(1 + 2.5/2.5), 6)
    val idf6 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val avgdl = (5 + 6 + 4 + 4) / 4.0
    def term(tf: Double, len: Long): Long =
      math.round(idf6 * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avgdl))) * 1e6)
    val out = Vocab.bm25TopK(df, col("doc_id"), col("text"),
      queryTerms = Seq("spark", "join"), k = 10)
      .as[(Long, Int, Long)].collect().toList
    val expected = List(
      1L -> (2, term(2, 5) + term(1, 5)),
      4L -> (1, term(4, 4)),
      2L -> (1, term(1, 6)))
      .sortBy { case (id, (_, s)) => (-s, id) }
      .map { case (id, (n, s)) => (id, n, s) }
    assert(out == expected)
    assert(!out.exists(_._1 == 3L))
    val top1 = Vocab.bm25TopK(df, col("doc_id"), col("text"),
      queryTerms = Seq("spark", "join"), k = 1)
      .as[(Long, Int, Long)].collect().toList
    assert(top1 == expected.take(1))
  }

  test("topNgrams: counts rank correctly; ties break by ngram; short docs yield none") {
    val df = Seq(
      (1L, "a b a b c"),    // bigrams: "a b"×2, "b a", "b c"
      (2L, "a b z"),        // "a b", "b z"
      (3L, "q"))            // shorter than n — contributes nothing
      .toDF("doc_id", "text")
    val top = Vocab.topNgrams(df, col("text"), n = 2, k = 3)
      .as[(String, Long)].collect().toList
    assert(top.head == (("a b", 3L)))
    assert(top.tail.map(_._2).forall(_ == 1L))
    assert(top.tail.map(_._1) == top.tail.map(_._1).sorted)       // tie order
  }

  test("topNgrams: n=3 composes interior tokens, n=1 counts tokens") {
    val df = Seq((1L, "x y z x y z")).toDF("doc_id", "text")
    val tri = Vocab.topNgrams(df, col("text"), n = 3, k = 2)
      .as[(String, Long)].collect().toList
    assert(tri.head == (("x y z", 2L)))
    val uni = Vocab.topNgrams(df, col("text"), n = 1, k = 1)
      .as[(String, Long)].collect().toList
    assert(uni.head._2 == 2L)
  }

  test("contamination: distinct shared n-grams per train doc, short docs immune") {
    val eval_ = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x alpha beta gamma y beta gamma delta z"), // shares 2 distinct trigrams
      (2L, "alpha beta gamma alpha beta gamma"),       // repeated gram counts ONCE
      (3L, "nothing in common here at all"),
      (4L, "beta gamma"))                              // shorter than n
      .toDF("doc_id", "text")
    val out = Vocab.contamination(train, eval_, col("doc_id"), col("text"), n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("contamination broadcasts the eval grams (train side never pre-shuffles)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val p = Vocab.contamination(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
  }

  test("tfidfTopK: rare distinguishing terms outrank ubiquitous ones") {
    val df = Seq(
      (1L, "common common rare1"),
      (2L, "common other words"),
      (3L, "common more stuff"))
      .toDF("doc_id", "text")
    val top = Vocab.tfidfTopK(df, col("doc_id"), col("text"), k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("token", "tfidf", "rank").as[(String, Double, Int)].collect()
    // 'common' appears in all docs → idf 0 → tfidf 0; 'rare1' wins
    assert(top(0)._1 == "rare1")
    assert(top(0)._2 > 0.0)
    val common = Vocab.tfidfTopK(df, col("doc_id"), col("text"), k = 3)
      .filter(col("token") === "common").select("tfidf").as[Double].collect()
    assert(common.forall(_ == 0.0))
  }

  test("unigramLogProb: hand-computed corpus-LM means; broadcast off agrees") {
    // corpus tokens: a×2, b×2, c×1 (total 5) → logp a = b = ln(0.4),
    // c = ln(0.2); each rounds at 6dp before the mean
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Vocab.unigramLogProb(df, col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toList
    assert(out.map(t => (t._1, t._2)) == List((1L, 3L), (2L, 2L)))
    assert(out(0)._3 == r6(r6(math.log(0.4))))                      // 3 equal terms
    assert(out(1)._3 == r6((r6(math.log(0.4)) + r6(math.log(0.2))) / 2))
    val shuffled = Vocab.unigramLogProb(df, col("doc_id"), col("text"),
      broadcastVocab = false).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toList
    assert(shuffled == out) // join strategy must not change values
  }

  test("pmiBigrams: a perfect collocation outranks an incidental pair") {
    // "ice cream" always co-occur (P(ab)=P(a)=P(b) → PMI = -log P(a) > 0);
    // "the dog" pairs incidentally among many "the X" contexts
    val docs = (
      Seq.fill(6)("ice cream is nice and the dog saw the cat by the door") ++
      Seq.fill(6)("the dog and the cat and the bird like the yard")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.text.Vocab.pmiBigrams(docs, col("text"), minCount = 5, k = 50)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.contains("ice cream") && out.contains("the dog"))
    assert(out("ice cream")._2 > out("the dog")._2)
    assert(out("ice cream")._1 == 6L)
    // PMI of the always-together pair is -ln(P("ice")) exactly
    val nTokens = docs.select(explode(split(lower(col("text")), " "))).count()
    val nBigrams = out.values.map(_._1).sum // not all bigrams — compute directly
    val bn = docs.select(explode(graft.text.Vocab.ngrams(col("text"), 2))).count()
    val expected = math.log((6.0 / bn) / ((6.0 / nTokens) * (6.0 / nTokens)))
    assert(math.abs(out("ice cream")._2 - expected) < 1e-5)
  }

  test("topNgrams plans TakeOrderedAndProject, never a global Sort") {
    val p = Vocab.topNgrams(Tables.documents(spark, "/root/testdata/sf0.001"),
      col("text")).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
  }

  test("bigramLogProb: hand-computed interpolated model values") {
    // corpus: "a b" and "a c" -> uni a=2,b=1,c=1 N=4; each bigram count 1
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("id", "text")
    val out = Vocab.bigramLogProb(df, col("id"), col("text"), 700)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val lp = math.round(math.log(0.7 * 1 / 2.0 + 0.3 * 1 / 4.0) * 1e6)
    assert(out(1L)._1 == 1L && out(1L)._2 == lp)
    assert(math.abs(out(1L)._3 - lp / 1e6) < 1e-9)
    assert(out(1L) == out(2L), "symmetric corpus, symmetric scores")
    // a doc with a single token has no bigram positions -> absent
    val short = Vocab.bigramLogProb(
      Seq((1L, "a b"), (9L, "solo")).toDF("id", "text"), col("id"), col("text"))
    assert(!short.select("id").as[Long].collect().contains(9L))
  }

  test("vocabCoverage: hand-computed prefix sizes at each target") {
    // counts: a=6, b=3, c=1 (total 10)
    val docs = Seq((1L, "a a a b"), (2L, "a a a b b c")).toDF("id", "text")
    val out = Vocab.vocabCoverage(docs, col("text"), Seq(500, 900, 1000))
      .as[(Int, Long, Long)].collect()
      .map { case (t, v, c) => t -> ((v, c)) }.toMap
    assert(out(500) == ((1L, 6L)), "a alone covers 60% >= 50%")
    assert(out(900) == ((2L, 9L)), "a+b cover 90% >= 90%")
    assert(out(1000) == ((3L, 10L)))
  }

  test("vocabCoverage: bucket-parallel ranks match the global order under ties") {
    // counts: d=5, e=5, a=4, b=2, c=2, x=1, y=1, z=1 (total 21) — ties
    // within a bit-length bucket (d/e at 5, b/c at 2, x/y/z at 1) and a
    // bucket boundary between 5 (len 3) and 4 (len 3) vs 2 (len 2):
    // global order (cnt desc, token asc) = d,e,a,b,c,x,y,z with cums
    // 5,10,14,16,18,19,20,21
    val text = Seq.fill(5)("d").mkString(" ") + " " +
      Seq.fill(5)("e").mkString(" ") + " " + Seq.fill(4)("a").mkString(" ") +
      " b b c c x y z"
    val docs = Seq((1L, text)).toDF("id", "text")
    val out = Vocab.vocabCoverage(docs, col("text"),
      Seq(200, 476, 477, 800, 953, 1000))
      .as[(Int, Long, Long)].collect()
      .map { case (t, v, c) => t -> ((v, c)) }.toMap
    assert(out(200) == ((1L, 5L)))   // 5/21 = 238‰ >= 200
    assert(out(476) == ((2L, 10L)))  // 10·1000 = 476·21 exactly
    assert(out(477) == ((3L, 14L)))
    assert(out(800) == ((5L, 18L)))  // 18/21 = 857‰
    assert(out(953) == ((8L, 21L)))  // 20/21 = 952.4‰ < 953 -> need all 8
    assert(out(1000) == ((8L, 21L)))
  }

  test("distributionDrift: identical sources drift 0, disjoint vocab drifts ~2e6") {
    // s1/s2 share one distribution; s3's vocabulary is disjoint
    val docs = Seq(
      ("s1", "a a b"), ("s2", "a a b"), ("s3", "x y z")
    ).toDF("source", "text")
    val out = Vocab.distributionDrift(docs, col("source"), col("text"))
      .as[(String, Long, Long)].collect()
      .map { case (s, n, d) => s -> ((n, d)) }.toMap
    assert(out("s1") == out("s2"))
    // global: a=4/9, b=2/9, x=y=z=1/9 each. s1: a=2/3, b=1/3, xyz absent.
    // |666666-444444| + |333333-222222| + 3·|0-111111| = 666666
    assert(out("s1")._2 == 666666L)
    // s3: xyz = 1/3 each, ab absent:
    // 3·|333333-111111| + |0-444444| + |0-222222| = 1333332
    assert(out("s3") == ((3L, 1333332L)))
  }

  test("distributionDrift: a uniform corpus has zero drift everywhere") {
    val docs = Seq(("s1", "t u v"), ("s2", "t u v"), ("s3", "v u t"))
      .toDF("source", "text")
    val out = Vocab.distributionDrift(docs, col("source"), col("text"))
    assert(out.filter(col("l1_ppm") =!= 0L).isEmpty)
  }

  test("postings: sorted gap encoding reconstructs the doc set; minDf prunes") {
    val docs = Seq((10L, "cat dog"), (3L, "cat"), (7L, "cat cat bird"))
      .toDF("doc_id", "text")
    val out = Vocab.postings(docs, col("doc_id"), col("text"), minDf = 2L)
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // cat in docs 3, 7, 10 → sorted gaps "3 4 3"; within-doc repeats
    // count once; dog/bird pruned by minDf
    assert(out == Map("cat" -> ((3L, "3 4 3"))))
    // gap prefix sums reconstruct the original posting list
    val ids = out("cat")._2.split(" ").map(_.toLong)
      .scanLeft(0L)(_ + _).drop(1).toSeq
    assert(ids == Seq(3L, 7L, 10L))
  }

  test("ngramNovelty: shared grams zero out, unique grams count once") {
    val docs = Seq(
      (1L, "a b c d"),        // grams: "a b c", "b c d"
      (2L, "a b c e"),        // grams: "a b c", "b c e"
      (3L, "x y")             // too short — no grams, no output row
    ).toDF("doc_id", "text")
    val out = Vocab.ngramNovelty(docs, col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // each doc: 2 grams, 1 unique ("a b c" is shared) → 500000 ppm
    assert(out == Seq((1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L)))
  }

  test("ngramNovelty: repeated gram within one doc counts once for df") {
    // doc 1 "a b a b a" → 3 gram POSITIONS but 2 DISTINCT grams
    // {"a b a", "b a b"}; doc 2 shares "a b a" (df=2), "b a b" stays
    // unique to doc 1 (df=1 — the within-doc repeat did not inflate it)
    val docs = Seq((1L, "a b a b a"), (2L, "a b a")).toDF("doc_id", "text")
    val out = Vocab.ngramNovelty(docs, col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L, 500000L), (2L, 1L, 0L, 0L)))
  }

  test("vocabGrowth: first-appearance bucketing, cumulative, gram mode") {
    // 4 docs in 2 buckets (ids 0-1 → bucket 0, 2-3 → bucket 1)
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "a b d"), (3L, "e"))
      .toDF("doc_id", "text")
    val uni = Vocab.vocabGrowth(docs, col("doc_id"), col("text"),
        nBuckets = 2)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    // bucket 0 introduces {a, b, c}; bucket 1 adds {d, e}
    assert(uni == Seq((0L, 3L, 3L), (1L, 2L, 5L)))
    val bi = Vocab.vocabGrowth(docs, col("doc_id"), col("text"),
        nBuckets = 2, gram = 2)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    // bigrams: b0 {"a b", "a c"}; b1 adds {"b d"} ("a b" already seen;
    // "e" too short for a bigram)
    assert(bi == Seq((0L, 2L, 2L), (1L, 1L, 3L)))
  }

  test("rerankByCosine: exact cosine reorders the recall set, top-k only") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),   // the query vector
      (1L, Array(0.2f, 1f, 0f, 0f), 0),
      (2L, Array(1f, 0.1f, 0f, 0f), 0), // best cosine, worst bm25 rank
      (3L, Array(0f, 0f, 1f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val cand = Seq((1L, 1), (3L, 2), (2L, 3)).toDF("doc_id", "bm25_rank")
    val out = graft.sim.Similarity.rerankByCosine(cand, "doc_id", emb,
        emb.filter(col("vec_id") === 0), k = 2)
      .orderBy("rerank")
      .as[(Long, Int, Double, Int)].collect().toSeq
    assert(out.map(_._1) == Seq(2L, 1L))         // cosine order, not bm25
    assert(out.map(_._2) == Seq(3, 1))           // upstream rank carried
    assert(out.head._3 > out(1)._3)
  }

  test("termBurstiness: bursty term outranks uniform, exact Fano micro") {
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "x y"),
      (3L, "y")
    ).toDF("doc_id", "text")
    val out = Vocab.termBurstiness(docs, col("doc_id"), col("text"),
        minDf = 1L, k = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // x: df=2, c={3,1} → (2·10 − 16)·1e6 / (2·4) = 500000
    // y: df=3, c={1,1,1} → uniform ⇒ exactly 0
    assert(out == Seq(("x", 2L, 4L, 500000L), ("y", 3L, 3L, 0L)))
  }

  test("termBurstiness: minDf prunes, top-k cuts on (fano desc, term)") {
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = Vocab.termBurstiness(docs, col("doc_id"), col("text"),
        minDf = 2L, k = 1)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq("b")) // 'a' has df=1 → pruned
  }

  test("phraseSearch: consecutive-token matches, 0-based first position") {
    val docs = Seq(
      (1L, "the hash join beats the hash join here"), // 2 matches @ 1, 5
      (2L, "hash and join but never adjacent"),       // no match
      (3L, "HASH JOIN uppercase"),                    // lowercased match @ 0
      (4L, "hash"),                                   // shorter than phrase
      (5L, "join hash")                               // wrong order
    ).toDF("doc_id", "text")
    val out = Vocab.phraseSearch(docs, col("doc_id"), col("text"),
        Seq("hash", "join"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L), (3L, 1L, 0L)))
  }

  test("phraseSearch: overlapping occurrences and zero-shuffle plan") {
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val q = Vocab.phraseSearch(docs, col("doc_id"), col("text"),
      Seq("a", "a"))
    val out = q.as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 0L))) // positions 0, 1, 2 all match
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      "phrase scan must not shuffle")
  }

  test("frequencySpectrum: power-of-two bands, exact ppm shares") {
    // frequencies: a→4 (band 3), b→2, c→3 (band 2), d→1 (band 1)
    val docs = Seq(
      (1L, "a a b c"), (2L, "a a b c c d")
    ).toDF("doc_id", "text")
    val out = Vocab.frequencySpectrum(docs, col("text"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out == Map(
      1L -> ((1L, 1L, 250000L, 100000L)),  // d
      2L -> ((2L, 5L, 500000L, 500000L)),  // b, c
      3L -> ((1L, 4L, 250000L, 400000L)))) // a
  }

  test("frequencySpectrum: empty tokens dropped, one data-scale shuffle") {
    val docs = Seq((1L, "x  x"), (2L, "")).toDF("doc_id", "text")
    val q = Vocab.frequencySpectrum(docs, col("text"))
    val out = q.as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L, 2L, 1000000L, 1000000L)))
  }

  test("zipfCoverage: exact ppm at each cutoff, undersized vocab saturates") {
    // counts: a=4, b=2, c=1, d=1 → total 8; rank order a,b,c,d
    val docs = Seq((1L, "a a b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val out = Vocab.zipfCoverage(docs, col("text"), cutoffs = Seq(1, 2, 10))
      .orderBy("cutoff")
      .select("cutoff", "n_types", "covered_tokens", "total_tokens",
        "coverage_ppm")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1, 1L, 4L, 8L, 500000L),
      (2, 2L, 6L, 8L, 750000L),
      // only 4 types exist: the cutoff-10 row covers everything
      (10, 4L, 8L, 8L, 1000000L)))
  }

  test("zipfCoverage: rank ties break on the token, deterministically") {
    // b and c tie at 2; rank by (count desc, token asc) → cutoff 2 = a,b
    val docs = Seq((1L, "a a a b b c c")).toDF("doc_id", "text")
    val out = Vocab.zipfCoverage(docs, col("text"), cutoffs = Seq(2))
      .select("covered_tokens").as[Long].head()
    assert(out == 5L)
  }
}
