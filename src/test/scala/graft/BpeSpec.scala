package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Seq("s" -> "c", "a" -> "n", "sc" -> "an", "j" -> "o",
    "i" -> "n", "jo" -> "in", "r" -> "o", "ro" -> "w", "h" -> "a",
    "l" -> "l", "s" -> "h")

  private def enc(words: String*): Seq[String] = {
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    Bpe.encode(df, col("doc_id"), col("text"), merges)
      .orderBy("doc_id")
      .select("bpe_text").as[String].collect().toSeq
  }

  test("encode: chained merges build scan/join; partial merges stay subwords") {
    assert(enc("scan", "join", "hash", "window", "slow") ==
      Seq("scan", "join", "ha sh", "w in d o w", "s l o w"))
  }

  test("encode: same-symbol runs merge greedy-leftmost non-overlapping") {
    // l l l l l → ll ll l (never the overlapping l·ll·ll)
    assert(enc("lllll") == Seq("ll ll l"))
  }

  test("validate: rejects a merge table that references unbuilt symbols") {
    val err = intercept[IllegalArgumentException] {
      Bpe.validate(Seq("c" -> "ab", "a" -> "b")) // ab referenced before built
    }
    assert(err.getMessage.contains("no earlier merge builds"))
  }

  /** True BPE: repeatedly merge the LOWEST-rank pair present (all its
    * occurrences, leftmost non-overlapping) until none applies.
    */
  private def trueBpe(word: String,
                      table: Seq[(String, String)]): Seq[String] = {
    val rank = table.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      val present = syms.zip(syms.tail).flatMap(rank.get)
      if (present.isEmpty) done = true
      else {
        val (a, b) = table(present.min)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  test("encode: empty words (double spaces, edges, empty text) drop cleanly") {
    val table = Seq("a" -> "b")
    val df = Seq(
        (1L, "ab  ab"),   // double space
        (2L, " ab "),     // leading + trailing
        (3L, ""),         // empty text
        (4L, "   "))      // spaces only
      .toDF("doc_id", "text")
    val got = Bpe.encode(df, col("doc_id"), col("text"), table)
      .orderBy("doc_id")
      .select("n_tokens", "bpe_text", "n_bpe_tokens")
      .as[(Int, String, Int)].collect().toSeq
    assert(got == Seq((2, "ab ab", 2), (1, "ab", 1), (0, "", 0), (0, "", 0)))
  }

  test("encode: rank-ascending sweep equals iterate-to-fixpoint BPE " +
    "on random words over a chain-heavy constructive table") {
    val table = Seq("a" -> "b", "b" -> "c", "ab" -> "c", "c" -> "a",
      "ab" -> "ab", "abc" -> "bc")
    Bpe.validate(table)
    val rng = new scala.util.Random(7)
    val alphabet = "abc"
    val words = (0 until 80).map(_ =>
      (1 to (1 + rng.nextInt(9))).map(_ =>
        alphabet(rng.nextInt(3))).mkString)
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Bpe.encode(df, col("doc_id"), col("text"), table)
      .orderBy("doc_id").select("bpe_text").as[String].collect().toSeq
    val expected = words.map(w => trueBpe(w, table).mkString(" "))
    assert(got == expected)
  }

  test("train: greedy argmax with (cnt, lhs, rhs) tie-break, chained symbols") {
    // corpus: "abab" ×3, "ab" ×2 → (a,b) count 3·2+2 = 8 wins round 1;
    // round 2 sees [ab, ab] ×3 → (ab, ab) count 3.
    val df = Seq("abab abab abab ab ab").toDF("text")
      .withColumn("doc_id", lit(1L))
    val learned = Bpe.train(df, col("text"), nMerges = 2)
    assert(learned == Seq(("a", "b", 8L), ("ab", "ab", 3L)))
    // the learned table is constructive — encode accepts it
    Bpe.validate(learned.map { case (a, b, _) => (a, b) })
  }

  test("train: ties break lexicographically on (lhs, rhs)") {
    // "ba" and "ab" both appear twice as words → pairs (b,a) and (a,b)
    // each count 2; (a,b) must win.
    val df = Seq("ba ab ba ab").toDF("text").withColumn("doc_id", lit(1L))
    val learned = Bpe.train(df, col("text"), nMerges = 1)
    assert(learned == Seq(("a", "b", 2L)))
  }

  test("train: stops early when no pair reaches minFreq") {
    // single-char words only → zero adjacent pairs anywhere
    val df = Seq("a b c a b").toDF("text").withColumn("doc_id", lit(1L))
    assert(Bpe.train(df, col("text"), nMerges = 5) == Seq())
    // fully-merged vocabulary exhausts below nMerges
    val df2 = Seq("ab ab").toDF("text").withColumn("doc_id", lit(1L))
    assert(Bpe.train(df2, col("text"), nMerges = 5) ==
      Seq(("a", "b", 2L)))
  }

  test("trainBatched: batch=1 is exactly serial greedy train") {
    val df = Seq((1L, "the cat sat on the mat"),
      (2L, "the cat ran to the hat"),
      (3L, "a man can fan the tan van")).toDF("doc_id", "text")
    val serial = Bpe.train(df, col("text"), nMerges = 8)
    val batched1 = Bpe.trainBatched(df, col("text"), nMerges = 8, batch = 1)
    assert(batched1 == serial)
  }

  test("trainBatched: batched == serial when rounds cannot interact " +
    "(disjoint-alphabet corpus), at a fraction of the rounds") {
    // every word is exactly 2 symbols over disjoint alphabets with strictly
    // separated counts — a merge consumes its whole word, so no merge can
    // create a new pair or change another pair's count: the serial and
    // batched schedules provably coincide here, making the equality a real
    // check of selection order, counts, and batch application
    val words = Seq("ab" -> 50, "cd" -> 40, "ef" -> 30, "gh" -> 20, "ij" -> 10)
    val corpus = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val df = Seq((1L, corpus)).toDF("doc_id", "text")
    val serial = Bpe.train(df, col("text"), nMerges = 5)
    val batched = Bpe.trainBatched(df, col("text"), nMerges = 5, batch = 4)
    assert(serial == words.map { case (w, n) =>
      (w.take(1), w.drop(1), n.toLong) })
    assert(batched == serial)
  }

  test("trainBatched: within-batch picks are symbol-disjoint and the " +
    "table stays constructive (encode-safe)") {
    val df = Seq((1L, "the cat sat on the mat the rat"),
      (2L, "then that this the other thing")).toDF("doc_id", "text")
    val learned = Bpe.trainBatched(df, col("text"), nMerges = 10, batch = 4)
    assert(learned.size == 10)
    // constructive: validate() enforces rank-r symbols exist before rank r
    Bpe.validate(learned.map { case (a, b, _) => (a, b) })
    // the first pick is always the global argmax — identical to serial's
    assert(learned.head == Bpe.train(df, col("text"), nMerges = 1).head)
    // encode accepts the table and strictly compresses the corpus
    val out = Bpe.encode(df, col("doc_id"), col("text"),
        learned.map { case (a, b, _) => (a, b) })
      .agg(sum("n_bpe_tokens")).as[Long].head()
    val chars = df.select(sum(length(regexp_replace(col("text"), " ", ""))))
      .as[Long].head()
    assert(out < chars)
  }

  test("train then encode: learned merges compress their own corpus") {
    val df = Seq((1L, "the cat sat on the mat"),
      (2L, "the cat ran to the hat")).toDF("doc_id", "text")
    val learned = Bpe.train(df, col("text"), nMerges = 6)
    assert(learned.size == 6)
    val out = Bpe.encode(df, col("doc_id"), col("text"),
        learned.map { case (a, b, _) => (a, b) })
      .agg(sum("n_bpe_tokens")).as[Long].head()
    // 44 chars total in 12 words; 6 merges must strictly compress
    assert(out < 44 - 6 && out >= 12)
  }
}
