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

  /** A constructive merge table of arbitrary size without training:
    * symbols grow by deterministic pairwise combination of earlier
    * symbols — every rank references only singles or earlier outputs
    * (validate passes), and the chained structure (long shared prefixes)
    * is exactly the shape trained tables have.
    */
  private def syntheticTable(n: Int): Seq[(String, String)] = {
    val syms = scala.collection.mutable.ArrayBuffer[String](
      "a", "b", "c", "d", "e")
    val table = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val seen = scala.collection.mutable.Set[(String, String)]()
    var i = 0
    while (table.size < n) {
      val l = syms((i * 7 + 3) % syms.size)
      val r = syms((i * 13 + 1) % syms.size)
      if ((l + r).length <= 24 && !seen((l, r))) {
        table += ((l, r)); seen += ((l, r)); syms += l + r
      }
      i += 1
    }
    table.toSeq
  }

  /** Local reference model of the fold chain: for each rank IN ORDER, one
    * greedy-leftmost non-overlapping pass (the merged symbol never
    * re-matches its own rank — the fold's pend-reset). This is the fold's
    * semantics in ten lines; the "fold model ≡ Spark fold plan" leg is
    * pinned at 64 merges below (per-rank pass logic does not change with
    * table size), and the "native ≡ fold model" leg then runs at
    * production size where the Spark fold CANNOT: its Column tree
    * overflows a default stack in ColumnNodeToExpressionConverter below
    * 1,200 ranks, and past ~100 ranks nested-lambda resolution exceeds
    * the analyzer's maxIterations — the two walls that justify the
    * native expression.
    */
  private def sweepBpe(word: String, table: Seq[(String, String)]): Seq[String] = {
    var syms = word.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))
    for ((a, b) <- table) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("encode: Spark fold plan equals the local sweep model on random " +
    "words at 64 merges (the model-validity leg)") {
    val table = syntheticTable(64)
    Bpe.validate(table)
    val rng = new scala.util.Random(23)
    val words = (0 until 120).map(_ =>
      (1 to (1 + rng.nextInt(14))).map(_ =>
        "abcde".charAt(rng.nextInt(5))).mkString)
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val folded = Bpe.encodeFolded(df, col("doc_id"), col("text"), table)
      .orderBy("doc_id").select("bpe_text").as[String].collect().toSeq
    assert(folded == words.map(w => sweepBpe(w, table).mkString(" ")))
  }

  test("encode: native expression equals the fold semantics on random " +
    "words over a 1,200-merge constructive table (the production-size " +
    "property — the Spark fold itself cannot build a plan this size)") {
    val table = syntheticTable(1200)
    Bpe.validate(table)
    val rng = new scala.util.Random(41)
    val words = (0 until 300).map(_ =>
      (1 to (1 + rng.nextInt(14))).map(_ =>
        "abcde".charAt(rng.nextInt(5))).mkString)
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val native = Bpe.encode(df, col("doc_id"), col("text"), table)
      .orderBy("doc_id")
      .select("n_tokens", "bpe_text", "n_bpe_tokens")
      .as[(Int, String, Int)].collect().toSeq
    val expected = words.map { w =>
      val enc = sweepBpe(w, table)
      (1, enc.mkString(" "), enc.size)
    }
    assert(native == expected)
  }

  test("encode: native equals fold on a table with a RE-LEARNED pair " +
    "(duplicate (lhs,rhs) at two ranks — the multi-rank index path)") {
    // (a,b) appears at rank 0 AND rank 3. The fold runs both passes; the
    // native loop must consult the pair's FULL rank list (rank 3 is only
    // eligible once the loop has passed rank 0), not just its first rank —
    // a first-rank-only index would terminate the loop differently even
    // when the second pass is a no-op, because rank discovery drives
    // which OTHER ranks run in between.
    val table = Seq("a" -> "b", "ab" -> "c", "b" -> "a", "a" -> "b")
    val words = Seq("abc", "abab", "ababa", "ba", "baba", "aabb", "bbaa")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val native = Bpe.encode(df, col("doc_id"), col("text"), table)
      .orderBy("doc_id").select("bpe_text").as[String].collect().toSeq
    val folded = Bpe.encodeFolded(df, col("doc_id"), col("text"), table)
      .orderBy("doc_id").select("bpe_text").as[String].collect().toSeq
    assert(native == folded)
  }

  test("encode: native handles surrogate-pair code points like the fold") {
    // U+1F600 is two UTF-16 chars; Spark's split(w, "") keeps it whole,
    // and the native code-point split must agree
    val table = Seq("a" -> "b")
    val words = Seq("a😀b", "ab😀", "😀😀ab")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val native = Bpe.encode(df, col("doc_id"), col("text"), table)
      .orderBy("doc_id").select("bpe_text", "n_bpe_tokens")
      .as[(String, Int)].collect().toSeq
    val folded = Bpe.encodeFolded(df, col("doc_id"), col("text"), table)
      .orderBy("doc_id").select("bpe_text", "n_bpe_tokens")
      .as[(String, Int)].collect().toSeq
    assert(native == folded)
    assert(native.head == ("a 😀 b", 3)) // merge blocked by the emoji
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
