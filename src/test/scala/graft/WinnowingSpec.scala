package graft

import org.apache.spark.sql.functions._
import graft.dedup.Winnowing

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def words(s: String) = s.trim.split("\\s+").toSeq

  test("winnowing guarantee: a shared run of w+k-1 tokens yields a shared fingerprint") {
    // k=4, w=5: any shared 8-token run must produce >= 1 common (hash) pick
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"p q r s t u $shared v w")).toDF("id", "text")
    val fp = Winnowing.fingerprints(df, col("id"), col("text"), k = 4, w = 5)
    val h1 = fp.filter(col("id") === 1).select("gram_hash").as[Long].collect().toSet
    val h2 = fp.filter(col("id") === 2).select("gram_hash").as[Long].collect().toSet
    assert((h1 & h2).nonEmpty, "shared run must yield a shared selected hash")
  }

  test("selection is sparse but covers every window") {
    val text = (1 to 60).map(i => s"tok${i % 23}").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val sel = Winnowing.fingerprints(df, col("id"), col("text"), k = 4, w = 5)
      .select("pos").as[Long].collect().sorted
    val nGrams = 60 - 4 + 1
    assert(sel.length < nGrams, "winnowing must select fewer than all grams")
    // every w-window [j, j+4] contains a selected position
    (0 to nGrams - 5).foreach { j =>
      assert(sel.exists(p => p >= j && p <= j + 4), s"window at $j uncovered")
    }
  }

  test("tie-break picks the rightmost minimum") {
    // all tokens equal -> every gram hash identical -> each window's pick
    // is its RIGHTMOST position: selected = {w-1, w, ..., nGrams-1}
    val df = Seq((1L, Seq.fill(12)("same").mkString(" "))).toDF("id", "text")
    val sel = Winnowing.fingerprints(df, col("id"), col("text"), k = 4, w = 5)
      .select("pos").as[Long].collect().toSet
    val nGrams = 12 - 4 + 1 // 9
    assert(sel == (4L until nGrams.toLong).toSet)
  }

  test("nearDupCandidates: shared passages pair up, unrelated docs don't") {
    val passage = (1 to 20).map(i => s"shared$i").mkString(" ")
    val df = Seq(
      (1L, s"intro one two three $passage outro alpha beta"),
      (2L, s"different lead-in tokens here $passage and a tail"),
      (3L, (1 to 30).map(i => s"noise${i * 7}").mkString(" "))).toDF("id", "text")
    val pairs = graft.dedup.Winnowing.nearDupCandidates(df, col("id"),
        col("text"), minShared = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("nearDupCandidates: result-identical across salts; boilerplate cap drops hot hashes") {
    val passage = (1 to 16).map(i => s"boiler$i").mkString(" ")
    val df = (1L to 5L).map(i => (i, s"doc$i unique${i * 3} $passage tail$i"))
      .toDF("id", "text")
    val base = graft.dedup.Winnowing.nearDupCandidates(df, col("id"),
        col("text"), minShared = 1, salt = 1)
      .as[(Long, Long, Long)].collect().toSet
    for (s <- Seq(2, 5)) {
      val v = graft.dedup.Winnowing.nearDupCandidates(df, col("id"),
          col("text"), minShared = 1, salt = s)
        .as[(Long, Long, Long)].collect().toSet
      assert(v == base, s"salt=$s diverged")
    }
    // hashes shared by all 5 docs exceed maxBucket=4 -> dropped, and the
    // only shared content IS the boilerplate passage -> no pairs survive
    val capped = graft.dedup.Winnowing.nearDupCandidates(df, col("id"),
      col("text"), minShared = 1, maxBucket = 4)
    assert(capped.count() == 0)
  }

  test("kernel ≡ HOF specification: bit-identical (id, gram_hash, pos) sets") {
    // adversarial corpus: multi-space (empty tokens), leading/trailing
    // spaces, unicode incl. a surrogate pair, case folding, all-equal
    // tokens (rightmost tie-break), exact-boundary lengths, and a seeded
    // random slab
    val rnd = new scala.util.Random(7)
    val randomDocs = (100L to 130L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(60))(s"w${rnd.nextInt(9)}").mkString(" "))
    }
    val docs = Seq(
      (1L, "Alpha  beta GAMMA  delta epsilon zeta eta theta iota"),
      (2L, "  leading and trailing spaces one two three four five six  "),
      (3L, "héllo wörld ünïcode ÆØÅ ß straße 𝄞 clef note more toks"),
      (4L, Seq.fill(15)("same").mkString(" ")),
      (5L, "a b c d e f g"), // 7 tokens: below k+w-1, dropped
      (6L, "a b c d e f g h"), // exactly one window
      (7L, "")) ++ randomDocs
    val df = docs.toDF("id", "text")
    for ((k, w) <- Seq((4, 5), (1, 1), (2, 3), (5, 2))) {
      val kernel = Winnowing.fingerprints(df, col("id"), col("text"), k, w)
        .as[(Long, Long, Long)].collect().toSet
      val hof = Winnowing.fingerprintsHof(df, col("id"), col("text"), k, w)
        .as[(Long, Long, Long)].collect().toSet
      assert(kernel == hof, s"kernel diverged from HOF spec at k=$k w=$w")
    }
    // distinct-hash mode ≡ fingerprints.select(id, gram_hash).distinct()
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    val kernelHashes = df.select(col("id"), explode(asColumn(
        graft.functions.WinnowFingerprints(asExpression(col("text")), 4, 5,
          distinctHashes = true))).as("gram_hash"))
      .as[(Long, Long)].collect()
    val expected = Winnowing.fingerprintsHof(df, col("id"), col("text"), 4, 5)
      .select("id", "gram_hash").distinct().as[(Long, Long)].collect().toSet
    assert(kernelHashes.toSet == expected)
    assert(kernelHashes.length == expected.size, "per-doc hashes not distinct")
  }

  test("docs without a complete window are dropped") {
    val df = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g h"))
      .toDF("id", "text") // 7 tokens < k+w-1=8; 8 tokens = exactly one window
    val out = Winnowing.fingerprints(df, col("id"), col("text"), k = 4, w = 5)
    assert(out.select("id").distinct().as[Long].collect().toSeq == Seq(2L))
    assert(out.count() == 1, "one window -> exactly one selected fingerprint")
  }
}
