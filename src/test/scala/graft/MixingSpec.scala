package graft

import org.apache.spark.sql.functions._
import graft.text.Mixing

class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("mixWeights: hand-computed rates; anchor source keeps everything") {
    // token mass: a=6000, b=3000, c=1000 (actual shares 0.6/0.3/0.1);
    // targets 1:1:2 → ratios 1/6, 1/3, 2 → anchor c (rate 1), a = (1/6)/2,
    // b = (1/3)/2; integer micro-units, FLOOR division (pure-integer
    // emission): b = 250·1000·10⁶ div (500·3000) = 166666, not 166667
    val docs = Seq(
      ("a", 4000L), ("a", 2000L), ("b", 3000L), ("c", 1000L))
      .toDF("source", "nt")
    val out = Mixing.mixWeights(docs, col("source"), col("nt"),
        targetPermille = Map("a" -> 250, "b" -> 250, "c" -> 500))
      .orderBy("source")
      .select("source", "n_docs", "n_tokens", "actual_share_ppm",
        "target_share_ppm", "sample_rate_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out(0) == (("a", 2L, 6000L, 600000L, 250000L, 83333L)))
    assert(out(1) == (("b", 1L, 3000L, 300000L, 250000L, 166666L)))
    assert(out(2) == (("c", 1L, 1000L, 100000L, 500000L, 1000000L)))
  }

  test("mixWeights: exactly tied max ratios cannot change any emitted rate") {
    // a and b tie exactly on tgt/n (300/600 ≡ 150/300 as rationals): the
    // argmax tie-break picks one, but every rate is the floor of an exact
    // rational, so WHICH of the tied pair anchors is unobservable
    val docs = Seq(("a", 600L), ("b", 300L), ("c", 2100L))
      .toDF("source", "nt")
    val out = Mixing.mixWeights(docs, col("source"), col("nt"),
        targetPermille = Map("a" -> 300, "b" -> 150, "c" -> 550))
      .select("source", "sample_rate_ppm").as[(String, Long)].collect().toMap
    assert(out("a") == 1000000L && out("b") == 1000000L)
    // c: (550/2100) / (300/600) = 550·600·10⁶ div (300·2100) = 523809
    assert(out("c") == 523809L)
  }

  test("temperatureWeights: closed form at T=2; flattening direction; zero-mass source") {
    // token mass: a=900, b=100, z=0 → p = 0.9/0.1/0; √p̄ flattens 9:1 to
    // 3:1. Mirror the engine exactly: w = FLOOR(√(n/Σn)·10⁶) (floor of
    // the binary double), then integer floor division throughout.
    val docs = Seq(("a", 900L), ("b", 100L), ("z", 0L)).toDF("source", "nt")
    val wa = math.floor(math.sqrt(900.0 / 1000) * 1e6).toLong
    val wb = math.floor(math.sqrt(100.0 / 1000) * 1e6).toLong
    val zn = wa + wb
    def fdiv(n: BigInt, d: BigInt): Long = (n / d).toLong
    val out = Mixing.temperatureWeights(docs, col("source"), col("nt"))
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out(0) == (("a", 1L, 900L, 900000L,
      fdiv(BigInt(wa) * 1000000, zn),
      fdiv(BigInt(wa) * 1000 * 1000000, BigInt(zn) * 900))))
    assert(out(1) == (("b", 1L, 100L, 100000L,
      fdiv(BigInt(wb) * 1000000, zn),
      fdiv(BigInt(wb) * 1000 * 1000000, BigInt(zn) * 100))))
    // zero-mass source: all derived columns explicit 0, never NaN
    assert(out(2) == (("z", 1L, 0L, 0L, 0L, 0L)))
    // flattening: minority boosted above 1, majority damped below 1
    assert(out(1)._6 > 1000000L && out(0)._6 < 1000000L)
    // temperature shares are 3:1 (±1 ppm rounding), vs natural 9:1
    assert(math.abs(out(0)._5 - 3 * out(1)._5) <= 3)
  }

  test("realizeMixture: integer rates copy exactly; fractional rates follow the hash gate") {
    import graft.sim.Ivf.{PickA, PickB, PickP}
    // token mass: a=100 (share 0.25), b=300 (share 0.75); targets 750/250
    // → rate_a = 0.75/0.25 = 3.0 (3 copies each), rate_b = 1/3 → 333333 ppm
    val docs = ((0L until 10L).map(i => (i, "a", 10L)) ++
      (10L until 40L).map(i => (i, "b", 10L))).toDF("doc_id", "source", "nt")
    val out = Mixing.realizeMixture(docs, col("doc_id"), col("source"),
        col("nt"), targetPermille = Map("a" -> 750, "b" -> 250))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val a = out.filter(_._2 == "a")
    assert(a.forall(_._3 == 3000000L))
    (0L until 10L).foreach { id =>
      assert(a.filter(_._1 == id).map(_._4).sorted.toSeq == Seq(0L, 1L, 2L)) }
    // b docs: one copy iff the affine ppm bucket clears the 333333 frac
    val b = out.filter(_._2 == "b")
    assert(b.forall(r => r._3 == 333333L && r._4 == 0L))
    val expected = (10L until 40L).filter { id =>
      ((id % PickP) * PickA + PickB) % PickP % 1000000L < 333333L }.toSet
    assert(b.map(_._1).toSet == expected && expected.nonEmpty)
    // deterministic end to end
    val again = Mixing.realizeMixture(docs, col("doc_id"), col("source"),
        col("nt"), targetPermille = Map("a" -> 750, "b" -> 250))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("mixWeights: a zero-token source with a positive target cannot poison the normalizer") {
    // target/0 would be Infinity -> max ratio Infinity -> every OTHER
    // source silently zeroed; the zero-mass source must get rate 0 instead
    val docs = Seq(("a", 0L), ("b", 100L)).toDF("source", "nt")
    val out = Mixing.mixWeights(docs, col("source"), col("nt"),
        targetPermille = Map("a" -> 500, "b" -> 500))
      .select("source", "sample_rate_ppm").as[(String, Long)].collect().toMap
    assert(out("a") == 0L, "zero-mass source must not sample")
    assert(out("b") == 1000000L, "the only massive source must keep everything")
  }

  test("mixWeights: unlisted sources take the default; target 0 drops outright") {
    val docs = Seq(("x", 100L), ("y", 100L)).toDF("source", "nt")
    val out = Mixing.mixWeights(docs, col("source"), col("nt"),
        targetPermille = Map("x" -> 500), defaultPermille = 0)
      .select("source", "sample_rate_ppm").as[(String, Long)].collect().toMap
    assert(out("x") == 1000000L && out("y") == 0L)
  }

  test("mixWeights: all-zero ratio mass emits explicit rate 0, never NaN") {
    // every ratio 0 (all targets 0) → __maxr = 0 → 0/0 would be NaN, which
    // is false under every `<` threshold and silently drops NOTHING; the
    // guard must emit the documented rate-0 drop instead
    val docs = Seq(("a", 100L), ("b", 200L)).toDF("source", "nt")
    val out = Mixing.mixWeights(docs, col("source"), col("nt"),
        targetPermille = Map.empty, defaultPermille = 0)
      .select("source", "sample_rate_ppm").as[(String, Long)].collect().toMap
    assert(out("a") == 0L && out("b") == 0L)
  }

  test("largestRemainder: allocations sum to the budget EXACTLY") {
    // masses 3/3/3 with budget 10: floor quotas 3/3/3 (sum 9), one extra
    // unit to the largest remainder — ties break by stratum ascending
    val df = Seq(("a", 3L), ("b", 3L), ("c", 3L)).toDF("s", "m")
    val out = Mixing.largestRemainder(df, col("s"), col("m"), budget = 10L)
      .orderBy("stratum").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 3L, 4L), ("b", 3L, 3L), ("c", 3L, 3L)))
  }

  test("largestRemainder: each alloc is within 1 of its exact quota") {
    val df = Seq(("a", 17L), ("b", 5L), ("c", 31L), ("d", 2L), ("e", 45L))
      .toDF("s", "m")
    val out = Mixing.largestRemainder(df, col("s"), col("m"), budget = 97L)
      .as[(String, Long, Long)].collect().toSeq
    assert(out.map(_._3).sum == 97L)
    val tot = out.map(_._2).sum
    out.foreach { case (s, m, alloc) =>
      val exact = 97.0 * m / tot
      assert(math.abs(alloc - exact) < 1.0,
        s"$s: alloc $alloc vs quota $exact")
    }
  }

  test("largestRemainder: zero-mass strata never win an extra unit") {
    val df = Seq(("a", 7L), ("b", 0L), ("c", 6L)).toDF("s", "m")
    val out = Mixing.largestRemainder(df, col("s"), col("m"), budget = 9L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out("b") == 0L)
    assert(out.values.sum == 9L)
  }

  test("largestRemainder: rows aggregate per stratum before apportioning") {
    val rows = Seq(("a", 2L), ("a", 5L), ("b", 3L)).toDF("s", "m")
    val out = Mixing.largestRemainder(rows, col("s"), col("m"), budget = 10L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map("a" -> 7L, "b" -> 3L))
  }

  test("balancedSample: quotas realize exactly, thin stratum under-fills visibly") {
    // masses 50/30/20 on budget 10 → quotas 5/3/2; stratum c holds only
    // ONE document, so it keeps 1 < alloc 2 — the shortfall is visible
    val docs = ((1 to 10).map(i => (i.toLong, "a", 5L)) ++
      (21 to 30).map(i => (i.toLong, "b", 3L)) ++
      Seq((31L, "c", 20L))).toDF("doc_id", "lang", "n_chars")
    val out = Mixing.balancedSample(docs, col("doc_id"),
        col("lang"), col("n_chars"), budget = 10L)
      .as[(Long, String, Long, Long)].collect().toSeq
    val byLang = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLang == Map("a" -> 5, "b" -> 3, "c" -> 1))
    assert(out.forall(r => r._4 <= r._3), "rank must respect the quota")
    assert(out.filter(_._2 == "c").head._3 == 2L, "c's alloc stays 2")
    // determinism: a second run picks the same ids
    val again = Mixing.balancedSample(docs, col("doc_id"),
        col("lang"), col("n_chars"), budget = 10L)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out.map(_._1).sorted.toSeq == again.map(_._1).sorted.toSeq)
  }
}
