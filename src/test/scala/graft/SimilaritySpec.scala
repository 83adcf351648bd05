package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("indexShadow: zero-overlap queries kept, shares over the probe set") {
    val a = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("query_id", "neighbor_id")
    val b = Seq((1L, 10L), (1L, 11L), (2L, 99L)).toDF("query_id", "neighbor_id")
    // query 3 ran in neither ranking (empty bucket) but IS a probe
    val qs = Seq(1L, 2L, 3L).toDF("query_id")
    val out = graft.sim.Similarity.indexShadow(a, b, qs)
      .orderBy("n_common")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L, 666666L), (2L, 1L, 333333L)))
  }

  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),   // close to 0
    (2L, Array(0f, 1f, 0f, 0f)),       // orthogonal to 0
    (3L, Array(-1f, 0f, 0f, 0f)),      // opposite of 0
    (4L, Array(1f, 0f, 0f, 0f))        // identical to 0
  ).toDF("vec_id", "embedding")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val sims = vecs.alias("a").crossJoin(vecs.alias("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 6).as("s"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(sims((0L, 4L)) == 1.0)
    assert(sims((0L, 2L)) == 0.0)
    assert(sims((0L, 3L)) == -1.0)
    assert(sims((0L, 1L)) > 0.99 && sims((0L, 1L)) < 1.0)
  }

  test("rrfFuse: overlap sums, single-list ids survive, ordering integer-decided") {
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val l2 = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    def c(r: Int): Long = math.round(1e6 / (60 + r))
    val out = Similarity.rrfFuse(Seq(l1, l2), k = 10)
      .as[(Long, Int, Long)].collect().toList
    val expected = List(
      (20L, 2, c(2) + c(1)),  // both lists — top fused
      (10L, 1, c(1)),
      (40L, 1, c(2)),
      (30L, 1, c(3)))
    assert(out == expected)
    assert(Similarity.rrfFuse(Seq(l1, l2), k = 2)
      .as[(Long, Int, Long)].collect().toList == expected.take(2))
  }

  test("mmrSelect penalizes redundancy: diverse candidate beats the twin; λ=1000 is plain top-k") {
    // 1 and 2 are identical twins near the query; 3 is diverse at ~45°.
    // At λ=300 the twin's sim=1.0 penalty outweighs its relevance edge:
    //   twin:    300·rel(0.99) − 700·1e6        (sim to selected twin = 1)
    //   diverse: 300·rel(0.71) − 700·sim(0.80)
    val df = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.98995f, 0.1414f)),
      (2L, Array(0.98995f, 0.1414f)),
      (3L, Array(0.7071f, 0.7071f)))
      .toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0)
    val mmr = Similarity.mmrSelect(df, q, k = 2, candidates = 3,
      lambdaPermille = 300)
      .orderBy("sel_rank").as[(Int, Long, Long)].collect().toList
    assert(mmr.map(r => (r._1, r._2)) == List((1, 1L), (2, 3L)))
    val pure = Similarity.mmrSelect(df, q, k = 2, candidates = 3,
      lambdaPermille = 1000)
      .orderBy("sel_rank").as[(Int, Long, Long)].collect().toList
    assert(pure.map(r => (r._1, r._2)) == List((1, 1L), (2, 2L)))
    val k1 = Similarity.mmrSelect(df, q, k = 1, candidates = 3,
      lambdaPermille = 300)
      .as[(Int, Long, Long)].collect().toList
    assert(k1.map(r => (r._1, r._2)) == List((1, 1L)))
  }

  test("bruteForceTopK ranks by cosine desc, excludes self, breaks ties by id") {
    val top = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, k = 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect().toSeq
    assert(top.map(_._2) == Seq(4L, 1L, 2L)) // identical, near, orthogonal
    assert(top.forall(_._1 == 0L))
    assert(top.forall(_._2 != 0L))
  }

  test("lshTopK recall on testdata: >=50% of exact top-5 found") {
    // Random (unclustered) embeddings are LSH's worst case: true top-5
    // neighbors sit at cosine ~0.4. With 4 planes × 8 tables expected
    // recall is ~0.7; assert a margin below that.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val probes = emb.filter(col("vec_id") % 20 === 0)
    val exact = Similarity.bruteForceTopK(probes, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(probes, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("semanticDedup keeps exactly one representative (the min id) per cosine cluster") {
    // two tight clusters + one singleton
    val base = Seq.fill(8)(0.0)
    def v(hot: Int, eps: Double) =
      base.zipWithIndex.map { case (_, i) => if (i == hot) 1.0f else eps.toFloat }
    val df = Seq(
      (10L, v(0, 0.00), 1), (11L, v(0, 0.01), 1), (12L, v(0, 0.02), 1),
      (20L, v(3, 0.00), 2), (21L, v(3, 0.01), 2),
      (30L, v(6, 0.00), 3))
      .toDF("vec_id", "embedding", "label")
    val kept = Similarity.semanticDedup(df, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(10L, 20L, 30L))
  }

  test("lshCandidatePairs: high recall vs exact pairs at the dedup threshold, exact precision") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.nearDupPairs(emb, emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshCandidatePairs(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision is exact by construction (candidates are cosine-verified)
    assert(lsh.subsetOf(exact))
    // 2 planes × 12 tables: per-pair candidate prob ≥ 1-(1-p²)¹² ≈ 0.998
    // at cosine 0.4 (p = 0.631 at the boundary; 12 tables halve the r4
    // 24-table candidate volume for a 0.13-expected-miss cost on ~59
    // pairs); with ~59 true pairs expect ~all found, assert ≥ 90%
    val recall = (exact intersect lsh).size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.9, s"candidate recall too low: $recall")
  }

  test("kmeansCandidatePairs: the SemDeDup scheme recalls ~90% at 3 probes, exact precision") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.nearDupPairs(emb, emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val km = Similarity.kmeansCandidatePairs(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision is exact by construction (candidates are cosine-verified)
    assert(km.subsetOf(exact))
    // measured 54/59 (91%) at 16 cells × 3 probes on this corpus; the 0.4
    // threshold is far looser than the paper's ε≈0.05, so straddling pairs
    // are expected — assert a floor under the measured value
    val recall = (exact intersect km).size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.8, s"k-means candidate recall too low: $recall")
    // volume sanity: candidates must undercut the all-pairs stage
    val nCand = Similarity.kmeansCandidatePairs(emb, -1.0).count()
    val n = emb.count()
    assert(nCand < n * (n - 1) / 4, s"candidate volume $nCand not under half of all-pairs")
  }

  test("semanticDedup via LSH pairs (d9 path): survivors vs the exact path") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.semanticDedup(emb, 0.4)
      .select("vec_id").as[Long].collect().toSet
    val lsh = Similarity.semanticDedup(emb, 0.4,
        Some(Similarity.lshCandidatePairs(emb, 0.4)))
      .select("vec_id").as[Long].collect().toSet
    // LSH pairs ⊆ exact pairs, so clusters can only SPLIT, never merge:
    // every exact survivor (cluster min) stays a survivor under LSH, and a
    // missed edge shows up as extra survivors. Recall of the dedup decision
    // = |exact| / |lsh| — assert near-complete agreement at this sf.
    assert(exact.subsetOf(lsh), "an exact survivor vanished under LSH — impossible unless pair precision broke")
    val agreement = exact.size.toDouble / lsh.size
    assert(agreement >= 0.95, s"dedup agreement too low: $agreement")
  }

  test("recallAtK: hits over exact set, missing queries score zero") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.recallAtK(exact, approx)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // q1: 2 of 3 exact found (the approx-only 99 never counts);
    // q2: approx returned nothing → 0; q3 has no exact set → no row
    assert(out == Seq((1L, 3L, 2L, 666666L), (2L, 2L, 0L, 0L)))
  }

  test("hardNegatives: same-label vectors never surface; ranking by cosine") {
    val labeled = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 1),
      (1L, Array(0.95f, 0.05f, 0f, 0f), 1),  // same label as 0 — excluded
      (2L, Array(0.9f, 0.1f, 0f, 0f), 2),    // best cross-label match
      (3L, Array(0f, 1f, 0f, 0f), 2),
      (4L, Array(-1f, 0f, 0f, 0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
        labeled.filter(col("vec_id") === 0), labeled, k = 2)
      .orderBy("rank")
      .as[(Long, Long, Int, Double, Int)].collect().toSeq
    assert(out.map(_._2) == Seq(2L, 3L))       // neighbor ids, hard first
    assert(out.map(_._3) == Seq(2, 2))         // labels differ from 1
    assert(out.head._4 > out(1)._4)            // ranked by cosine desc
  }

  test("hardNegatives: broadcast query side, no CartesianProduct") {
    val labeled = Seq((0L, Array(1f, 0f), 1), (1L, Array(0f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
    val plan = Similarity.hardNegatives(labeled, labeled, k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unexpected CartesianProduct in:\n$plan")
  }

  test("centroidDrift: integer centroids, aligned groups cosine 1, orthogonal 0") {
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(3f, 0f), 0),   // centroid (2e6, 0)
      (3L, Array(0f, 2f), 1), (4L, Array(0f, 4f), 1),   // centroid (0, 3e6)
      (5L, Array(5f, 0f), 2)                            // centroid (5e6, 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidDrift(emb, col("label"), col("embedding"))
      .orderBy("group_a", "group_b")
      .as[(Int, Int, Double)].collect().toSeq
    assert(out == Seq((0, 1, 0.0), (0, 2, 1.0), (1, 2, 0.0)))
  }

  test("centroidDrift: DIV mean truncates exactly (odd sums)") {
    val emb = Seq(
      (1L, Array(1f), 0), (2L, Array(2f), 0), // sum 3e6, n 2 → 1500000
      (3L, Array(3f), 1)
    ).toDF("vec_id", "embedding", "label")
    // cosine of two positive 1-d vectors is 1 regardless — assert via
    // the centroid magnitude instead: drift row exists and is exactly 1
    val out = Similarity.centroidDrift(emb, col("label"), col("embedding"))
      .as[(Int, Int, Double)].collect().toSeq
    assert(out == Seq((0, 1, 1.0)))
  }

  test("matryoshka: prefix truncation changes ranking, recall grades it") {
    // full 4-dim: query q favors v1 (matches dims 3-4); the 2-dim prefix
    // sees only dims 1-2, where v2 wins — truncation flips the ranking
    val emb = Seq(
      (0L, Array(1f, 0f, 1f, 1f)),  // the query
      (1L, Array(0f, 0.1f, 1f, 1f)), // full-space winner, prefix-orthogonal
      (2L, Array(1f, 0.5f, 0f, 0f)) // prefix winner
    ).toDF("vec_id", "embedding")
    val probes = emb.filter(col("vec_id") === 0)
    val full = Similarity.bruteForceTopK(probes, emb, k = 1)
    val trunc = Similarity.bruteForceTopK(Similarity.matryoshka(probes, 2),
      Similarity.matryoshka(emb, 2), k = 1)
    val recall = Similarity.recallAtK(full, trunc)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(full.select("neighbor_id").as[Long].collect().toSeq == Seq(1L))
    assert(trunc.select("neighbor_id").as[Long].collect().toSeq == Seq(2L))
    assert(recall == Seq((0L, 1L, 0L, 0L))) // top-1 disagrees → recall 0
  }

  test("dimStats: exact integer micro moments per dimension") {
    val emb = Seq(
      (1L, Array(1.0f, -0.5f)),
      (2L, Array(0.0f, -0.5f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.dimStats(emb, col("embedding"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // dim 0: micros {1000000, 0} → mean 500000,
    //   var = (10¹² − (10⁶)² DIV 2) DIV 2 = 250000000000, zeros 1/2
    assert(out(0L) == ((0L, 2L, 500000L, 250000000000L, 0L, 1000000L,
      500000L)))
    // dim 1: constant −0.5 → negative mean exact, zero variance
    assert(out(1L) == ((1L, 2L, -500000L, 0L, -500000L, -500000L, 0L)))
  }

  test("knnClassify: majority vote with (votes desc, label asc) tie-break") {
    // 2-D unit-ish vectors: probe 100 at angle 0; neighbors at small
    // angles labeled 1,1,2 -> vote 1; far vector labeled 3 excluded by k=3
    val emb = Seq(
      (100L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(0.999f, 0.045f), 1),
      (2L, Seq(0.998f, 0.063f), 1),
      (3L, Seq(0.997f, 0.077f), 2),
      (4L, Seq(-1.0f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb.filter(col("vec_id") === 100),
        emb, k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L)))
  }

  test("knnClassify: vote tie resolves to the smallest label") {
    val emb = Seq(
      (100L, Seq(1.0f, 0.0f), 9),
      (1L, Seq(0.999f, 0.045f), 5),
      (2L, Seq(0.998f, 0.063f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb.filter(col("vec_id") === 100),
        emb, k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // one vote each for 5 and 2: smallest label wins
    assert(out == Seq((9L, 2L, 1L)))
  }
}
