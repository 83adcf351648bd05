package graft

import org.apache.spark.sql.functions._
import graft.dedup.Clusters

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents merges chained pairs into one component") {
    // chain 1-2, 2-3, 3-4 plus separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Clusters.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("dropNearDuplicates keeps one representative per cluster + singletons") {
    val docs = (1L to 12L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Clusters.dropNearDuplicates(docs, col("doc_id"), pairs)
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2,3} -> keep 1; {10,11} -> keep 10; rest untouched
    assert(kept == Set(1L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 12L))
  }

  test("transitivity: A~B, B~C with no A~C pair still collapses to one representative") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Clusters.dropNearDuplicates(docs, col("doc_id"), pairs)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("connectedComponentsAlternating matches min-label on mixed clusters") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (7L, 5L))
      .toDF("id_a", "id_b")
    val minLabel = Clusters.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alt = Clusters.connectedComponentsAlternating(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt == minLabel)
  }

  test("1000-node chain: both algorithms converge in O(log n); starved budgets throw loudly") {
    // a containment-dup chain, diameter 999. Min-label alone would need
    // 999 rounds (the r8 behavior was a SILENT mislabel at round 10);
    // with pointer doubling it converges inside the default budget — and
    // a deliberately starved budget still fails LOUD, never silently.
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ml = Clusters.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ml.size == 1000 && ml.values.forall(_ == 0L))
    val e = intercept[IllegalStateException] {
      Clusters.connectedComponents(chain, maxIter = 2).count()
    }
    assert(e.getMessage.contains("did not converge"))
    val alt = Clusters.connectedComponentsAlternating(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt == ml)
  }

  test("self-loop-only ids label themselves in BOTH algorithms (contract parity)") {
    val pairs = Seq((5L, 5L), (1L, 2L), (7L, 7L)).toDF("id_a", "id_b")
    val ml = Clusters.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alt = Clusters.connectedComponentsAlternating(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ml == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 7L -> 7L))
    assert(alt == ml)
  }

  test("alternating on random graphs: components equal min-label's fixpoint") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val minLabel = Clusters.connectedComponents(pairs, maxIter = 80).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alt = Clusters.connectedComponentsAlternating(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt == minLabel)
  }

  test("keepBest: the highest-scoring member survives, not the min id") {
    val docs = Seq(
      (1L, 10L), (2L, 99L), (3L, 50L), // cluster {1,2,3}: 2 is longest
      (10L, 5L), (11L, 5L),            // tie on score -> larger id (11)
      (20L, 7L)                        // unmentioned, survives as-is
    ).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Clusters.keepBest(docs, col("doc_id"), col("n_chars"), pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 11L, 20L))
  }
}
