package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based corpus filtering — the trainable half the rule-based
  * filters (C4 rules, Gopher metrics, CCNet buckets) feed into: a
  * LOGISTIC-REGRESSION classifier over hashing-trick set-of-words
  * features, trained distributed. fastText-/DCLM-style quality,
  * topicality, and language classifiers are exactly this shape — a
  * linear model over hashed features (Joulin et al. 2016; Weinberger
  * et al. 2009 for the hashing trick), bootstrapped from WEAK labels
  * (a seed-keyword or source heuristic) and then applied corpus-wide
  * where the heuristic alone would be too narrow.
  *
  * Features are hashed PRESENCE bits ([[TextAnalysis.tokenHash]] mod
  * `dim`, set-of-words — presence, not TF, is what makes short seed
  * signals linearly separable against collision noise) plus a constant-1
  * bias slot at position `dim`. The representation is SPARSE throughout:
  * a doc is its distinct bucket-id array (∼50 longs), never a dense
  * dim+1 vector — presence features make `x·err` zero on every absent
  * bucket, so absent buckets contribute nothing to any gradient sum and
  * materializing them is pure waste. The dense formulation was measured
  * first: 600 s at sf10 (cache eviction at 2 KB/row × 500k docs plus
  * interpreted-HOF cost on 257 slots/row) vs ∼20 s sparse — a 30×
  * scale-killer hiding at small SF, where both look instant.
  *
  * Training is FULL-BATCH gradient descent: per iteration, ONE job
  * computes the gradient — explode each doc's present buckets with its
  * scalar error, partial-aggregated groupBy over ≤ dim+1 keys — and the
  * driver folds it into the weight vector (dim+1 doubles: control-flow-
  * scale state, the k-means-centroid pattern). Buckets no doc touches
  * simply don't appear — their gradient is exactly zero and their weight
  * carries over. At 100 TB nothing changes: the shuffle carries ≤ dim+1
  * keys regardless of corpus size, map-side partials do the heavy
  * summation, and the model rides back as a literal. Iterations are
  * jobs, not plan nesting — the plan never deepens (the BPE-fold
  * lesson).
  *
  * Cross-engine determinism: QUANTIZED-WEIGHT GD. After every iteration
  * the weights round to 6 decimals BEFORE re-entering the next iteration
  * as literals — the published artifact each round is the quantized
  * vector, so an oracle replaying the same quantized algorithm sees
  * identical literals every round and float drift cannot compound
  * across iterations. Within an iteration the only order-sensitive
  * arithmetic is the cross-row gradient sum (partition-order
  * reassociation ~1e-13 relative — absorbed by the 1e-6 quantum, the
  * Lloyd-refinement precedent); the per-doc dot runs in ASCENDING BUCKET
  * ORDER (the bucket array is sorted), which an oracle's dense
  * ascending-index fold reproduces term-for-term — absent buckets add
  * an exact 0.0 either way. Saturated docs are consistent too: both
  * engines' `exp` overflow to +∞ past |z|≈709, and σ degrades to
  * exactly 0 or 1 on both.
  */
object Classifier {

  /** Sorted distinct bucket ids of the doc's tokens, bias bucket `dim`
    * appended (sorted ⇒ the dot fold's float order matches a dense
    * ascending-index replay). Pure projection.
    */
  def hashedBuckets(text: Column, dim: Int): Column =
    array_sort(array_union(
      transform(split(lower(text), " "),
        t => pmod(TextAnalysis.tokenHash(t), lit(dim.toLong))),
      array(lit(dim.toLong))))

  /** `dim+1` quantized weights after `iters` full-batch GD rounds from
    * zero init (last slot = bias). One ≤(dim+1)-key aggregation job per
    * round; the sparse bucket arrays cache once across rounds.
    */
  def trainLogistic(docs: DataFrame, label: Column, text: Column,
                    dim: Int = 256, iters: Int = 10,
                    lr: Double = 20.0): Array[Double] = {
    require(dim >= 2 && iters >= 1 && lr > 0,
      s"need dim >= 2, iters >= 1, lr > 0; got dim=$dim iters=$iters lr=$lr")
    val ds = docs.select(label.cast("double").as("__y"),
      hashedBuckets(text, dim).as("__h")).cache()
    try {
      val n = ds.count()
      require(n > 0, "empty corpus")
      var w = Array.fill(dim + 1)(0.0d)
      // the gradient rollup is (dim+1)-key bounded at ANY corpus size
      // (map-side partial aggregation), so the reduce side of every round
      // is sized from dim, not the corpus; the feature map stage keeps the
      // cached frame's full parallelism (see AdaptiveIter)
      graft.ops.AdaptiveIter.sizedRounds(docs.sparkSession, dim + 1L,
          rowBytes = 32) {
      for (_ <- 1 to iters) {
        // scalar error per doc, exploded over ONLY the present buckets —
        // absent buckets have x=0 and contribute exactly nothing
        val err = sigmoid(col("__h"), w) - col("__y")
        val g = ds.select(col("__h"), err.as("__e"))
          .select(explode(col("__h")).as("pos"), col("__e"))
          .groupBy("pos").agg(sum("__e").as("g"))
          .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
        w = Array.tabulate(dim + 1) { i =>
          g.get(i).fold(w(i))(gi => quantize6(w(i) - lr * gi / n))
        }
      }
      }
      w
    } finally { ds.unpersist(); () }
  }

  /** σ(Σ_{j∈h} w_j) — the sparse dot as a sequential fold over the
    * sorted bucket array; `w` already quantized.
    */
  private def sigmoid(h: Column, w: Array[Double]): Column = {
    val wLit = array(w.map(lit).toIndexedSeq: _*)
    val dot = aggregate(h, lit(0.0d),
      (acc, b) => acc + element_at(wLit, b.cast("int") + 1))
    lit(1.0d) / (lit(1.0d) + exp(-dot))
  }

  /** Round-half-away-from-zero to 6 dp — the same semantics as SQL
    * `round(x, 6)` on both engines, applied driver-side.
    */
  private def quantize6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The trained model as a DataFrame: (pos, weight) with pos `dim` =
    * bias — the persistable artifact [[score]] replays.
    */
  def trainedWeights(docs: DataFrame, label: Column, text: Column,
                     dim: Int = 256, iters: Int = 10,
                     lr: Double = 20.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainLogistic(docs, label, text, dim, iters, lr)
      .zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("pos", "weight")
  }

  /** Per-doc classifier score σ(w·x) (round 6) — the APPLY side: a pure
    * projection once the model is trained, zero shuffle, the shape of
    * every model-based corpus filter pass.
    */
  def score(docs: DataFrame, id: Column, text: Column,
            w: Array[Double]): DataFrame = {
    val dim = w.length - 1
    docs.select(id,
      round(sigmoid(hashedBuckets(text, dim), w), 6).as("score"))
  }
}
