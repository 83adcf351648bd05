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
  * signals linearly separable against collision noise) plus a trailing
  * constant-1 bias slot.
  *
  * Training is FULL-BATCH gradient descent: per iteration, ONE job
  * computes the gradient — a posexplode of the per-doc `x·(p−y)`
  * contribution vectors into a (dim+1)-key partial-aggregated groupBy —
  * and the driver folds it into the weight vector (dim+1 doubles:
  * control-flow-scale state, the k-means-centroid pattern). At 100 TB
  * nothing changes: the shuffle carries dim+1 keys regardless of corpus
  * size, map-side partials do the heavy summation, and the model rides
  * back as a literal. Iterations are jobs, not plan nesting — the plan
  * never deepens (the BPE-fold lesson).
  *
  * Cross-engine determinism: QUANTIZED-WEIGHT GD. After every iteration
  * the weights round to 6 decimals BEFORE re-entering the next iteration
  * as literals — the published artifact each round is the quantized
  * vector, so an oracle replaying the same quantized algorithm sees
  * identical literals every round and float drift cannot compound
  * across iterations. Within an iteration the only order-sensitive
  * arithmetic is the cross-row gradient sum (partition-order
  * reassociation ~1e-13 relative — absorbed by the 1e-6 quantum, the
  * Lloyd-refinement precedent); the per-doc dot product is a SEQUENTIAL
  * fold (bit-reproducible, s-family convention). Saturated docs are
  * consistent too: both engines' `exp` overflow to +∞ past |z|≈709,
  * and σ degrades to exactly 0 or 1 on both.
  */
object Classifier {

  /** Hashed set-of-words vector with the trailing bias slot: length
    * `dim + 1`, `x(j) = 1` iff some token hashes to bucket j, `x(dim) =
    * 1`. Pure projection.
    *
    * Formulated as a FOLD over the (distinct) hash array into a zero
    * vector — the hash array is the fold's collection ARGUMENT, so it
    * evaluates once per row no matter what the optimizer inlines. The
    * tempting per-bucket formulation (`transform(0..dim, j =>
    * exists(hs, _ === j))`) re-references `hs` inside a per-element
    * lambda, and Spark does not common-subexpress across lambda scopes:
    * every token re-hashes dim times — measured 38 s vs ~2 s for 20 GD
    * rounds over 5k docs. Same lesson as the BPE fold, smaller blast
    * radius.
    */
  def hashedBow(text: Column, dim: Int): Column = {
    val hs = array_distinct(transform(split(lower(text), " "),
      t => pmod(TextAnalysis.tokenHash(t), lit(dim.toLong))))
    concat(
      aggregate(hs, array_repeat(lit(0.0d), dim), (acc, h) =>
        transform(acc, (v, i) =>
          when(i.cast("long") === h, lit(1.0d)).otherwise(v))),
      array(lit(1.0d)))
  }

  /** `dim+1` quantized weights after `iters` full-batch GD rounds from
    * zero init (last slot = bias). One (dim+1)-key aggregation job per
    * round; the corpus caches once across rounds.
    */
  def trainLogistic(docs: DataFrame, label: Column, text: Column,
                    dim: Int = 256, iters: Int = 10,
                    lr: Double = 20.0): Array[Double] = {
    require(dim >= 2 && iters >= 1 && lr > 0,
      s"need dim >= 2, iters >= 1, lr > 0; got dim=$dim iters=$iters lr=$lr")
    val ds = docs.select(label.cast("double").as("__y"),
      hashedBow(text, dim).as("__x")).cache()
    try {
      var w = Array.fill(dim + 1)(0.0d)
      for (_ <- 1 to iters) {
        // the scalar (p − y) rides as an array_repeat collection argument
        // so σ's 257-slot dot fold evaluates ONCE per row, not once per
        // exploded element (same lambda-scope-CSE trap as hashedBow)
        val err = sigmoid(col("__x"), w) - col("__y")
        val g = ds
          .select(posexplode(zip_with(col("__x"),
            array_repeat(err, dim + 1), _ * _)).as(Seq("pos", "v")))
          .groupBy("pos").agg(sum("v").as("g"), count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2))))
          .toMap
        require(g.size == dim + 1, s"gradient lost slots: ${g.size}")
        w = Array.tabulate(dim + 1) { i =>
          val (gi, n) = g(i)
          quantize6(w(i) - lr * gi / n)
        }
      }
      w
    } finally { ds.unpersist(); () }
  }

  /** σ(w·x) with the sequential-fold dot product; `w` already quantized. */
  private def sigmoid(x: Column, w: Array[Double]): Column = {
    val dot = aggregate(zip_with(x, array(w.map(lit).toIndexedSeq: _*),
      _ * _), lit(0.0d), _ + _)
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
    docs.select(id, round(sigmoid(hashedBow(text, dim), w), 6).as("score"))
  }
}
