package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw document
  * by how target-like its hashed n-gram features are,
  * `log w(x) = Σ_tokens [log p_target(bucket) − log p_raw(bucket)]`,
  * with Laplace-smoothed bucket unigram models fit on the corpus itself.
  * High-weight docs resemble the target domain; resampling by weight
  * shifts the pretraining mixture toward it without hand-written rules.
  */
object Importance {

  /** Per-document DSIR log importance weights over `buckets` hashed
    * unigram features, target = rows where `isTarget`.
    *
    * Engine-exactness: each token's log-ratio is rounded to integer
    * MICRO-units, so the per-doc reduction is an integer SUM —
    * order-independent across partitions and bit-replayable by a SQL
    * oracle (the t18 idiom applied to a float accumulation).
    *
    * Scale shape: one explode+groupBy pass fits BOTH bucket models (state
    * ≤ `buckets` rows, map-side combined), the totals ride a broadcast
    * 1-row frame, the scored bucket table broadcasts back (≤ `buckets`
    * rows), and one per-doc aggregation finishes — the corpus never joins
    * anything larger than the bucket table and never shuffles except on
    * the document id.
    */
  def dsirWeights(df: DataFrame, id: Column, text: Column, isTarget: Column,
                  buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val idName = df.select(id).columns.head
    val base = df
      .select(id, isTarget.as("__t"),
        explode(TextAnalysis.tokens(text)).as("__tok"))
      .select(col(idName), col("__t"),
        pmod(TextAnalysis.tokenHash(col("__tok")), lit(buckets.toLong)).as("__b"))
    val counts = base.groupBy("__b").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
      count(lit(1)).as("__cr"))
    val totals = counts.agg(sum("__ct").as("__nt"), sum("__cr").as("__nr"))
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("__b"),
        round((log((col("__ct") + 1).cast("double") / (col("__nt") + buckets)) -
               log((col("__cr") + 1).cast("double") / (col("__nr") + buckets))) * 1e6)
          .cast("long").as("lr_micro"))
    base.join(broadcast(lr), Seq("__b"))
      .groupBy(idName)
      .agg(count(lit(1)).as("n_tokens"),
        sum("lr_micro").as("logweight_micro"))
  }

  /** Weighted sampling WITHOUT replacement via the Gumbel-max trick —
    * the statistically correct realization of importance RESAMPLING
    * (take the k rows with the largest `log w + Gumbel noise`; the
    * selection distribution is exactly p_i ∝ w_i without replacement).
    * The "noise" is deterministic: each id's affine hash bucket maps to
    * `u ∈ (0,1)`, `g = −ln(−ln(u))`, rounded to integer micro-units and
    * ADDED to the integer micro log-weight — so the ranking key is an
    * integer, reproducible run-to-run and replayable by a SQL oracle
    * (no float comparison decides a rank).
    *
    * Scale shape: pure projection + global top-k — Spark plans
    * `orderBy(...).limit(k)` as TakeOrderedAndProject (per-partition
    * heaps + driver merge of k rows), never a global sort.
    */
  def gumbelTopK(df: DataFrame, id: Column, logWeightMicro: Column,
                 k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import graft.sim.Ivf.{PickA, PickB, PickP}
    val idName = df.select(id).columns.head
    // bucket ∈ [0, 1e6); u = (bucket + 0.5)/1e6 keeps u strictly inside
    // (0,1) so both ln calls are finite
    val bucket = pmod(pmod(id, lit(PickP)) * PickA + PickB, lit(PickP)) % 1000000L
    val u = (bucket.cast("double") + 0.5) / 1e6
    val gumbelMicro = round(-log(-log(u)) * 1e6).cast("long")
    df.select(id, logWeightMicro.as("logweight_micro"))
      .withColumn("gumbel_key", col("logweight_micro") + gumbelMicro)
      .orderBy(col("gumbel_key").desc, col(idName))
      .limit(k)
  }
}
