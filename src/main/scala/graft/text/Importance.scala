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
}
