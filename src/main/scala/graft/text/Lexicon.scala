package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary-based document scoring — the lexicon pattern behind
  * sentiment scoring, toxicity keyword screens, domain-term density
  * gates: each token looks up an integer weight, the document scores
  * the sum, the rollup reports how each slice leans. No model, no
  * training — which is exactly why it survives at 100 TB: the lexicon
  * is a LITERAL MAP compiled into the expression tree (the
  * [[Bpe]]-merge-table trick), the per-document fold is a single
  * codegen'd higher-order `aggregate` over the token array — zero
  * joins, zero shuffles, zero UDFs before the one per-group rollup.
  *
  * Keep lexicons to the compile-into-plan scale (≤ ~10⁴ entries); a
  * corpus-trained million-term weight table should ride a broadcast
  * join instead (the [[Vocab.unigramLogProb]] escape hatch).
  */
object Lexicon {

  /** Per-`group` lexicon report over whitespace-tokenized `text`:
    * document count, summed score, documents leaning
    * positive/negative, and the extreme document scores. Unknown
    * tokens weigh 0. Emissions are exact int64 sums — no division,
    * no floats.
    */
  def score(docs: DataFrame, group: Column, text: Column,
            lexicon: Seq[(String, Long)]): DataFrame = {
    require(lexicon.nonEmpty, "need a non-empty lexicon")
    require(lexicon.map(_._1).distinct.size == lexicon.size,
      "duplicate lexicon terms")
    val weights = typedlit(lexicon.toMap)
    val docScore = aggregate(split(lower(text), " +", -1), lit(0L),
      (acc, t) => acc + coalesce(element_at(weights, t), lit(0L)))
    docs.select(group.as("group"), docScore.as("__s"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__s")).as("total_score"),
        sum(when(col("__s") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__s") < 0, 1L).otherwise(0L)).as("n_neg"),
        min(col("__s")).as("min_doc_score"),
        max(col("__s")).as("max_doc_score"))
  }
}
