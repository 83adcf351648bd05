package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skip-gram co-occurrence counts — the word2vec/GloVe training-pair
  * statistic: every unordered token pair within a ±`window` position
  * radius, counted corpus-wide. Adjacent-bigram counts ([[Vocab]]'s
  * PMI surface) miss the "spark … shuffle" association two words
  * apart; the windowed count is what distributional semantics
  * actually trains on.
  *
  * Scale design: pair generation is a HIGHER-ORDER-FUNCTION expansion
  * inside the scan stage — for each position, pairs with the next
  * `window` positions via nested `transform` over `sequence`, then
  * ONE explode of the per-doc pair array. Nothing shuffles until the
  * pair rollup (with map-side partials), and the emission is a top-k
  * cut on a total order (count desc, then lexicographic pair) via
  * TakeOrderedAndProject — never a global sort. Pairs are canonical
  * unordered (`least`/`greatest`), so "a b" and "b a" contexts
  * accumulate together. Output size is min(k, distinct pairs);
  * per-doc expansion is `n·window` — linear in corpus size for the
  * fixed small windows the training recipes use (2–10).
  */
object Skipgrams {

  /** Top-k (w1 ≤ w2, n) skip-gram pairs over whitespace-tokenized,
    * lowercased `text` with the given position window.
    */
  def topPairs(docs: DataFrame, text: Column, window: Int,
               k: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = split(lower(text), " +", -1)
    val n = size(toks)
    val pairs = flatten(transform(sequence(lit(0), n - 2),
      i => transform(sequence(i + 1, least(i + lit(window), n - 1)),
        j => struct(
          least(element_at(toks, i + 1), element_at(toks, j + 1)).as("w1"),
          greatest(element_at(toks, i + 1), element_at(toks, j + 1))
            .as("w2")))))
    docs
      .select(when(n >= 2, pairs).otherwise(array().cast(
        "array<struct<w1:string,w2:string>>")).as("__ps"))
      .select(explode(col("__ps")).as("__p"))
      .groupBy(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
