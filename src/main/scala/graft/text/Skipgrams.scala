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
    *
    * The pair expansion is `window` shifted-slice `zip_with`s — pairs
    * at distance d are the element-wise zip of the token array with
    * itself shifted by d. This is LINEAR work over one materialized
    * array per distance. The naive nested
    * `transform(sequence(...), i -> ... element_at(toks, i) ...)`
    * formulation re-evaluates the `split` subtree inside the lambda
    * (no common-subexpression elimination across HOF lambda bodies,
    * and HOFs run interpreted) — measured 48 s vs ~1 s at sf0.1 for
    * the SAME output. The token array therefore ALSO materializes
    * through its own projection first, so each zip reads a computed
    * column, never the expression tree.
    */
  def topPairs(docs: DataFrame, text: Column, window: Int,
               k: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(k >= 1, s"k must be >= 1, got $k")
    val n = size(col("__toks"))
    val atDist = (d: Int) => zip_with(
      slice(col("__toks"), lit(1), greatest(n - d, lit(0))),
      slice(col("__toks"), lit(d + 1), greatest(n - d, lit(0))),
      (a, b) => struct(least(a, b).as("w1"), greatest(a, b).as("w2")))
    docs
      .select(split(lower(text), " +", -1).as("__toks"))
      .select(explode(concat((1 to window).map(atDist): _*)).as("__p"))
      .groupBy(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
