package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level vocabulary statistics — the aggregate-shaped text jobs
  * (everything in [[TextAnalysis]]/[[QualityFilters]] is per-row).
  *
  * Both operators are explode → hash aggregate: Spark plans them as partial
  * (map-side) + final HashAggregate, so the shuffle carries one row per
  * distinct term per map partition, not one per token occurrence — at
  * 100 TB the reduction before the exchange is what makes these runnable.
  */
object Vocab {

  /** Document-frequency table + inverse document frequency:
    * `idf = ln(n_docs / df_count)`. Tokens are de-duplicated per document
    * before the explode (df counts documents, not occurrences). The corpus
    * size joins in as a broadcast of a 1-row aggregate — no driver-side
    * action.
    */
  def idf(df: DataFrame, text: Column): DataFrame = {
    val counts = df
      .select(explode(array_distinct(TextAnalysis.tokens(text))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df_count"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    counts.crossJoin(broadcast(total))
      .select(col("token"), col("df_count"),
        round(log(col("n_docs").cast("double") / col("df_count")), 6).as("idf"))
  }

  /** Top-k adjacent n-grams by occurrence count, fully ordered
    * (count desc, then n-gram asc) so the k-th boundary is deterministic.
    * Spark executes the order+limit as TakeOrderedAndProject — per-partition
    * heaps of size k, never a global sort.
    */
  def topNgrams(df: DataFrame, text: Column, n: Int = 2, k: Int = 100): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be >= 1")
    // start positions 1 .. (tokens - n + 1); guarded because Spark's
    // sequence(1, 0) counts DOWN ([1, 0]) instead of returning empty
    val base = df.select(TextAnalysis.tokens(text).as("__toks"))
      .select(explode(when(size(col("__toks")) >= n,
        transform(sequence(lit(1), size(col("__toks")) - (n - 1)),
          s => concat_ws(" ", slice(col("__toks"), s, lit(n)))))
        .otherwise(array().cast("array<string>"))).as("ngram"))
    base.groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
  }
}
