package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose word
  * n-gram overlap with a held-out EVALUATION set exceeds a threshold —
  * the step every pretraining pipeline runs before training so the
  * model is not graded on memorized eval data (the GPT-3 appendix-C /
  * Gopher "test-set overlap" procedure, re-expressed relationally).
  *
  * A training doc is scored by `overlap_ppm = 10⁶ · |G(doc) ∩ G(eval)|
  * DIV |G(doc)|` over its DISTINCT n-grams, where `G(eval)` is the
  * union of distinct n-grams across the whole eval set; a doc with
  * `overlap_ppm >= thresholdPpm` is contaminated. Distinct-within-doc
  * (not multiset) matches the published procedure: one leaked answer
  * string counts once no matter how often the doc repeats it.
  *
  * 100 TB plan: the eval side is benchmark-scale (thousands of
  * documents, megabytes of n-grams), so its distinct gram set rides a
  * BROADCAST left-semi-shaped join marker onto the corpus gram stream —
  * the corpus is never shuffled on gram text. The only data-scale
  * exchange is the per-doc rollup on the doc key, with map-side
  * partial counts. Gram assembly reuses the t58/t60 generator shape
  * (`explode_outer` + null filter — a plain `explode` triggers
  * InferFiltersFromGenerate and re-evaluates the gram lambda three
  * times per row). At a real 100 TB run the broadcast gram set is
  * hashed 64-bit (benchmark n-grams ≈ 10⁷ · 8 B — well inside the
  * broadcast budget); here grams join as text because the eval set is
  * tiny and text keeps the oracle trivially equivalent.
  */
object Decontaminate {

  /** Per-document contamination report: `(id, n_grams, n_hit,
    * overlap_ppm, contaminated)` — docs shorter than `n` tokens emit
    * `n_grams = 0` and are clean by definition (nothing to leak).
    */
  def report(corpus: DataFrame, id: Column, text: Column,
             eval: DataFrame, evalText: Column,
             n: Int = 3, thresholdPpm: Long = 200000L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(thresholdPpm >= 0, s"thresholdPpm must be >= 0, got $thresholdPpm")
    val idName = corpus.select(id).columns.head
    def grams(df: DataFrame, cols: Seq[Column], t: Column): DataFrame = df
      .select(cols :+ split(lower(t), " ").as("__t"): _*)
      .select(cols :+ explode_outer(array_distinct(
        expr(s"CASE WHEN size(__t) >= $n THEN" +
          s" transform(sequence(0, size(__t) - $n)," +
          s" i -> array_join(slice(__t, i + 1, $n), ' '))" +
          s" ELSE array() END"))).as("__g"): _*)
    // eval grams: benchmark-scale, distinct across the whole set
    val evalGrams = grams(eval, Seq.empty, evalText)
      .filter(col("__g").isNotNull)
      .select(col("__g"), lit(1L).as("__hit")).distinct()
    grams(corpus, Seq(col(idName)), text)
      // keep gram-less docs: they must still emit a clean row
      .join(broadcast(evalGrams), Seq("__g"), "left")
      .groupBy(col(idName))
      .agg(count(col("__g")).as("n_grams"),
        coalesce(sum("__hit"), lit(0L)).as("n_hit"))
      .select(col(idName), col("n_grams"), col("n_hit"),
        when(col("n_grams") > 0,
          call_function("div", col("n_hit") * 1000000L, col("n_grams")))
          .otherwise(lit(0L)).as("overlap_ppm"))
      .withColumn("contaminated",
        (col("overlap_ppm") >= thresholdPpm).cast("long"))
  }
}
