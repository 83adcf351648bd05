package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentence-level corpus statistics — the layer between the
  * character/token counters ([[TextAnalysis]]) and document-level
  * quality gates ([[QualityFilters]]): average sentence length drives
  * readability-style filters, max-sentence-length catches unsegmented
  * boilerplate (a 4 000-"word" sentence is a table dump, not prose),
  * and the per-source rollup localizes which crawl feed needs a
  * better segmenter.
  *
  * Segmentation is the deliberately simple terminal-punctuation split
  * (`[.!?]+` runs), matching the repo's rule that every text op must
  * be expressible identically in both engines; whitespace-only
  * segments are dropped on both sides. All per-document work is
  * higher-order functions over the split array — zero explode, zero
  * shuffle before the single per-group rollup — and the emitted
  * average is integer ppm (floor), so the oracle hashes exactly.
  */
object Sentences {

  /** Per-`group` sentence stats over `text`: document count, sentence
    * and word totals, integer-ppm mean words-per-sentence, and the
    * longest single sentence (in words).
    */
  def stats(docs: DataFrame, group: Column, text: Column): DataFrame = {
    val words: Column => Column =
      s => size(split(trim(s), " +", -1)).cast("long")
    val per = docs
      .select(group.as("group"),
        filter(split(text, "[.!?]+", -1),
          s => length(trim(s)) > 0).as("__ss"))
      .select(col("group"), size(col("__ss")).cast("long").as("__ns"),
        aggregate(col("__ss"), lit(0L), (acc, s) => acc + words(s))
          .as("__nw"),
        array_max(transform(col("__ss"), words)).as("__mx"))
    per.groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ns")).as("n_sentences"),
        sum(col("__nw")).as("n_words"),
        max(col("__mx")).as("max_sentence_words"))
      .select(col("group"), col("n_docs"), col("n_sentences"),
        col("n_words"),
        when(col("n_sentences") > 0,
          call_function("div", col("n_words") * lit(1000000L),
            col("n_sentences"))).as("wps_ppm"),
        col("max_sentence_words"))
  }
}
