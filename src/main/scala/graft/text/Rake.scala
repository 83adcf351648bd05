package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010) — unsupervised keyphrase
  * mining: candidate phrases are the maximal runs of NON-stopword
  * tokens (stopwords are the delimiters), each word scores
  * `degree/frequency` where `degree` is the summed length of the
  * phrases containing the word and `frequency` its occurrence count,
  * and a phrase scores the sum of its member word scores — long
  * phrases built from discriminative words win, which is what
  * separates RAKE output from a raw term count.
  *
  * Integerization: `word_score_micro = deg·10⁶ DIV freq`;
  * `phrase_score_micro = Σ word_score_micro` (multiplicity kept, per
  * standard RAKE) — sums of exact integer quotients, deterministic on
  * any engine; the float `deg/freq` sum is the t18 class. Ranking
  * `(score DESC, phrase ASC)` is total, so the top-k cut is
  * deterministic.
  *
  * Plan: phrase assembly is MAP-SIDE and ORDER-SAFE — stopwords are
  * rewritten to a control-char delimiter, the token array re-joins to
  * one string, and splitting on the delimiter yields the phrase runs
  * verbatim (a `collect_list`-per-island assembly would need a sort:
  * aggregation order is not guaranteed after a shuffle). Word stats
  * are one vocabulary-key rollup; instance scores join the BROADCAST
  * word-score table, keyed by (doc, instance index) so a phrase
  * repeated inside one document scores each occurrence separately;
  * identical phrase text collapses at the end (identical text ⟹
  * identical score). TakeOrderedAndProject cuts the top-k.
  */
object Rake {

  // U+0001: cannot appear in space-tokenized text, safe phrase delimiter
  private val Delim = "\u0001"

  def keywords(df: DataFrame, id: Column, text: Column,
               stopwords: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(stopwords.nonEmpty && stopwords.forall(s =>
      s.nonEmpty && !s.contains("'") && !s.contains(" ")),
      "stopwords must be non-empty single words")
    val stopArr = s"array(${stopwords.map(s => s"'$s'").mkString(", ")})"
    val inst = df
      .select(id.as("__doc"), split(lower(text), " ").as("__t"))
      .withColumn("__m", expr(
        s"transform(__t, w -> IF(length(w) = 0 OR " +
          s"array_contains($stopArr, w), '$Delim', w))"))
      .withColumn("__phr", expr(
        s"filter(transform(split(concat_ws(' ', __m), '$Delim'), " +
          "p -> trim(p)), p -> p <> '')"))
      .select(col("__doc"),
        posexplode(col("__phr")).as(Seq("__gi", "phrase")))
      .withColumn("__len", size(split(col("phrase"), " ")).cast("long"))
    val words = inst
      .select(col("__len"), explode(split(col("phrase"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("__freq"), sum("__len").as("__deg"))
      .select(col("word"),
        call_function("div", col("__deg") * 1000000L, col("__freq"))
          .as("__wscore"))
    inst
      .select(col("__doc"), col("__gi"), col("phrase"), col("__len"),
        explode(split(col("phrase"), " ")).as("word"))
      .join(broadcast(words), Seq("word"))
      .groupBy(col("__doc"), col("__gi"), col("phrase"), col("__len"))
      .agg(sum("__wscore").as("__iscore"))
      .groupBy(col("phrase"))
      .agg(max("__len").as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max("__iscore").as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase").asc)
      .limit(k)
  }
}
