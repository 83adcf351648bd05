package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bitext candidate mining — the parallel-corpus bootstrapping step of a
  * multilingual training pipeline: find cross-LANGUAGE document pairs that
  * share content, anchored on RARE token shingles (numbers, entities, code
  * spans — the tokens translation preserves verbatim). A pair sharing
  * `minShared`+ rare shingles is a translation/near-translation candidate
  * for the (expensive, model-based) alignment stage downstream.
  *
  * Why rarity is the scale lever: the shingle-postings self-join is
  * quadratic PER SHINGLE, so the document-frequency floor (`df <= maxDf`)
  * bounds every bucket at `maxDf` docs BEFORE the join — at most
  * `maxDf·(maxDf−1)/2` pairs per shingle, no salting needed (contrast
  * [[graft.dedup.MinHashLSH]], whose band buckets are unbounded and ride
  * the salted pair stage). Common shingles — exactly the ones that anchor
  * nothing — never reach the join.
  *
  * Shingles travel as the same Horner gram hash as winnowing
  * ([[graft.dedup.Winnowing.fingerprints]] — `acc·31 + tokenHash mod P`):
  * 8-byte keys on the wire, never shingle text (the d10b lesson), and
  * engine-neutral so the oracle replays every hash in SQL.
  */
object Bitext {

  /** Cross-language candidate pairs: (doc_a, doc_b, lang_a, lang_b,
    * n_shared) for pairs sharing `minShared`+ rare `gram`-shingles,
    * normalized doc_a < doc_b. One postings build (distinct doc×hash),
    * one hash-keyed df rollup + semi join, one bounded pair join, one
    * pair-keyed rollup.
    */
  def candidatePairs(docs: DataFrame, id: Column, lang: Column, text: Column,
                     gram: Int = 4, maxDf: Int = 3,
                     minShared: Int = 2): DataFrame = {
    require(gram >= 1 && maxDf >= 2 && minShared >= 1,
      s"need gram >= 1, maxDf >= 2, minShared >= 1")
    val hp = lit(TextAnalysis.HashP)
    val toksC = TextAnalysis.tokens(text)
    val ghs = transform(sequence(lit(0), size(col("__toks")) - gram), i =>
      aggregate(slice(col("__toks"), i + 1, lit(gram)), lit(0L),
        (acc, t) => pmod(acc * 31 + TextAnalysis.tokenHash(t), hp)))
    val postings = docs
      .filter(size(toksC) >= gram)
      .select(id.as("doc_id"), lang.as("lang"), toksC.as("__toks"))
      .select(col("doc_id"), col("lang"), explode(ghs).as("gh"))
      .distinct()
    // rarity floor: hash-scale rollup, semi join back (the rare set is
    // vocabulary-scale — far too big to broadcast at 100 TB)
    val rare = postings.join(
      postings.groupBy("gh").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select("gh"),
      Seq("gh"))
    val a = rare.select(col("gh"), col("doc_id").as("doc_a"),
      col("lang").as("lang_a"))
    val b = rare.select(col("gh"), col("doc_id").as("doc_b"),
      col("lang").as("lang_b"))
    a.join(b, Seq("gh"))
      .filter(col("doc_a") < col("doc_b") && col("lang_a") =!= col("lang_b"))
      .groupBy("doc_a", "doc_b", "lang_a", "lang_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
