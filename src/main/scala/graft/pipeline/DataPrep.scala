package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.text.{QualityFilters, TextAnalysis}

/** The composed training-data preparation job — what a 100 TB corpus
  * actually runs before tokenization, as ONE declarative plan:
  *
  *   1. quality filter (C4-style rules) — pure projection + filter;
  *   2. exact-content dedup on the rolling-hash fingerprint — the single
  *      shuffle in the whole job (hash exchange on fingerprint; map-side
  *      nothing to combine, the window keeps the smallest doc_id);
  *   3. deterministic stratified hash sampling — filter, no shuffle.
  *
  * Ordering is deliberate: filtering first shrinks the shuffle; dedup runs
  * BEFORE sampling so the sample is drawn from the deduplicated population
  * (sampling first would re-weight toward heavily-duplicated content);
  * sampling last is a free filter. At 1000 executors the only data movement
  * is the fingerprint exchange of filtered survivors.
  */
object DataPrep {

  def prepare(docs: DataFrame, stopwords: Seq[String],
              permille: Map[String, Int],
              defaultPermille: Int = 0): DataFrame = {
    val scored = QualityFilters.qualityFilter(docs, col("doc_id"), col("text"),
      stopwords,
      extra = Seq(col("lang"), TextAnalysis.fingerprint(col("text")).as("fingerprint")))
    val kept = scored.filter(col("drop_reason").isNull)
    val deduped = Dedup.dropExactDuplicates(kept, Seq(col("fingerprint")), col("doc_id"))
    QualityFilters.stratifiedHashSample(deduped, col("doc_id"), col("lang"),
        permille, defaultPermille)
      .select("doc_id", "lang", "n_tokens", "fingerprint", "sample_bucket")
  }
}
