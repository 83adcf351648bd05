package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.text.{Decontaminate, QualityFilters, TextAnalysis}

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

  /** The deeper curation pass — [[prepare]]'s exact-dedup step upgraded to
    * corpus-wide SPAN dedup, and the fixed per-language sampling rates
    * replaced by rates DERIVED from a target source mixture, still as ONE
    * lazy plan:
    *
    *   1. quality filter (projection + filter, no shuffle);
    *   2. C4-style span dedup — the survivors' shuffles (span winner window
    *      + per-doc stitch) dominate the job;
    *   3. static mixing: per-source token totals (one aggregation of the
    *      20-row-per-source kind) → downsampling rates → broadcast back
    *      onto the corpus → deterministic hash-bucket filter.
    *
    * Same ordering argument as [[prepare]]: dedup before sampling so rates
    * are computed over the DEDUPED token mass — mixing on raw counts would
    * overweight sources whose volume is duplication, the exact bias this
    * pipeline exists to remove.
    */
  def curate(docs: DataFrame, stopwords: Seq[String],
             targetPermille: Map[String, Int], defaultPermille: Int = 0,
             spanTokens: Int = 8): DataFrame = {
    val scored = QualityFilters.qualityFilter(docs, col("doc_id"), col("text"),
      stopwords, extra = Seq(col("lang"), col("source"), col("text")))
    val kept = scored.filter(col("drop_reason").isNull)
    val deduped = graft.dedup.SpanDedup.dedupSpans(kept, col("doc_id"),
      col("text"), spanTokens, carry = Seq("lang", "source"))
    val withTok = deduped
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
    val rates = graft.text.Mixing.mixWeights(withTok, col("source"),
        col("n_tokens"), targetPermille, defaultPermille)
      .select(col("source"), col("sample_rate_ppm"))
    withTok.join(broadcast(rates), Seq("source"))
      .withColumn("sample_bucket", QualityFilters.hashSampleBucket(col("doc_id")))
      // bucket < rate·1000 with rate = ppm/1e6  ⟺  bucket·1000 < ppm —
      // but the right side is now an exact integer compare, immune to the
      // float-boundary ambiguity of `bucket < rate * 1000`
      .filter(col("sample_bucket") * 1000 < col("sample_rate_ppm"))
      .select("doc_id", "lang", "source", "n_tokens", "sample_bucket",
        "sample_rate_ppm")
  }

  /** The tokenizer-facing endgame: everything between a raw corpus and the
    * dataloader, as ONE lazy plan —
    *
    *   1. quality filter (projection + filter);
    *   2. exact-content dedup on the rolling-hash fingerprint (the first
    *      shuffle);
    *   3. contamination-safe split on the SAME fingerprint (projection —
    *      computed once, reused; duplicate texts co-assign), train side
    *      proceeds;
    *   4. budgeted mixture: each source fills its `totalBudget · permille`
    *      token budget with its own highest-quality prefix
    *      ([[QualityFilters.tokenBudgetMixture]] — bucket-parallel, no
    *      global sort);
    *   5. deterministic epoch shuffle + shard assignment
    *      ([[graft.text.Chunking.epochShards]]) over the survivors.
    *
    * Ordering: dedup before the split costs nothing (the split is
    * content-keyed, so it is leak-safe either way) but makes the budget
    * arithmetic honest — duplicated token mass would otherwise fill
    * budgets with copies. The output is (doc, shard, position): what a
    * shard-writing export job partitions by and a trainer consumes.
    */
  def pretrain(docs: DataFrame, stopwords: Seq[String],
               budgetPermille: Map[String, Int], totalBudget: Long,
               defaultPermille: Int = 0, epoch: Int = 1, nShards: Int = 8,
               trainPermille: Int = 900): DataFrame = {
    val scored = QualityFilters.qualityFilter(docs, col("doc_id"), col("text"),
      stopwords, extra = Seq(col("source"), col("text"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint")))
    val kept = scored.filter(col("drop_reason").isNull)
    val deduped = Dedup.dropExactDuplicates(kept, Seq(col("fingerprint")),
      col("doc_id"))
    val train = deduped.filter(
      pmod(col("fingerprint"), lit(1000L)) < trainPermille)
    val selected = QualityFilters.tokenBudgetMixture(train, col("doc_id"),
      col("text"), quality = col("uniq_ratio"), source = col("source"),
      budgetPermille = budgetPermille, totalBudget = totalBudget,
      defaultPermille = defaultPermille)
    graft.text.Chunking.epochShards(selected, col("doc_id"), epoch, nShards,
      carry = Seq(col("source"), col("n_tokens"), col("q")))
  }

  /** The corpus quality-control pass — the round-8 gates composed into
    * one lazy plan, ending in the per-source acceptance report a data
    * lead reads before signing off a crawl drop:
    *
    *   1. script routing: keep documents whose dominant script is Latin
    *      ([[TextAnalysis.charsetProfile]] — per-row projection);
    *   2. readability floor: ≥ `minWords` words and a positive Flesch
    *      score ([[TextAnalysis.readability]] — per-row projection);
    *   3. benchmark decontamination: drop documents whose trigram
    *      overlap with the held-out eval slice crosses the threshold
    *      ([[Decontaminate.report]] — broadcast eval grams, one per-doc
    *      rollup);
    *   4. near-duplicate cluster dedup with KEEP-BEST survivorship
    *      ([[graft.dedup.Clusters.keepBest]] over MinHash-verified
    *      pairs — pair-scale components, C4's keep-longest rule);
    *   5. per-source report: surviving docs, character mass, distinct
    *      languages.
    *
    * The gates run as LEFT SEMI joins on the compact doc key — each
    * gate's verdict frame is id-only, so no text column rides any gate
    * shuffle; the dedup stage dominates, exactly as in [[curate]].
    */
  def corpusQc(docs: DataFrame, evalModulus: Long = 11L,
               contamThresholdPpm: Long = 150000L, minWords: Long = 5L,
               dedupThreshold: Double = 0.95): DataFrame = {
    val corpus = docs.filter(col("doc_id") % evalModulus =!= 0)
    val evalSet = docs.filter(col("doc_id") % evalModulus === 0)
    val cs = TextAnalysis.charsetProfile(corpus, col("doc_id"), col("text"))
      .filter(col("dominant_script") === "latin")
      .select(col("doc_id").as("__cs"))
    val rd = TextAnalysis.readability(corpus, col("doc_id"), col("text"))
      .filter(col("n_words") >= minWords && col("fre_milli") > 0)
      .select(col("doc_id").as("__rd"))
    val clean = Decontaminate.report(corpus, col("doc_id"), col("text"),
        evalSet, col("text"), n = 3, thresholdPpm = contamThresholdPpm)
      .filter(col("contaminated") === 0)
      .select(col("doc_id").as("__cl"))
    val gated = corpus
      .join(cs, col("doc_id") === col("__cs"), "left_semi")
      .join(rd, col("doc_id") === col("__rd"), "left_semi")
      .join(clean, col("doc_id") === col("__cl"), "left_semi")
    val pairs = graft.dedup.MinHashLSH.nearDuplicates(gated, col("doc_id"),
      col("text"), threshold = dedupThreshold).select("id_a", "id_b")
    graft.dedup.Clusters.keepBest(gated, col("doc_id"), col("n_chars"),
        pairs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("char_mass"),
        countDistinct(col("lang")).as("n_langs"))
  }
}
