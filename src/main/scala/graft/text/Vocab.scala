package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Interpolated BIGRAM language-model quality score — one modeling
    * rung above [[unigramLogProb]] (CCNet's actual filter is a 5-gram
    * KenLM; the Jelinek–Mercer–interpolated bigram is the standard next
    * cut that stays engine-neutral): per bigram position,
    * `logp = ln(λ·c(w₁w₂)/c(w₁) + (1−λ)·c(w₂)/N)`, per document the mean
    * over its bigram positions. The interpolation floor means unseen-in-
    * model bigrams score by their unigram mass instead of −∞.
    *
    * Engine-exactness: per-position logp rides as integer MICRO-units
    * (sum is an order-independent integer add); the mean is a quotient of
    * two exact integers, rounded.
    *
    * Scale shape: the model is two aggregation passes (bigram counts,
    * unigram counts) joined model-side; scoring joins the exploded corpus
    * to the model on the bigram key — ONE equi shuffle each side (the
    * model broadcasts instead when it fits, like [[unigramLogProb]]'s
    * escape hatch) — then reduces per document. Docs with fewer than 2
    * tokens have no bigram positions and drop (same contract as the
    * oracle).
    */
  def bigramLogProb(df: DataFrame, id: Column, text: Column,
                    lambdaPermille: Int = 700): DataFrame = {
    require(lambdaPermille >= 0 && lambdaPermille <= 1000,
      "lambdaPermille must be in [0, 1000]")
    val idName = df.select(id).columns.head
    // both mixture constants as EXACT decimal-parse literals (computing
    // 1.0−λ in IEEE gives 0.30000000000000004 for λ=0.7 — a different
    // double than the oracle's parsed 0.3; the t18 class of bug)
    val lam = lambdaPermille / 1000.0
    val lamInv = (1000 - lambdaPermille) / 1000.0
    val uni = df.select(explode(TextAnalysis.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum("c").as("__n"))
    val bi = df.select(explode(ngrams(text, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c12"))
    val model = bi
      .withColumn("__w1", split(col("bigram"), " ")(0))
      .withColumn("__w2", split(col("bigram"), " ")(1))
      .join(uni.select(col("w").as("__w1"), col("c").as("c1")), Seq("__w1"))
      .join(uni.select(col("w").as("__w2"), col("c").as("c2")), Seq("__w2"))
      .crossJoin(broadcast(total))
      .select(col("bigram"),
        round(log(lit(lam) * col("c12") / col("c1") +
          lit(lamInv) * col("c2") / col("__n")) * 1e6)
          .cast("long").as("lp_micro"))
    df.select(id, explode(ngrams(text, 2)).as("bigram"))
      .join(model, Seq("bigram"))
      .groupBy(idName)
      .agg(count(lit(1)).as("n_bigrams"),
        sum("lp_micro").as("sum_lp_micro"))
      .withColumn("avg_logprob",
        round(col("sum_lp_micro").cast("double") / col("n_bigrams") / 1e6, 6))
  }

  /** Vocabulary coverage curve — the tokenizer-sizing question "how many
    * vocabulary entries cover X‰ of all token occurrences?": for each
    * target, the rank of the first (count desc, token) vocabulary prefix
    * whose cumulative occurrence mass reaches it, plus that prefix's
    * exact mass. The threshold test is integer (`cum·1000 ≥ target·total`)
    * so no float boundary exists.
    *
    * The ranking runs BUCKET-PARALLEL (the
    * [[QualityFilters.tokenBudgetSelect]] construction, made the default
    * here in r14 — the former global `Window.orderBy` put the whole
    * vocabulary on one task, the plan a web-scale vocabulary cannot run):
    * terms bucket by the BIT LENGTH of their count — `length(bin(cnt))`,
    * an exact integer coarsening of the `cnt desc` order (equal counts
    * can never straddle buckets, higher count ⟹ same-or-higher bucket) —
    * the ≤ 63-row histogram takes one bounded serial window for the
    * per-bucket (tokens, terms) prefix offsets, and rank/cumsum windows
    * run per bucket in parallel, each offset by its bucket's prefix.
    * Bucket order refines the global (cnt desc, token) order, so
    * offset + within-bucket value IS the global window's value for every
    * row — the output is bit-identical to the direct form.
    */
  def vocabCoverage(df: DataFrame, text: Column,
                    targetsPermille: Seq[Int]): DataFrame = {
    require(targetsPermille.nonEmpty &&
      targetsPermille.forall(t => t >= 1 && t <= 1000),
      "targets must be permille values in [1, 1000]")
    val cnt = df.select(explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("__b", length(bin(col("cnt"))).cast("int"))
    val hist = cnt.groupBy("__b")
      .agg(sum("cnt").as("__btoks"), count(lit(1)).as("__bterms"))
    // single-partition by construction (≤ 63 rows — one per count bit
    // length); the literal partition key keeps the bounded frame out of
    // WindowExec's move-everything warning
    val wh = Window.partitionBy(lit(0)).orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hist
      .withColumn("__toks_before", coalesce(sum("__btoks").over(wh), lit(0L)))
      .withColumn("__terms_before", coalesce(sum("__bterms").over(wh), lit(0L)))
      .select(col("__b"), col("__toks_before"), col("__terms_before"))
    val total = hist.agg(sum("__btoks").as("__tot"))
    val wr = Window.partitionBy("__b").orderBy(col("cnt").desc, col("token"))
    val wc = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cnt.join(broadcast(off), "__b")
      .select(
        (col("__terms_before") + row_number().over(wr)).cast("long").as("rank"),
        (col("__toks_before") + sum("cnt").over(wc)).as("cum"))
    ranked.crossJoin(broadcast(total))
      .select(col("rank"), col("cum"),
        explode(typedLit(targetsPermille)).as("target_permille"), col("__tot"))
      .filter(col("cum") * 1000 >= col("target_permille") * col("__tot"))
      .groupBy("target_permille")
      .agg(min("rank").as("vocab_size"),
        min_by(col("cum"), col("rank")).as("cum_tokens"))
  }

  /** CCNet-style unigram language-model quality score: each document's
    * mean log-probability of its tokens under the corpus's own unigram
    * distribution (`logp(t) = ln(count(t) / total_tokens)`). Low scorers
    * are gibberish / rare-token soup; high scorers are made of the
    * corpus's common vocabulary — the classic cheap LM-quality proxy
    * (CCNet uses a 5-gram KenLM; the unigram case is what's expressible
    * engine-neutrally, and is the standard first cut).
    *
    * Plan shape: the corpus is scanned twice — once exploded into the
    * vocabulary aggregate (partial map-side combine: the shuffle carries
    * distinct tokens per partition, not occurrences), once exploded into
    * the scoring join. The corpus token TOTAL is the sum of the vocab
    * counts (an aggregate over the small counts table, its exchange
    * reused — NOT a third corpus pass; counts are integers, so the
    * double sum is exact and order-independent below 2^53).
    * `broadcastVocab` joins the (token, logp) table as a broadcast —
    * right while vocabularies fit on an executor (even web-scale token
    * vocabs are ~100 M rows ≈ a few GB; beyond that pass false for a
    * shuffle join on token). The per-doc reduce is the only other
    * shuffle.
    *
    * Per-token logp rounds at 6dp BEFORE the mean so both engines average
    * identical summands (the mean itself then rounds at 6dp too).
    */
  def unigramLogProb(df: DataFrame, id: Column, text: Column,
                     broadcastVocab: Boolean = true): DataFrame = {
    val toks = df.select(id.as("doc_id"),
      explode(TextAnalysis.tokens(text)).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("double").as("n_total"))
    val vocab = counts.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("cnt").cast("double") / col("n_total")), 6).as("logp"))
    val v = if (broadcastVocab) broadcast(vocab) else vocab
    toks.join(v, Seq("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("logp")), 6).as("avg_logprob"))
  }

  /** Top-k bigram collocations by pointwise mutual information —
    * `PMI(a,b) = log(P(ab) / (P(a)·P(b)))` — the standard phrase-mining /
    * tokenizer-merge-candidate signal (word2vec's phrase pass, BPE merge
    * scoring both rank on variants of this). `minCount` floors the bigram
    * count first: a hapax pair maxes PMI by construction and buries real
    * collocations.
    *
    * Shape: one unigram agg + one bigram agg over the same corpus, two
    * broadcast joins of the (vocab-sized) unigram table onto the surviving
    * bigrams, TakeOrderedAndProject for the top-k — per-partition heaps,
    * no global sort. log rounds 6dp before ranking (the [[unigramLogProb]]
    * cross-engine idiom).
    */
  def pmiBigrams(df: DataFrame, text: Column, minCount: Long = 5,
                 k: Int = 100): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be >= 1")
    val uni = df.select(explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("ucnt"))
    val uTot = uni.agg(sum(col("ucnt")).cast("double").as("un"))
    val bis = df.select(explode(ngrams(text, 2)).as("bigram"))
    val bTot = bis.agg(count(lit(1)).cast("double").as("bn"))
    val bi = bis.groupBy("bigram").agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minCount)
    bi.crossJoin(broadcast(bTot)).crossJoin(broadcast(uTot))
      .join(broadcast(uni.select(col("token").as("__w1"), col("ucnt").as("__c1"))),
        split(col("bigram"), " ").getItem(0) === col("__w1"))
      .join(broadcast(uni.select(col("token").as("__w2"), col("ucnt").as("__c2"))),
        split(col("bigram"), " ").getItem(1) === col("__w2"))
      .select(col("bigram"), col("n_pairs"),
        round(log((col("n_pairs").cast("double") / col("bn")) /
          ((col("__c1").cast("double") / col("un")) *
           (col("__c2").cast("double") / col("un")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(k)
  }

  /** Okapi BM25 top-k retrieval: score every document against a fixed
    * query-term list and keep the `k` best — the classic sparse-retrieval
    * ranker (and, in a curation pipeline, the "find documents about X"
    * targeted-selection primitive that TF-IDF keyword extraction
    * ([[tfidfTopK]]) is the per-document dual of).
    *
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))`
    * with the Lucene-style non-negative idf `ln(1 + (N − df + ½)/(df + ½))`.
    *
    * Engine-exactness: idf rounds 6dp first; each per-term score rides as
    * integer MICRO-units so the per-doc sum is an order-independent
    * integer add; ranking orders on `(score_micro DESC, doc_id)` — an
    * integer key, so no float comparison decides the k-th boundary. All
    * four BM25 constants enter as decimal-parse literals on BOTH engines
    * (computing `1 − b` in IEEE yields a different double than parsing
    * `0.25` — the t18/t37 class of bug).
    *
    * Scale shape: query terms are a literal in-plan array (a handful of
    * strings), so per-(doc, term) tf is ROW-LOCAL — explode over the
    * QUERY, not the corpus token stream; the corpus never shuffles by
    * token. The df/avgdl model side is two tiny aggregates (df filtered
    * to query terms pre-shuffle; avgdl a 1-row broadcast). The only
    * corpus-keyed exchange is the per-doc score reduce, and the top-k is
    * TakeOrderedAndProject — per-partition heaps, never a global sort.
    */
  def bm25TopK(df: DataFrame, id: Column, text: Column,
               queryTerms: Seq[String], k: Int = 20,
               k1Tenths: Int = 12, bHundredths: Int = 75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1 && k1Tenths >= 0 && bHundredths >= 0 && bHundredths <= 100,
      "k >= 1, k1 >= 0, b in [0, 1]")
    val idName = df.select(id).columns.head
    // decimal-parse doubles (never IEEE-derived): k1, k1+1, b, 1-b
    val k1 = s"${k1Tenths / 10}.${k1Tenths % 10}".toDouble
    val k1p1 = s"${(k1Tenths + 10) / 10}.${(k1Tenths + 10) % 10}".toDouble
    val b = s"0.${f"$bHundredths%02d"}".toDouble
    val bInv = s"0.${f"${100 - bHundredths}%02d"}".toDouble
    val docs = df.select(id, TextAnalysis.tokens(text).as("__t"))
      .select(col(idName), col("__t"), size(col("__t")).as("__len"))
    val stats = docs.agg(count(lit(1)).as("__n"),
      (sum("__len").cast("double") / count(lit(1))).as("__avgdl"))
    val dfTab = docs
      .select(explode(array_distinct(col("__t"))).as("token"))
      .filter(col("token").isin(queryTerms: _*))
      .groupBy("token").agg(count(lit(1)).as("__df"))
    // __avgdl rides inside the broadcast idf table (same value every row)
    // so the 1-row stats aggregate is referenced ONCE — a second
    // crossJoin(stats) would re-execute its corpus-count subtree
    val idfTab = dfTab.crossJoin(broadcast(stats))
      .select(col("token"),
        round(log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))), 6).as("__idf"),
        col("__avgdl"))
    docs
      .select(col(idName), col("__len"),
        explode(typedLit(queryTerms)).as("token"), col("__t"))
      .withColumn("__tf",
        size(filter(col("__t"), y => y === col("token"))).cast("double"))
      .filter(col("__tf") > 0)
      .join(broadcast(idfTab), Seq("token"))
      .select(col(idName),
        round(col("__idf") * (col("__tf") * lit(k1p1) /
          (col("__tf") + lit(k1) * (lit(bInv) +
            lit(b) * col("__len") / col("__avgdl")))) * 1e6)
          .cast("long").as("__s_micro"))
      .groupBy(idName)
      .agg(count(lit(1)).cast("int").as("n_terms_matched"),
        sum("__s_micro").as("score_micro"))
      .orderBy(col("score_micro").desc, col(idName).asc)
      .limit(k)
  }

  /** Top-k adjacent n-grams by occurrence count, fully ordered
    * (count desc, then n-gram asc) so the k-th boundary is deterministic.
    * Spark executes the order+limit as TakeOrderedAndProject — per-partition
    * heaps, never a global sort.
    */
  /** Space-joined adjacent n-grams of the token array — empty for documents
    * shorter than `n`. Start positions run 1 .. (tokens - n + 1); the guard
    * exists because Spark's `sequence(1, 0)` counts DOWN ([1, 0]) instead
    * of returning empty.
    */
  def ngrams(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        s => concat_ws(" ", slice(toks, s, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  def topNgrams(df: DataFrame, text: Column, n: Int = 2, k: Int = 100): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be >= 1")
    df.select(explode(ngrams(text, n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
  }

  /** Per-document top-k TF-IDF terms (the classic keyword extractor /
    * sparse-retrieval feature). Term frequencies are computed ROW-LOCALLY
    * (distinct-token explode with an in-array count — no (doc, token)
    * shuffle); the IDF table joins by broadcast (valid while the vocabulary
    * is broadcastable — for open web vocabularies switch to a shuffle join
    * on token); the only repartitioning is the per-doc top-k window. Scores
    * round at 6dp before ranking so the order is engine-reproducible.
    */
  def tfidfTopK(df: DataFrame, id: Column, text: Column, k: Int = 3): DataFrame = {
    val idfTab = idf(df, text)
    val terms = df
      .select(id.as("doc_id"), TextAnalysis.tokens(text).as("__t"))
      .select(col("doc_id"), size(col("__t")).as("n"), col("__t"),
        explode(array_distinct(col("__t"))).as("token"))
      .withColumn("cnt", size(filter(col("__t"), y => y === col("token"))))
      .drop("__t")
    val scored = terms.join(broadcast(idfTab.select("token", "idf")), "token")
      .withColumn("tfidf",
        round(col("cnt").cast("double") / col("n") * col("idf"), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "token", "tfidf", "rank")
  }

  /** Benchmark decontamination: per training document, the number of
    * distinct `n`-grams it shares with an eval corpus. The eval side is a
    * benchmark — small by definition — so its distinct grams BROADCAST and
    * the training corpus never shuffles: explode → broadcast semi-ish join
    * → per-doc count, all map-side except the final per-doc aggregate
    * (which is partial+final on doc_id). At web scale swap the gram strings
    * for their Rabin–Karp hashes so the exploded column is 8 bytes.
    */
  def contamination(train: DataFrame, evalCorpus: DataFrame,
                    id: Column, text: Column, n: Int = 3): DataFrame = {
    // per-doc gram dedup happens ROW-LOCALLY (array_distinct before the
    // explode) — a post-explode `.distinct()` would shuffle every training
    // gram just to dedupe within documents
    val tg = train.select(id.as("doc_id"),
      explode(array_distinct(ngrams(text, n))).as("gram"))
    val eg = evalCorpus.select(explode(ngrams(text, n)).as("gram")).distinct()
    tg.join(broadcast(eg), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Per-group unigram-distribution drift vs the whole corpus, as the L1
    * (total-variation×2) distance in integer ppm — the data-quality
    * monitor that flags a source whose token mix walked away from the
    * mixture (new crawl snapshot, broken extractor, language shift).
    *
    * Both distributions quantize to integer ppm (`cnt·10⁶ DIV total`, the
    * t43 idiom) BEFORE the |Δ| sum, so the whole statistic is
    * order-independent integer arithmetic — engine-exact, at the cost of
    * ±1 ppm per token of quantization, irrelevant at drift-alert
    * magnitudes (the statistic's scale is 10⁴–10⁶ ppm).
    *
    * Plan shape: the event-scale data is exploded and shuffled ONCE (the
    * (group, token) rollup); every later frame is vocab- or group-scale.
    * The absent-token terms — a token the source never emits still
    * contributes its global mass to the distance — come from a
    * vocab × groups grid built by broadcasting the GROUP list (vocab is
    * the big side at scale; never enumerate it per group via shuffle).
    */
  def distributionDrift(df: DataFrame, group: Column,
                        text: Column): DataFrame = {
    val groupName = df.select(group).columns.head
    val srcCnt = df
      .select(group, explode(TextAnalysis.tokens(text)).as("__tok"))
      .groupBy(col(groupName), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    val srcTot = srcCnt.groupBy(col(groupName)).agg(sum("__c").as("__tot"))
    val glob = srcCnt.groupBy(col("__tok")).agg(sum("__c").as("__g"))
    val gTot = glob.agg(sum("__g").as("__gt"))
    glob.crossJoin(broadcast(srcTot))
      .join(srcCnt, Seq(groupName, "__tok"), "left")
      .crossJoin(broadcast(gTot))
      .select(col(groupName), col("__tot"),
        expr("abs(coalesce(__c, 0L) * 1000000 DIV __tot" +
          " - __g * 1000000 DIV __gt)").as("__d"))
      .groupBy(col(groupName))
      .agg(max(col("__tot")).as("n_tokens"), sum(col("__d")).as("l1_ppm"))
  }

  /** Per-document n-gram novelty: the fraction (integer ppm) of a doc's
    * DISTINCT word n-grams that appear in NO other document — high
    * novelty marks genuinely fresh content, low novelty marks templated/
    * boilerplate-heavy docs even when exact/near dedup misses them (the
    * gram overlap is scattered, not contiguous). The diversity-weighted
    * sampling signal D4/DoReMi-style pipelines want next to quality.
    *
    * Plan: distinct grams per doc explode map-side; corpus gram df is one
    * partial-aggregated shuffle; novelty joins doc-grams back to the df
    * table on the gram key (second shuffle, gram-keyed — the classic
    * inverted shape, skew-bounded because per-gram fan-out IS df and
    * high-df grams are exactly the ones a min-df cap would drop). A doc
    * counts a gram ONCE (distinct-within-doc), so df = 1 means "this doc
    * only".
    */
  def ngramNovelty(df: DataFrame, id: Column, text: Column,
                   n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val idName = df.select(id).columns.head
    // docs shorter than n tokens contribute an empty gram array (explode
    // drops them); a descending `sequence(0, negative)` would otherwise
    // feed slice() illegal starts
    // explode_OUTER + null filter: a plain explode triggers
    // InferFiltersFromGenerate, which clones the whole gram-building
    // lambda into a pre-Generate filter — 3 interpreted evaluations per
    // row (the t60 lesson; measured 6.7× there)
    val grams = df
      .select(id, split(lower(text), " ").as("__t"))
      .select(col(idName), explode_outer(array_distinct(
        expr(s"CASE WHEN size(__t) >= $n THEN" +
          s" transform(sequence(0, size(__t) - $n)," +
          s" i -> array_join(slice(__t, i + 1, $n), ' '))" +
          s" ELSE array() END"))).as("__g"))
      .filter(col("__g").isNotNull)
    val gdf = grams.groupBy("__g").agg(count(lit(1)).as("__df"))
    grams.join(gdf, "__g")
      .groupBy(col(idName))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col(idName), col("n_grams"), col("n_unique"),
        call_function("div", col("n_unique") * 1000000L, col("n_grams"))
          .as("novelty_ppm"))
  }

  /** Heaps'-law vocabulary-growth curve: how many NEW distinct tokens
    * each successive corpus slice contributes, plus the cumulative
    * vocabulary — the saturation report that sizes tokenizer vocabularies
    * and answers "will more data still buy new words". Slices are
    * `nBuckets` equal id-order segments; a token belongs to the FIRST
    * slice it appears in, which turns the cumulative-distinct problem
    * (quadratic if done naively) into ONE `min(bucket)` aggregate over
    * exploded distinct tokens and a window over the ≤ nBuckets-row
    * rollup. `gram` > 1 tracks word n-gram growth instead — the right
    * unit once the unigram vocabulary saturates (any bounded-vocab
    * corpus flattens the unigram curve almost immediately; n-gram
    * diversity keeps discriminating).
    */
  def vocabGrowth(df: DataFrame, id: Column, text: Column,
                  nBuckets: Int = 10, gram: Int = 1): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(gram >= 1, s"gram must be >= 1, got $gram")
    val total = df.agg(count(lit(1)).as("__n"))
    val units =
      if (gram == 1)
        df.select(id.as("__id"), array_distinct(
          filter(split(lower(text), " "), t => length(t) > 0)).as("__us"))
      else
        df.select(id.as("__id"), split(lower(text), " ").as("__t"))
          .select(col("__id"), array_distinct(
            expr(s"CASE WHEN size(__t) >= $gram THEN" +
              s" transform(sequence(0, size(__t) - $gram)," +
              s" i -> array_join(slice(__t, i + 1, $gram), ' '))" +
              s" ELSE array() END")).as("__us"))
    // explode_OUTER + null filter, not a plain explode:
    // InferFiltersFromGenerate would otherwise clone the whole gram-
    // building lambda into a pre-Generate filter (size(...)>0 AND
    // isnotnull(...)) — three interpreted evaluations of the transform
    // chain per row, measured 4× slower than the Generate itself
    val firstSeen = units
      .select(col("__id"), explode_outer(col("__us")).as("__tok"))
      .filter(col("__tok").isNotNull)
      .crossJoin(broadcast(total))
      .select(col("__tok"),
        least(call_function("div", col("__id") * nBuckets, col("__n")),
          lit(nBuckets - 1L)).as("__b"))
      .groupBy("__tok").agg(min("__b").as("bucket"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    firstSeen.groupBy("bucket").agg(count(lit(1)).as("new_tokens"))
      .withColumn("cum_vocab", sum("new_tokens").over(w))
  }

  /** Inverted-index posting lists with delta (gap) encoding — the
    * retrieval-index artifact itself, materialized: per term, its
    * document frequency and the sorted posting list as FIRST-DIFFERENCE
    * gaps (`d₁, d₂−d₁, d₃−d₂, …`), the form every index compressor
    * (VByte, PForDelta) consumes. Gaps are pure integer arithmetic over
    * the sorted id list, so the emission is engine-exact.
    *
    * Plan: distinct terms per doc explode (map-side), ONE shuffle on the
    * term, postings assemble via partial-aggregated `collect_list` +
    * `sort_array`. `minDf` prunes the hapax tail BEFORE emission. A
    * term's posting list lives in one aggregation buffer — fine to ~10⁷
    * docs per term; at open-web scale, shard the doc-id space first
    * (rendezvous buckets, [[graft.ops.Sharding]]) and emit per-shard
    * postings that concatenate by construction (gaps restart per shard).
    */
  def postings(df: DataFrame, id: Column, text: Column,
               minDf: Long = 1L): DataFrame = {
    df.select(id.as("__doc"),
        explode(array_distinct(split(lower(text), " "))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("__doc"))).as("__ds"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"),
        concat_ws(" ",
          expr("transform(__ds, (d, i) -> CASE WHEN i = 0 THEN d" +
            " ELSE d - __ds[i-1] END)")).as("gaps"))
  }

  /** Term burstiness — the Fano factor (variance/mean index of
    * dispersion) of a term's per-document occurrence counts, over the
    * documents that contain it. Content words are BURSTY (absent from
    * most docs, repeated when on-topic → Fano ≫ 1); function words are
    * Poisson-ish (Fano ≈ 1); burstiness is the corpus-linguistics
    * signal behind keyword weighting beyond raw frequency (Church &
    * Gale 1995) and a topical-vocabulary probe no plain count ranking
    * gives.
    *
    * Exact integer: with `df` containing docs, `Σc`, `Σc²`,
    * `fano_micro = (df·Σc² − (Σc)²)·10⁶ DIV (df·Σc)` — the population
    * var/mean quotient cleared of fractions; products ride
    * DECIMAL(38,0) (replay: HUGEINT). A uniform 1-per-doc term scores
    * exactly 0.
    *
    * Plan: token explode (map-side) → (term, doc) rollup → term rollup
    * (both partial-aggregated; the second reuses the first's term-side
    * hash partitioning prefix) → `minDf` floor → TakeOrderedAndProject
    * top-k, fully ordered `(fano DESC, term ASC)` for a deterministic
    * cut.
    */
  def termBurstiness(df: DataFrame, id: Column, text: Column,
                     minDf: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(k >= 1, s"k must be >= 1, got $k")
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    df.select(id.as("__doc"),
        explode(split(lower(text), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col("__doc"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df_count"),
        sum("__c").as("n_occurrences"),
        sum(col("__c") * col("__c")).as("__sc2"))
      .filter(col("df_count") >= minDf)
      .select(col("term"), col("df_count"), col("n_occurrences"),
        call_function("div",
          (dec(col("df_count")) * col("__sc2") -
            dec(col("n_occurrences")) * col("n_occurrences")) * 1000000L,
          dec(col("df_count")) * col("n_occurrences")).as("fano_micro"))
      .orderBy(col("fano_micro").desc, col("term").asc)
      .limit(k)
  }

  /** Exact phrase search over the corpus — all docs containing the
    * n-word phrase as CONSECUTIVE tokens, with match count and first
    * match position. This is the scan-side phrase matcher (the shape a
    * one-off corpus query or a contamination sweep runs); the
    * index-serving sibling would intersect [[postings]] lists with
    * positional adjacency, but over a full corpus pass the scan is one
    * map-side higher-order-function chain — ZERO shuffle, zero join,
    * perfectly partition-parallel, and the filter prunes non-matching
    * docs before anything materializes.
    *
    * Positions are 0-based token offsets in the raw `split(lower, " ")`
    * stream (empty tokens from double spaces keep their slot — position
    * semantics must not depend on whitespace hygiene).
    */
  def phraseSearch(df: DataFrame, id: Column, text: Column,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least 2 tokens")
    require(phrase.forall(t => t.nonEmpty && !t.contains(" ") &&
      !t.contains("'")), "phrase tokens must be non-empty single words")
    val n = phrase.size
    val cond = phrase.zipWithIndex.map { case (t, j) =>
      s"__a[CAST(i + $j AS INT)] = '$t'"
    }.mkString(" AND ")
    df.select(id, split(lower(text), " ").as("__a"))
      .withColumn("__hits",
        when(size(col("__a")) >= n,
          expr(s"filter(sequence(0L, CAST(size(__a) - $n AS BIGINT))," +
            s" i -> $cond)"))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")))
      .filter(size(col("__hits")) > 0)
      .select(id, size(col("__hits")).cast("long").as("n_matches"),
        element_at(col("__hits"), 1).as("first_pos"))
  }

  /** Zipf frequency spectrum: how many distinct terms fall in each
    * power-of-two corpus-frequency band, plus the band's token mass —
    * the rank-frequency fingerprint that sizes tokenizer vocabularies
    * (a healthy natural-language corpus shows the straight-line decay;
    * a boilerplate-heavy crawl bulges in the high bands) without the
    * float `log(freq)` a fitted Zipf slope would need.
    *
    * The band is PURE-INTEGER: `bucket = length(bin(freq))` — the
    * binary digit count, i.e. `floor(log2 f) + 1` — identical on any
    * engine (the t18 lesson: never emit a value whose last bit depends
    * on a transcendental). Share columns are integer ppm over the
    * vocabulary / corpus totals.
    *
    * Plan: one corpus-scale exchange (the token rollup, map-side
    * partial counts); the spectrum rollup and the total join run over
    * vocabulary- then band-scale rows (≤ ~40 bands for any corpus that
    * fits in 2⁶³ tokens). Totals attach via a broadcast 1-row frame —
    * no second pass over the data.
    */
  def frequencySpectrum(df: DataFrame, text: Column): DataFrame = {
    val counts = df
      .select(explode(split(lower(text), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("__f"))
    val bands = counts
      .groupBy(length(bin(col("__f"))).cast("long").as("band"))
      .agg(count(lit(1)).as("n_terms"), sum("__f").as("mass"))
    val tot = bands.agg(sum("n_terms").as("__vt"), sum("mass").as("__mt"))
    bands.join(broadcast(tot))
      .select(col("band"), col("n_terms"), col("mass"),
        call_function("div", col("n_terms") * 1000000L, col("__vt"))
          .as("vocab_share_ppm"),
        call_function("div", col("mass") * 1000000L, col("__mt"))
          .as("mass_share_ppm"))
  }

  /** Zipf coverage curve — what share of the corpus token MASS the top
    * 10/100/1000 vocabulary entries carry: the vocab-sizing and
    * stopword-budget report (a natural corpus puts ~half its mass in the
    * top few hundred types; a synthetic or boilerplate-heavy one is far
    * flatter or far spikier). Emits per cutoff the covered type count
    * (< cutoff when the vocabulary is smaller), covered token mass, total
    * mass, and the coverage in exact ppm.
    *
    * Plan: one unigram rollup (partial map-side), the global cut via
    * TakeOrderedAndProject at max(cutoffs) — never a full-vocab global
    * sort — then ranking + cutoff explosion over ≤ max(cutoffs) rows and
    * a cutoff-scale rollup; the corpus total rides a broadcast one-row
    * frame. The only single-partition pass is over the top-max(cutoffs)
    * slice, a constant.
    */
  def zipfCoverage(df: DataFrame, text: Column,
                   cutoffs: Seq[Int]): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs.forall(_ >= 1))
    val counts = df
      .select(explode(filter(split(lower(text), " "),
        t => length(t) > 0)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__c"))
    val total = broadcast(counts.agg(sum("__c").as("total_tokens")))
    val top = counts.orderBy(col("__c").desc, col("tok").asc)
      .limit(cutoffs.max)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c").desc, col("tok").asc)
    top
      .withColumn("__r", row_number().over(w))
      .select(col("__c"),
        explode(filter(array(cutoffs.map(lit(_)): _*),
          c => c >= col("__r"))).as("cutoff"))
      .groupBy("cutoff")
      .agg(count(lit(1)).as("n_types"), sum("__c").as("covered_tokens"))
      .crossJoin(total)
      .select(col("cutoff"), col("n_types"), col("covered_tokens"),
        col("total_tokens"),
        call_function("div", col("covered_tokens") * 1000000L,
          col("total_tokens")).as("coverage_ppm"))
  }
}
