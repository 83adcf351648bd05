package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-quality operators a large-scale training-data pipeline runs ahead
  * of tokenization: repetition metrics (Gopher-style), rule-based document
  * filtering with drop reasons (C4-style), deterministic hash sampling (the
  * scale-safe substitute for reservoir sampling), and PII redaction.
  *
  * All per-document operators are pure projections built from codegen'd
  * built-ins + array higher-order functions — zero UDFs, zero shuffles; the
  * scan's partitioning is the parallelism, so they run unchanged on 100 TB.
  * Thresholds and hash constants are plain literals so the DuckDB oracle can
  * replay them exactly (see SparkEntry.oracleSql).
  */
object QualityFilters {

  import TextAnalysis.tokens

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1, reduced to the
    * whitespace-token level this corpus supports):
    *
    *  - `dup_token_frac`: fraction of tokens that are repeats of an earlier
    *    token (1 - distinct/total);
    *  - `top_token_frac`: share of the single most frequent token;
    *  - `top_bigram_frac`: share of the most frequent adjacent bigram
    *    (0.0 for documents of fewer than two tokens).
    *
    * The per-distinct-token count is computed row-locally with
    * `transform(distinct, d -> count in tokens)` — O(n·u) per row with no
    * shuffle, the right trade for documents (n ≲ 10⁴ tokens); an
    * explode+groupBy would pay a corpus-wide shuffle for the same answer.
    */
  def repetitionMetrics(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = tokens(text)
    val n = size(toks)
    val counts = transform(array_distinct(toks), d => size(filter(toks, t => t === d)))
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    val bigramCounts =
      transform(array_distinct(bigrams), d => size(filter(bigrams, b => b === d)))
    df.select(
      id,
      n.as("n_tokens"),
      round(lit(1.0) - size(array_distinct(toks)).cast("double") / n, 6)
        .as("dup_token_frac"),
      round(array_max(counts).cast("double") / n, 6).as("top_token_frac"),
      when(n < 2, lit(0.0))
        .otherwise(round(array_max(bigramCounts).cast("double") / (n - 1), 6))
        .as("top_bigram_frac"))
  }

  /** C4-style rule filter (Raffel et al. 2020 §2.2 adapted to this corpus):
    * every document comes back with its metrics and a `drop_reason` — NULL
    * means the document survives. Reasons are checked in a fixed order so
    * the first failing rule wins deterministically.
    *
    * Pure projection; a pipeline keeps `drop_reason IS NULL` rows and ships
    * the reason histogram as the audit artifact.
    */
  def qualityFilter(df: DataFrame, id: Column, text: Column,
                    stopwords: Seq[String],
                    minTokens: Int = 20, maxTokens: Int = 90,
                    minUniqRatio: Double = 0.4,
                    minStopwordRatio: Double = 0.02,
                    maxPunctRatio: Double = 0.05,
                    extra: Seq[Column] = Nil): DataFrame = {
    val toks = tokens(text)
    val n = size(toks)
    val uniqRatio = size(array_distinct(toks)).cast("double") / n
    val sw = typedLit(stopwords)
    val stopRatio = size(filter(toks, t => array_contains(sw, t))).cast("double") / n
    val punctRatio =
      regexp_count(text, lit("[^A-Za-z0-9 ]")).cast("double") / greatest(length(text), lit(1))
    df.select(
        (id +: n.as("n_tokens") +:
          round(uniqRatio, 6).as("uniq_ratio") +:
          round(stopRatio, 6).as("stopword_ratio") +:
          round(punctRatio, 6).as("punct_ratio") +: extra): _*)
      .withColumn("drop_reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("uniq_ratio") < minUniqRatio, "low_diversity")
          .when(col("stopword_ratio") < minStopwordRatio, "low_stopword")
          .when(col("punct_ratio") > maxPunctRatio, "high_punct"))
  }

  /** C4-style blocklist filter (Raffel et al. 2020 §2.2's bad-words rule,
    * list-agnostic): a document is DROPPED when any token appears in the
    * blocklist. Emits the evidence (`n_hits` counts token OCCURRENCES, not
    * distinct terms) alongside the verdict so downstream audits can rank
    * borderline documents without a re-scan.
    *
    * The list rides as a literal array into one codegen'd `filter` HOF —
    * no join, no shuffle, O(n·|B|) per row. At realistic list sizes
    * (≲ 10³ terms) that beats broadcasting a table and exploding tokens,
    * which pays a Generate + hash probe per token; past ~10⁴ terms switch
    * to a broadcast semi join on exploded tokens instead.
    */
  def blocklistFilter(df: DataFrame, id: Column, text: Column,
                      blocklist: Seq[String]): DataFrame = {
    val bl = typedLit(blocklist.map(_.toLowerCase))
    val hits = size(filter(tokens(text), t => array_contains(bl, t)))
    df.select(id, hits.cast("long").as("n_hits"), (hits === 0).as("keep"))
  }

  /** Deterministic keyed sampling: a document is kept iff
    * `rabinKarpHash(key) mod 1000 < rate(stratum) * 1000`. Engine-neutral
    * (the hash is [[TextAnalysis.tokenHash]] over the key rendered as a
    * string), seed-free, and stable under reshuffling/re-partitioning —
    * the property reservoir sampling loses the moment data is distributed.
    * Stratified: per-stratum permille rates with a default for unlisted
    * strata.
    */
  def hashSampleBucket(key: Column): Column =
    pmod(TextAnalysis.tokenHash(key.cast("string")), lit(1000L))

  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           permille: Map[String, Int],
                           defaultPermille: Int = 0): DataFrame = {
    val rateMap = typedLit(permille)
    val rate = coalesce(element_at(rateMap, stratum), lit(defaultPermille))
    df.withColumn("sample_bucket", hashSampleBucket(key))
      .filter(col("sample_bucket") < rate)
  }

  /** Exact-budget deterministic sample: the `n` hash-smallest keys per
    * stratum. [[stratifiedHashSample]] gives a RATE (permille) — right when
    * the budget scales with the corpus; this gives a COUNT (a fixed
    * eval-set or human-review carve-out), still seed-free and
    * partition-invariant: (tokenHash(key), key) is a total order no
    * reshuffle can change, so the same corpus always yields the same rows.
    * `row_number <= n` plans a WindowGroupLimit — each map partition
    * forwards at most n rows per stratum before the shuffle, so the
    * exchange carries O(strata × n), not the corpus. Needs one window
    * shuffle on the stratum key; rank ties are impossible (key is unique).
    */
  def stratifiedTopN(df: DataFrame, key: Column, stratum: Column,
                     n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
      .orderBy(TextAnalysis.tokenHash(key.cast("string")), key)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }

  /** Data-constrained training selection: keep the highest-quality
    * documents until a global TOKEN budget fills — the greedy prefix of
    * the (quality desc, doc_id asc) order whose running token total stays
    * ≤ `budget`. ("Given B tokens of compute, which documents train the
    * model" — the corpus-level selection step after filtering/dedup.)
    *
    * The naive formulation is a cumulative sum over a GLOBAL sort — one
    * partition swallows the corpus, the plan this operator exists to
    * refuse. Instead, exactly the same prefix via quality buckets:
    *  1. bucket docs by `floor(quality * granularity)` and aggregate
    *     token mass per bucket (one small shuffle, map-side combined);
    *  2. running total over the ≤ granularity+1 histogram rows,
    *     descending (a single-partition window over a broadcast-size
    *     frame — the ONLY serial step, and it is O(granularity));
    *  3. docs join the histogram by broadcast; buckets whose
    *     strictly-higher-bucket mass already exceeds the budget drop
    *     wholesale; surviving buckets rank WITHIN the bucket
    *     (quality desc, doc_id) in PARALLEL per-bucket windows, each
    *     offset by its bucket's higher-mass prefix.
    * Bucket order refines quality order, so concatenating buckets desc
    * with the within-bucket order IS the global order, and the kept set
    * equals the global-window answer for ANY granularity (bucketing only
    * changes parallelism: the widest per-bucket window partition shrinks
    * as granularity grows). Emits per-doc `cum_tokens` (global running
    * total) so callers can audit the boundary.
    */
  def tokenBudgetSelect(df: DataFrame, id: Column, text: Column,
                        quality: Column, budget: Long,
                        granularity: Int = 1000): DataFrame = {
    require(budget > 0, "budget must be positive")
    tokenBudgetMixture(df, id, text, quality, source = lit("__all"),
      budgetPermille = Map("__all" -> 1000), totalBudget = budget,
      defaultPermille = 0, granularity = granularity)
      .drop("source")
  }

  /** Budgeted MIXTURE realization — the per-source generalization of
    * [[tokenBudgetSelect]], and the natural consumer of
    * [[graft.text.Mixing.mixWeights]]'s targets: each source gets
    * `totalBudget * permille / 1000` tokens (integer floor; unlisted
    * sources get `defaultPermille`), filled by that source's own
    * highest-quality greedy prefix. "Realize THIS mixture with THE BEST
    * documents, under B tokens of training compute."
    *
    * Same bucket-parallel shape as the single-budget case, one level
    * deeper: the histogram aggregates per (source, bucket); its running
    * total windows per SOURCE (each partition ≤ granularity+1 rows, all
    * sources concurrent — nothing is single-partition here, unlike the
    * global variant's one tiny histogram window); docs rank in
    * per-(source, bucket) windows with broadcast offsets. Kept set per
    * source provably equals that source's global (quality desc, id)
    * prefix, any granularity.
    */
  def tokenBudgetMixture(df: DataFrame, id: Column, text: Column,
                         quality: Column, source: Column,
                         budgetPermille: Map[String, Int], totalBudget: Long,
                         defaultPermille: Int = 0,
                         granularity: Int = 1000): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    require(granularity >= 1, "granularity must be >= 1")
    require((budgetPermille.values ++ Seq(defaultPermille)).forall(p => p >= 0 && p <= 1000),
      "permilles must be in [0, 1000]")
    val rateMap = typedLit(budgetPermille)
    val srcBudget = ((lit(totalBudget) *
      coalesce(element_at(rateMap, col("source")), lit(defaultPermille))) / 1000)
      .cast("long")
    val scored = df.select(source.as("source"), id.as("doc_id"),
      size(TextAnalysis.tokens(text)).cast("long").as("n_tokens"),
      quality.as("q"))
      .withColumn("__bucket", floor(col("q") * granularity).cast("long"))
    val hist = scored.groupBy("source", "__bucket").agg(sum("n_tokens").as("__btoks"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("__bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val eligible = hist
      .withColumn("__cum_before", coalesce(sum(col("__btoks")).over(wb), lit(0L)))
      .filter(col("__cum_before") < srcBudget)
      .select("source", "__bucket", "__cum_before")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "__bucket").orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    scored.join(broadcast(eligible), Seq("source", "__bucket"))
      .withColumn("cum_tokens", col("__cum_before") + sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= srcBudget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("q"),
        col("cum_tokens"))
  }

  /** Contamination-safe train/valid/test split: the split key is a CONTENT
    * fingerprint ([[TextAnalysis.fingerprint]] — order-sensitive rolling
    * hash over the token sequence), NOT the document id — so byte-identical
    * duplicates ALWAYS co-assign to the same split. Splitting on doc_id
    * (what [[stratifiedHashSample]] does, correctly, for sampling) leaks
    * when the corpus still contains duplicates: one copy lands in train
    * and its twin in test, and the benchmark measures memorization.
    * Thresholds are permille of the 1000-bucket hash space:
    * `[0, train) = train, [train, train+valid) = valid, rest = test`.
    * Pure projection — no shuffle, stable under any partitioning, and
    * composable BEFORE dedup (that is the point: it is safe even when
    * dedup hasn't run or fuzzy dups survived exact dedup).
    */
  def leakSafeSplit(df: DataFrame, text: Column,
                    trainPermille: Int = 900,
                    validPermille: Int = 50): DataFrame = {
    require(trainPermille >= 0 && validPermille >= 0 &&
      trainPermille + validPermille <= 1000, "permilles must fit in 1000")
    val bucket = pmod(TextAnalysis.fingerprint(text), lit(1000L))
    df.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(col("split_bucket") < trainPermille, "train")
          .when(col("split_bucket") < trainPermille + validPermille, "valid")
          .otherwise("test"))
  }

  /** PII redaction: emails, IPv4 addresses, then phone-shaped digit runs —
    * in that order, so an address already rewritten to `<IP>` can't also
    * match the phone pattern. Patterns are RE2-compatible (no lookarounds)
    * so the exact same regexes run in DuckDB for the oracle.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d[\\d-]{6,}\\d"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-group winsorization: clip a numeric feature at its group's exact
    * [lo, hi] percentiles — the robust-scaling step ahead of any
    * mean/variance statistic an outlier would poison (per-source length
    * normalization being the curation instance: one 10 M-token document
    * must not define a source's length profile).
    *
    * Percentiles are Spark's EXACT linear-interpolated `percentile`
    * aggregate (partial-agg state is bounded by the value DOMAIN, not row
    * count — the [[graft.text.TextAnalysis.corpusStats]] argument; token
    * counts and quality scores are bounded domains). Bounds broadcast back
    * as a per-group 2-double frame; the clip is `greatest(lo, least(hi,
    * v))` row-locally. Emitted doubles round 6dp (the t12 idiom: a clip
    * DECISION can only flip cross-engine if an integer value sits within
    * an ulp of an interpolated bound, which interpolation between distinct
    * integers never produces).
    */
  /** Per-group z-score normalization of an integer feature — the
    * cross-source comparability step ([[winsorize]] clips outliers, this
    * rescales what remains; a 300-token doc is long for tweets, short for
    * papers — downstream thresholds want source-relative units).
    *
    * Engine-exactness: the group moments ride as INTEGER sums (Σv, Σv²
    * — value is integer, so both are exact and order-independent;
    * a float Welford/naive Σ would be partial-order-dependent). Mean and
    * variance are then fixed chains of IEEE ops on exact integer
    * operands (`s2/n − (s/n)·(s/n)`, operand order pinned in the oracle),
    * std is one correctly-rounded sqrt, and z emits as integer ppm.
    * Degenerate groups (std 0) emit z = 0 explicitly, never NaN.
    *
    * Integer-sum domain: Σv² must stay below 2^63 — at 9.2e18 that holds
    * for any corpus with v ≤ 10⁴ and ≲ 10¹¹ rows per group; beyond that
    * switch the moment columns to decimal(38,0).
    *
    * Scale shape: one aggregation shuffle on the group key (partial
    * map-side combine), broadcast moments back, row-local z.
    */
  def zscoreNormalize(df: DataFrame, id: Column, group: Column,
                      value: Column): DataFrame = {
    val idName = df.select(id).columns.head
    val v = value.cast("long")
    val m = df.groupBy(group.as("__g")).agg(
      count(lit(1)).as("__n"), sum(v).as("__s"), sum(v * v).as("__s2"))
    val mean = col("__s").cast("double") / col("__n")
    val variance = col("__s2").cast("double") / col("__n") -
      (col("__s").cast("double") / col("__n")) *
      (col("__s").cast("double") / col("__n"))
    df.select(id, group.as("source"), v.as("n_raw"))
      .join(broadcast(m), col("source") === col("__g"))
      .select(col(idName), col("source"), col("n_raw"),
        round(mean, 6).as("mean_tokens"),
        round(sqrt(variance), 6).as("std_tokens"),
        when(sqrt(variance) > 0,
          round((col("n_raw").cast("double") - mean) / sqrt(variance) * 1e6)
            .cast("long"))
          .otherwise(lit(0L)).as("z_ppm"))
  }

  def winsorize(df: DataFrame, id: Column, group: Column, value: Column,
                loPermille: Int = 50, hiPermille: Int = 950): DataFrame = {
    require(loPermille >= 0 && hiPermille <= 1000 && loPermille <= hiPermille,
      "need 0 <= lo <= hi <= 1000")
    val idName = df.select(id).columns.head
    val bounds = df.groupBy(group.as("__grp")).agg(
      percentile(value, lit(loPermille / 1000.0)).as("__plo"),
      percentile(value, lit(hiPermille / 1000.0)).as("__phi"))
    df.select(id, group.as("source"), value.cast("double").as("__v"))
      .join(broadcast(bounds), col("source") === col("__grp"))
      .select(col(idName), col("source"),
        col("__v").cast("long").as("n_raw"),
        round(col("__plo"), 6).as("lo_bound"),
        round(col("__phi"), 6).as("hi_bound"),
        round(greatest(col("__plo"), least(col("__phi"), col("__v"))), 6)
          .as("n_winsorized"))
  }

  /** CCNet-style quantile bucketing (Wenzek et al. 2020 split corpora into
    * perplexity head/middle/tail and train preferentially on the head):
    * assign each scored row to one of k equal-mass buckets by EXACT
    * interpolated quantile thresholds.
    *
    * Scale shape: the thresholds are one `percentile` AGGREGATE (proper
    * distributed partial aggregation, ≡ DuckDB `quantile_cont` — the
    * winsorize precedent) broadcast back as a 1-row frame; bucketing is
    * then row-local. The rank-based alternative (`ntile` over a global
    * order) needs a single-partition window — the one shape that cannot
    * scale. Boundary rule: `score ≤ threshold` goes to the lower bucket;
    * since both engines compute bit-identical scores and thresholds, the
    * boundary is deterministic cross-engine.
    */
  def qualityBuckets(scored: DataFrame, score: Column,
                     buckets: Seq[String]): DataFrame = {
    require(buckets.size >= 2, "need at least 2 buckets")
    val k = buckets.size
    val ths = (1 until k).map(i =>
      percentile(score, lit(i.toDouble / k)).as(s"__t$i"))
    val bounds = scored.agg(ths.head, ths.tail: _*)
    val assign = (1 until k).reverse.foldLeft(lit(buckets.last)) {
      case (acc, i) => when(score <= col(s"__t$i"), lit(buckets(i - 1)))
        .otherwise(acc)
    }
    scored.crossJoin(broadcast(bounds))
      .withColumn("bucket", assign)
      .drop((1 until k).map(i => s"__t$i"): _*)
  }
}
