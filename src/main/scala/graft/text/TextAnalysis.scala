package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, token counting, language-ID, fingerprinting.
  *
  * Everything is built from codegen'd built-ins + array higher-order
  * functions — zero UDFs — so the operators run narrow (no shuffle at all:
  * they are pure per-row projections that scale embarrassingly to any data
  * size; the scan's partitioning is the parallelism).
  */
object TextAnalysis {

  /** Whitespace tokens, lower-cased. Single-space split (literal, not \s+)
    * keeps semantics identical across engines for the oracle check.
    */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Quality-score projection: length, token stats, uniq/stopword ratios,
    * punctuation ratio, and a BPE-ish regex token count. Ratios are rounded
    * so float formatting can't flake a hash compare.
    */
  def qualityMetrics(df: DataFrame, id: Column, text: Column,
                     stopwords: Seq[String]): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks)
    val sw = typedLit(stopwords)
    df.select(
      id,
      length(text).as("n_chars"),
      nTok.as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq_tokens"),
      round(size(array_distinct(toks)).cast("double") / nTok, 6).as("uniq_ratio"),
      round(size(filter(toks, t => array_contains(sw, t))).cast("double") / nTok, 6)
        .as("stopword_ratio"),
      round(regexp_count(text, lit("[^A-Za-z0-9 ]")).cast("double") / length(text), 6)
        .as("punct_ratio"),
      regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")).as("n_bpe_tokens"),
      round(aggregate(transform(toks, t => length(t)), lit(0), _ + _).cast("double") / nTok, 6)
        .as("avg_token_len"))
  }

  /** Language-ID via stopword-profile scoring + CJK character ratio — the
    * standard n-gram-profile heuristic reduced to marker tokens. Returns the
    * argmax language (ties broken alphabetically-last for determinism) plus
    * the per-language scores for downstream thresholding.
    */
  def languageId(df: DataFrame, id: Column, text: Column): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and", "is", "in", "to", "it"),
      "es" -> Seq("el", "la", "de", "y", "es", "en", "los", "un"),
      "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
      "fr" -> Seq("le", "la", "de", "et", "est", "un", "les", "des"))
    val toks = tokens(text)
    val scores = profiles.map { case (lang, markers) =>
      lang -> (size(filter(toks, t => array_contains(typedLit(markers), t)))
        .cast("double") / size(toks))
    }
    // CJK scripts have no whitespace markers — score by character class.
    val cjkScore = regexp_count(text, lit("[\\u4e00-\\u9fff]")).cast("double") /
      greatest(length(text), lit(1))
    val all = scores :+ ("zh" -> cjkScore)
    // argmax via lexicographic max over (score, lang) structs: deterministic.
    val best = array_max(array(all.map { case (l, s) =>
      struct(s.as("score"), lit(l).as("lang"))
    }: _*))
    df.select(
      (id +: best.getField("lang").as("pred_lang") +:
        round(best.getField("score"), 6).as("pred_score") +:
        all.map { case (l, s) => round(s, 6).as(s"score_$l") }): _*)
  }

  /** Per-group corpus statistics with EXACT percentiles (type-7 linear
    * interpolation — identical to DuckDB's `quantile_cont`). Exact (not
    * `approx_percentile`) is deliberate and still scale-safe here: Spark's
    * `Percentile` aggregates a value→count map, and the token-count domain
    * is small (bounded by max document length), so partial-aggregate state
    * stays tiny no matter how many rows flow through. For unbounded-domain
    * metrics at 100 TB, swap in `approx_percentile`.
    */
  def corpusStats(df: DataFrame, group: Column, text: Column): DataFrame = {
    val n = size(tokens(text))
    df.groupBy(group).agg(
      count(lit(1)).as("n_docs"),
      sum(n).as("total_tokens"),
      round(avg(n), 6).as("avg_tokens"),
      round(percentile(n, lit(0.5)), 6).as("p50_tokens"),
      round(percentile(n, lit(0.9)), 6).as("p90_tokens"))
  }

  /** Per-group duplication report — the number every dedup run is judged
    * by: docs, distinct content fingerprints, and the duplicate fraction
    * `1 − distinct/docs`, grouped e.g. per source. Two-level aggregation
    * (fingerprint projection → count-distinct), partial-combined on both
    * levels; the fingerprint is the engine-neutral rolling hash so the
    * oracle replays it.
    */
  def dedupStats(df: DataFrame, group: Column, text: Column): DataFrame =
    df.select(group, fingerprint(text).as("__fp"))
      .groupBy(df.select(group).columns.head)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("__fp")).as("n_unique"),
        round(lit(1.0) - countDistinct(col("__fp")).cast("double") / count(lit(1)), 6)
          .as("dup_rate"))

  /** Per-document unigram ENTROPY — the information-theoretic diversity
    * score (`H = −Σ_types (c/n)·ln(c/n)`, in nats): gibberish repetition
    * scores near 0, rich vocabulary scores near ln(n). Complements the
    * ratio-based [[qualityMetrics]] (uniq_ratio can't tell "one token
    * repeated 99× plus one other" from "two tokens 50/50"; entropy can).
    *
    * Pure projection: per-type counts and the entropy fold are array HOFs
    * over the row — no explode, no shuffle (the per-row cost is
    * O(types·tokens) string equality on the distinct-type scan — bounded
    * by document length). Each type's term is rounded to integer
    * MICRO-nats before the fold, so the sum is an integer add — engine-
    * exact in any order.
    *
    * @return (id, n_tokens, n_types, entropy_micro) — entropy in integer
    *         micro-nats.
    */
  def tokenEntropy(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val terms = transform(array_distinct(toks), t => {
      val p = size(filter(toks, x => x === t)).cast("double") / n
      round(-p * log(p) * 1e6).cast("long")
    })
    df.select(id,
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_types"),
      aggregate(terms, lit(0L), (acc, x) => acc + x).as("entropy_micro"))
  }

  /** Multi-level corpus report via ROLLUP(dim1, dim2): per-(dim1, dim2)
    * detail, per-dim1 subtotals, and the grand total in ONE aggregation
    * pass — Spark expands the grouping sets map-side, so the corpus is
    * still read once and partial-aggregated before the single shuffle
    * (vs three separate groupBy jobs). `grouping_id()` disambiguates a
    * genuine NULL dimension value from a subtotal row. The mean is a
    * quotient of the two exact integer aggregates, so the rounded value
    * is engine-exact.
    */
  def rollupStats(df: DataFrame, dim1: Column, dim2: Column,
                  text: Column): DataFrame = {
    val n = size(tokens(text)).cast("long")
    val d1 = df.select(dim1).columns.head
    val d2 = df.select(dim2).columns.head
    df.select(dim1, dim2, n.as("__n"))
      .rollup(col(d1), col(d2))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_tokens"),
        round(sum(col("__n")).cast("double") / count(lit(1)), 6)
          .as("avg_tokens"))
  }

  /** Cross-source duplicate-overlap matrix: for every unordered source
    * pair, how many distinct content keys occur in BOTH — the report that
    * tells a corpus curator which feeds re-crawl each other (and how much
    * cross-source dedup will shrink the union). Pass [[fingerprint]] for
    * byte-exact overlap or [[bagFingerprint]] for word-order-robust
    * overlap.
    *
    * Scale shape: NOT a fingerprint self-join (quadratic in the dup
    * count of a hot fingerprint and skew-prone); instead group by
    * fingerprint, collect the tiny sorted distinct-source set (bounded
    * by the source-catalog size, not the corpus), expand its ordered
    * pairs with an array HOF, and count per pair. Two bounded shuffles:
    * one on the fingerprint, one on the (source_a, source_b) key whose
    * cardinality is at most |sources|².
    */
  def sourceOverlap(df: DataFrame, source: Column, key: Column): DataFrame = {
    val fs = df.select(source.as("source"), key.as("__fp")).distinct()
    val ss = sort_array(collect_set(col("source")))
    val pairs = flatten(transform(col("__ss"), (x, i) =>
      transform(slice(col("__ss"), i + 2, size(col("__ss"))), y =>
        struct(x.as("source_a"), y.as("source_b")))))
    fs.groupBy("__fp").agg(ss.as("__ss"))
      .filter(size(col("__ss")) >= 2)
      .select(explode(pairs).as("__p"))
      .select(col("__p.source_a").as("source_a"), col("__p.source_b").as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Fixed-width token-count histogram per group: bucket `b` counts docs
    * with `n_tokens ∈ [b·width, (b+1)·width)`. Pure projection + one
    * aggregation on (group, bucket) — the shape a 100 TB length-profile
    * job needs (never a collect of raw lengths to the driver).
    */
  def tokenHistogram(df: DataFrame, group: Column, text: Column,
                     bucketWidth: Int): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    val groupName = df.select(group).columns.head
    df.select(group, (size(tokens(text)).cast("long") / bucketWidth)
        .cast("long").as("bucket"))
      .groupBy(col(groupName), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Modulus for the polynomial hashes: large prime, small enough that the
    * Horner step `acc * 131 + cp` never overflows a signed 64-bit long
    * (Spark 4 runs ANSI mode, where silent wraparound is an error).
    */
  val HashP = 1000000007L

  /** Engine-neutral token hash: base-131 Horner over character code points
    * mod [[HashP]], seeded at 7. Chosen over xxhash64 so the DuckDB oracle
    * can reproduce it exactly (`list_reduce` + `ord`) — a classic
    * Rabin–Karp rolling hash, deterministic on any engine.
    */
  def tokenHash(t: Column): Column =
    aggregate(filter(split(t, ""), c => length(c) > 0),
      lit(7L), (a, c) => pmod(a * 131 + ascii(c), lit(HashP)))

  /** Document fingerprint: order-sensitive polynomial rolling hash over
    * token hashes (base-31 Horner over [[tokenHash]], mod [[HashP]]). Equal
    * token sequences get equal fingerprints on any cluster layout. Pure
    * projection — no shuffle. Runs as the codegen'd
    * [[graft.functions.RabinFingerprint]] expression (one pass, no
    * per-character array allocation); [[fingerprintHof]] is the built-ins
    * formulation it is property-spec'd equal to.
    */
  def fingerprint(text: Column): Column = {
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    asColumn(graft.functions.RabinFingerprint(asExpression(text)))
  }

  /** The HOF/built-ins formulation of [[fingerprint]] — kept as the
    * executable specification (and for engines without the extension).
    */
  def fingerprintHof(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 31 + tokenHash(t), lit(HashP)))

  /** Order-invariant content key: [[fingerprint]]'s Horner fold over the
    * SORTED DISTINCT token array instead of the raw sequence — equal
    * bags-of-words (word-order shuffles, repetition changes) collide,
    * any vocabulary difference separates. The robust-dedup companion to
    * the exact fingerprint; pure projection, no shuffle.
    */
  def bagFingerprint(text: Column): Column =
    aggregate(sort_array(array_distinct(tokens(text))), lit(0L),
      (acc, t) => pmod(acc * 31 + tokenHash(t), lit(HashP)))

  /** Unicode NFC canonicalization (native codegen'd expression) — run it
    * BEFORE [[fingerprint]]/shingling so composed and decomposed forms of
    * the same text dedup together.
    */
  def nfc(text: Column): Column = {
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    asColumn(graft.functions.NfcNormalize(asExpression(text)))
  }

  /** Per-group distinct-token count, exact AND via the bounded-state
    * [[graft.functions.KMinValues]] sketch (k longs of aggregation state
    * per group vs `countDistinct`'s full distinct set riding every partial
    * buffer — at 100 TB the sketch is the only one of the two whose
    * map-side combine has bounded memory; the exact count is emitted here
    * for the oracle to certify the estimator against). The estimator is
    * the classic KMV read-off: exact (= sketch size) below k distinct
    * values, `(k-1)·M / h_(k)` at or above, with M = [[HashP]], the
    * engine-neutral [[tokenHash]] domain — so the WHOLE sketch replays in
    * SQL, not just its answer.
    */
  def kmvDistinctTokens(df: DataFrame, group: Column, text: Column,
                        k: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    val groupName = df.select(group).columns.head
    df.select(group, explode(tokens(text)).as("__tok"))
      .select(col(groupName), tokenHash(col("__tok")).as("__h"))
      .groupBy(col(groupName))
      .agg(
        countDistinct(col("__h")).as("n_exact"),
        asColumn(graft.functions.KMinValues(asExpression(col("__h")), k)
          .toAggregateExpression()).as("__kmv"))
      .select(col(groupName), col("n_exact"),
        when(size(col("__kmv")) < k, size(col("__kmv")).cast("long"))
          .otherwise(round(lit((k - 1).toDouble) * lit(HashP.toDouble) /
            element_at(col("__kmv"), k)).cast("long")).as("n_est"))
  }

  /** Replayable scrambler for structured keys: `(h² + 13) mod HashP`.
    * [[tokenHash]] is a Horner polynomial, so hashes of sequential keys
    * ("e1", "e2", …) form near-arithmetic runs — fine for bucketing,
    * fatal for a rank-of-leading-zeros sketch, whose geometric-tail
    * assumption needs values spread across the whole domain. Squaring mod
    * a prime tears runs apart (consecutive inputs land ~2h apart, wrapping
    * the modulus), stays in exact 64-bit range (h < 1e9+7 ⇒ h² < 2⁶⁰), and
    * replays verbatim in SQL — which xxhash64-class mixers cannot.
    */
  def mixHash(h: Column): Column = pmod(h * h + 13, lit(HashP))

  /** Bit width of the HLL bucket-quotient domain `[0, ⌈HashP/m⌉)`. */
  def hllQuotientBits(m: Int): Int = {
    val maxW = (HashP - 1) / m
    64 - java.lang.Long.numberOfLeadingZeros(maxW)
  }

  /** α·10⁶ for the standard HLL bias constants (Flajolet et al. 2007):
    * table values at m = 16/32/64, the asymptotic formula above.
    */
  def hllAlphaPpm(m: Int): Long = m match {
    case 16 => 673000L
    case 32 => 697000L
    case 64 => 709000L
    case _ if m >= 128 => Math.round(721300.0 / (1.0 + 1.079 / m))
    case _ => throw new IllegalArgumentException(
      s"HLL bias constant defined for m >= 16, got $m")
  }

  /** Per-group cardinalities via [[graft.functions.HllRegisters]]: for each
    * `(prefix, hashedColumn)` pair emits `<prefix>_exact` (countDistinct,
    * here for the oracle to certify the estimator against),
    * `<prefix>_zero_regs`, `<prefix>_s_scaled` (Σ 2^(W+1−reg) — the
    * paper's harmonic sum scaled by 2^(W+1) so it is an exact INTEGER:
    * every term is a nonneg power of two, so the sum is order-independent
    * integer addition, where the float Σ2^(−reg) depends on partial
    * ordering), and `<prefix>_est`: the raw estimator
    * `α·m²·2^(W+1) DIV (S·10⁶)` as one integer floor-division of exact
    * integer operands, switched to linear counting `round(m·ln(m/V))` below
    * `2.5m` when zero registers exist. The ln is the single float op in the
    * whole pipeline; it rounds to an INTEGER count, and HllSpec proves no
    * representable V puts `m·ln(m/V)` within 1e-6 of a rounding boundary —
    * so the branch replays engine-exactly (the t18 lesson, applied before
    * shipping rather than after).
    *
    * Feed [[mixHash]]-scrambled hashes. Multiple sketches ride ONE
    * aggregation pass (one shuffle total — the multi-sketch telemetry scan).
    */
  def hllCardinality(df: DataFrame, group: Column,
                     hashed: Seq[(String, Column)], m: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    require(hashed.nonEmpty, "need at least one (prefix, hashedColumn)")
    val groupName = df.select(group).columns.head
    val w = hllQuotientBits(m)
    val aggs = hashed.flatMap { case (p, _) =>
      Seq(countDistinct(col(s"__$p")).as(s"${p}_exact"),
        asColumn(graft.functions.HllRegisters(asExpression(col(s"__$p")), m)
          .toAggregateExpression()).as(s"__${p}_regs"))
    }
    // 2^(W+1-reg) terms via a literal lookup (reg ∈ 0..W+1) — keeps the
    // fold integer-only inside a lambda, where shiftleft isn't reachable
    val pows = (0 to w + 1).map(i => 1L << (w + 1 - i))
    val estNum = hllAlphaPpm(m) * m * m * (1L << (w + 1))
    val withStats = hashed.foldLeft(
      df.select(group +: hashed.map { case (p, c) => c.as(s"__$p") }: _*)
        .groupBy(col(groupName))
        .agg(aggs.head, aggs.tail: _*)) { case (acc, (p, _)) =>
      acc
        .withColumn(s"${p}_zero_regs",
          size(filter(col(s"__${p}_regs"), r => r === 0)).cast("long"))
        .withColumn(s"${p}_s_scaled",
          aggregate(col(s"__${p}_regs"), lit(0L),
            (a, r) => a + element_at(typedLit(pows), r + 1)))
    }
    val outCols = col(groupName) +: hashed.flatMap { case (p, _) =>
      val raw = s"$estNum DIV (${p}_s_scaled * 1000000)"
      Seq(col(s"${p}_exact"), col(s"${p}_zero_regs"), col(s"${p}_s_scaled"),
        expr(
          s"""CASE WHEN $raw <= ${5 * m / 2} AND ${p}_zero_regs > 0
             |THEN CAST(round($m * ln(CAST($m AS DOUBLE) / ${p}_zero_regs))
             |          AS BIGINT)
             |ELSE $raw END""".stripMargin).as(s"${p}_est"))
    }
    withStats.select(outCols: _*)
  }

  /** Per-document character-class composition — the script census a
    * multilingual corpus routes on before any tokenizer choice: ppm of
    * Latin letters, digits, CJK / Cyrillic / Arabic code points, spaces,
    * and everything else, plus the dominant script. Classes are EXPLICIT
    * code-point ranges (the t2 idiom — named Unicode scripts resolve
    * against different Unicode tables in Java regex vs RE2; literal
    * ranges are engine-identical). All emissions integer (counts and
    * DIV ppm); dominant-script ties break to the lexicographically
    * LARGEST name via a (count, name) struct max, same determinism
    * device as [[languageId]].
    *
    * Plan: zero-shuffle per-row projection (regexp_count is codegen'd);
    * at 100 TB this rides the scan like the other quality metrics.
    */
  def charsetProfile(df: DataFrame, id: Column, text: Column): DataFrame = {
    val idName = df.select(id).columns.head
    val classes = Seq(
      "latin" -> "[A-Za-z]",
      "digit" -> "[0-9]",
      "cjk" -> "[\\u4e00-\\u9fff]",
      "cyrillic" -> "[\\u0400-\\u04ff]",
      "arabic" -> "[\\u0600-\\u06ff]",
      "space" -> "[ ]")
    val scripts = Seq("latin", "cjk", "cyrillic", "arabic")
    val counted = df
      .select(id, text.as("__txt"))
      .select(col(idName) +:
        length(col("__txt")).cast("long").as("n_chars") +:
        classes.map { case (n, re) =>
          regexp_count(col("__txt"), lit(re)).cast("long").as(s"__$n")
        }: _*)
      .withColumn("__other", col("n_chars") -
        classes.map(c => col(s"__${c._1}")).reduce(_ + _))
    val denom = greatest(col("n_chars"), lit(1L))
    val best = array_max(array(scripts.map(s =>
      struct(col(s"__$s").as("c"), lit(s).as("s"))): _*))
    counted.select(
      col(idName) +: col("n_chars") +:
        ((classes.map(_._1) :+ "other").map(n =>
          call_function("div", col(s"__$n") * 1000000L, denom)
            .as(s"${n}_ppm")) :+
          when(best.getField("c") > 0, best.getField("s"))
            .otherwise(lit("none")).as("dominant_script")): _*)
  }

  /** Flesch reading-ease readability, integerized: per document emits
    * word / sentence / syllable counts and
    * `fre_milli = 206835 − (1015·w DIV s) − (84600·syl DIV w)` — the
    * classic formula ×1000 with each ratio taken as one exact integer
    * floor-division (engine-identical; a float chain here is the t18
    * class). Syllables use the standard vowel-group heuristic
    * (`[aeiouy]+` runs, minimum 1 per word) — the published formula's
    * own accuracy bound swamps the heuristic's error, and the counts
    * are reproducible on any engine, which a dictionary lookup is not.
    * Sentences are `[.!?]+` runs with a floor of 1 so fragments score.
    * Empty documents emit a typed-null score (readability undefined).
    *
    * Plan: pure per-row projection — zero shuffle, zero join, fully
    * codegen'd HOF chain; at 100 TB this is a map-only pass that rides
    * whatever scan produced the text column.
    */
  def readability(df: DataFrame, id: Column, text: Column): DataFrame = {
    val idName = df.select(id).columns.head
    df
      .select(id, text.as("__txt"))
      .select(col(idName),
        filter(split(lower(col("__txt")), " "), t => t =!= "").as("__w"),
        greatest(size(expr("regexp_extract_all(__txt, '[.!?]+', 0)")),
          lit(1)).cast("long").as("n_sentences"))
      .select(col(idName), size(col("__w")).cast("long").as("n_words"),
        col("n_sentences"),
        expr("aggregate(__w, CAST(0 AS BIGINT), (a, w) -> a + " +
          "greatest(size(regexp_extract_all(w, '[aeiouy]+', 0)), 1))")
          .as("n_syllables"))
      .withColumn("fre_milli",
        when(col("n_words") > 0,
          lit(206835L)
            - call_function("div", lit(1015L) * col("n_words"),
              col("n_sentences"))
            - call_function("div", lit(84600L) * col("n_syllables"),
              col("n_words")))
          .otherwise(lit(null).cast("long")))
  }

  /** Code-vs-prose heuristic — the routing gate web-corpus pipelines run
    * before language filters (code in a prose pipeline poisons n-gram
    * stats; prose in a code pipeline wastes the code tokenizer): exact
    * integer ppm of code-symbol characters (`{}()[];=<>`), digits, and
    * uppercase letters, plus the thresholded flag. All three rates are
    * `count·10⁶ DIV n_chars` with counts via length-difference after a
    * class strip (`regexp_replace` with an explicit character class —
    * Java regex ≡ RE2 on it, so any engine replays). Pure projection,
    * zero shuffle.
    */
  def codeDetect(df: DataFrame, id: Column, text: Column,
                 symbolThresholdPpm: Long = 20000L): DataFrame = {
    val n = greatest(length(text), lit(1)).cast("long")
    def classPpm(pattern: String): Column =
      call_function("div",
        (length(text) - length(regexp_replace(text, pattern, "")))
          .cast("long") * 1000000L, n)
    df.select(id.as("doc_id"), length(text).cast("long").as("n_chars"),
        classPpm("[{}()\\[\\];=<>]").as("symbol_ppm"),
        classPpm("[0-9]").as("digit_ppm"),
        classPpm("[A-Z]").as("upper_ppm"))
      .withColumn("is_code", col("symbol_ppm") >= symbolThresholdPpm)
  }
}
