package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** C4-style corpus-level duplicate-span removal (Raffel et al. 2020, §2.3:
  * "we discarded all but one of any three-sentence span occurring more than
  * once in the data set"), re-grained to fixed token blocks: the synthetic
  * corpus has no sentence boundaries, so the dedup unit is a disjoint
  * `spanTokens`-token block instead of a three-sentence window — the same
  * global-first-occurrence semantics on a deterministic segmentation.
  *
  * Every block keeps only its FIRST corpus occurrence (smallest
  * (doc id, position)); all later occurrences — in other documents or later
  * in the same one — are cut, and each document's surviving blocks are
  * stitched back in order. A document whose every block was cut disappears,
  * like C4's emptied pages.
  *
  * Scale shape ([[dedupSpans]], the exact/oracle path): Generate (no
  * shuffle) → ONE hash shuffle on the span text for the first-occurrence
  * window (`row_number = 1` plans a WindowGroupLimit, so each map partition
  * forwards one candidate per span — the shuffle carries survivors, not the
  * corpus) → ONE shuffle on doc id for the stitch-back aggregation. No
  * joins, no driver actions; both shuffle keys are high-cardinality, so
  * there is no skew pole. At 100 TB the span-text shuffle dominates —
  * [[dedupSpansHashed]] is the production variant that shrinks it to 8-byte
  * xxhash64 keys.
  */
object SpanDedup {

  /** @param carry per-document columns (functionally dependent on `id`,
    *               e.g. lang/source) carried through the cut and stitch —
    *               they ride the span rows and rejoin the grouping keys, so
    *               no extra join is needed downstream
    * @return one row per surviving document: (id, carry..., text, n_spans)
    *         — the stitched-back deduped text and how many blocks survived.
    */
  def dedupSpans(df: DataFrame, id: Column, text: Column,
                 spanTokens: Int = 8, carry: Seq[String] = Nil): DataFrame = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    val idName = df.select(id).columns.head
    val carryCols = carry.map(col)
    // sequence(1, 0) counts DOWN — empty documents must not reach it
    val spans = df
      .select(id +: carryCols :+ TextAnalysis.tokens(text).as("__toks"): _*)
      .filter(size(col("__toks")) > 0)
      .select(col(idName) +: carryCols :+ col("__toks") :+
        posexplode(sequence(lit(1), size(col("__toks")), lit(spanTokens)))
          .as(Seq("__pos", "__start")): _*)
      .select(col(idName) +: carryCols :+
        col("__pos").cast("long").as("__pos") :+
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(spanTokens)))
          .as("__span"): _*)
    val firstOccurrence = Window.partitionBy(col("__span"))
      .orderBy(col(idName), col("__pos"))
    spans
      .withColumn("__rn", row_number().over(firstOccurrence))
      .filter(col("__rn") === 1)
      .groupBy(col(idName) +: carryCols: _*)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__span")))),
            x => x.getField("__span")), " ").as("text"),
        count(lit(1)).as("n_spans"))
  }

  /** Production-scale variant of [[dedupSpans]]: the first-occurrence
    * window shuffles 8-byte `xxhash64(span)` keys instead of the span TEXT,
    * shrinking the dominant shuffle ~spanTokens× and replacing string sort
    * comparators with long compares. The text then rides exactly ONE
    * shuffle, un-exploded (each doc once, for the winners join), and the
    * stitch is recomputed map-side from the winning block positions.
    *
    * Plan: Generate a narrow (id, pos, hash) frame → window on hash
    * (WindowGroupLimit, ~24-byte rows) → per-doc winning-position collect
    * (narrow shuffle on id) → equi-join with the source docs on id (the
    * only text-bearing shuffle; the groupBy already partitioned the winner
    * side on id) → map-side re-tokenize + slice + stitch.
    *
    * Semantics are identical to [[dedupSpans]] up to 64-bit hash
    * collisions: two DIFFERENT spans colliding would wrongly cut the later
    * one. Birthday bound ≈ n²/2⁶⁵ — about 10⁻⁴ expected false cuts per
    * billion distinct spans, noise for C4-style lossy cleanup (and the
    * exact path exists when zero loss is required). A result-identity spec
    * pins this variant to [[dedupSpans]] on the test corpus.
    */
  def dedupSpansHashed(df: DataFrame, id: Column, text: Column,
                       spanTokens: Int = 8, carry: Seq[String] = Nil): DataFrame =
    hashedCore(df, id, text, spanTokens, carry, state = None)

  /** Shared core of [[dedupSpansHashed]] (state = None) and
    * [[dedupSpansAgainstState]] (state = Some): narrow (id, pos, hash)
    * frame → optional anti join against the already-shipped span-hash
    * state → first-occurrence window on the 8-byte hash → per-doc winning
    * positions → one un-exploded text join + map-side restitch.
    */
  private def hashedCore(df: DataFrame, id: Column, text: Column,
                         spanTokens: Int, carry: Seq[String],
                         state: Option[DataFrame]): DataFrame = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    val idName = df.select(id).columns.head
    val carryCols = carry.map(col)
    val allSpans = df
      .select(id, TextAnalysis.tokens(text).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idName), col("__toks"),
        posexplode(sequence(lit(1), size(col("__toks")), lit(spanTokens)))
          .as(Seq("__pos", "__start")))
      .select(col(idName), col("__pos").cast("long").as("__pos"),
        xxhash64(concat_ws(" ",
          slice(col("__toks"), col("__start"), lit(spanTokens)))).as("__h"))
    // already-shipped spans drop BEFORE the window, so the
    // first-occurrence shuffle carries never-seen spans only
    val narrow = state.fold(allSpans)(st =>
      allSpans.join(st.select(col("span_h").as("__h")), Seq("__h"), "left_anti"))
    val firstOccurrence = Window.partitionBy(col("__h"))
      .orderBy(col(idName), col("__pos"))
    val keepPositions = narrow
      .withColumn("__rn", row_number().over(firstOccurrence))
      .filter(col("__rn") === 1)
      .groupBy(col(idName))
      .agg(sort_array(collect_list(col("__pos"))).as("__keep"))
    // inner join: a doc whose every block was cut disappears, like the
    // exact path's emptied pages
    df.select(id +: carryCols :+ text.as("__text"): _*)
      .join(keepPositions, idName)
      .withColumn("__toks", TextAnalysis.tokens(col("__text")))
      .select(col(idName) +: carryCols :+
        array_join(transform(col("__keep"), p =>
          concat_ws(" ", slice(col("__toks"),
            (p * spanTokens + 1).cast("int"), lit(spanTokens)))), " ")
          .as("text") :+
        size(col("__keep")).cast("long").as("n_spans"): _*)
  }

  /** The span-hash state a batch contributes — the append-only table an
    * incremental span-dedup pipeline maintains between ingest runs (the
    * span analog of the d8/d12 fingerprint history). Distinct 8-byte
    * xxhash64 keys; at warehouse scale store it bucketed on `span_h` so
    * the nightly gate's anti join is a bucket-local probe.
    */
  def spanHashState(df: DataFrame, text: Column, spanTokens: Int = 8): DataFrame = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    df.select(TextAnalysis.tokens(text).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(posexplode(sequence(lit(1), size(col("__toks")), lit(spanTokens)))
        .as(Seq("__pos", "__start")), col("__toks"))
      .select(xxhash64(concat_ws(" ",
        slice(col("__toks"), col("__start"), lit(spanTokens)))).as("span_h"))
      .distinct()
  }

  /** Incremental batch-append span-dedup gate — [[dedupSpans]]'s
    * first-occurrence rule under nightly ingest (the d10 counterpart of
    * `Dedup.dropAlreadySeen`): a block is cut if it EVER shipped in a
    * previous batch (`state`, from [[spanHashState]]) or occurred earlier
    * in this batch; survivors stitch back in order and an emptied document
    * disappears. Running batches through the gate in id order, appending
    * each batch's [[spanHashState]] to the state, reproduces the one-shot
    * [[dedupSpans]] over the concatenated corpus exactly (spec-pinned).
    *
    * Scale shape: the batch's narrow (id, pos, hash) frame anti-joins the
    * state on the 8-byte hash FIRST (batch-scale shuffle; the state side
    * is a bucketed probe at warehouse scale), so the first-occurrence
    * window then runs on never-seen spans only — strictly less than d10b's
    * window input. Text rides one un-exploded join, map-side restitch, as
    * in [[dedupSpansHashed]] (same 64-bit collision caveat, same exact
    * fallback).
    */
  def dedupSpansAgainstState(batch: DataFrame, id: Column, text: Column,
                             state: DataFrame, spanTokens: Int = 8,
                             carry: Seq[String] = Nil): DataFrame =
    hashedCore(batch, id, text, spanTokens, carry, state = Some(state))

  /** Frequency-threshold boilerplate removal — the CCNet/RefinedWeb
    * sibling of [[dedupSpans]]: a block occurring in `minDocs` or more
    * DISTINCT documents is boilerplate (headers, navigation, license
    * blurbs) and is cut EVERYWHERE — including its first occurrence,
    * which is exactly where the semantics diverge from C4 keep-first
    * dedup: no document deserves to keep a cookie banner just for
    * crawling first. Survivors stitch back in order; a document that was
    * all boilerplate disappears.
    *
    * Scale shape — deliberately NOT the d10 window plan: the corpus's
    * span rows never shuffle at all. Distinct (span, doc) pairs aggregate
    * to per-span document frequencies (TWO-level groupBy, each with
    * map-side partial combine, so the shuffles carry distinct pairs /
    * distinct spans, not the corpus), the tiny `df >= minDocs` survivor
    * set broadcasts back, and the span rows take a broadcast LEFT ANTI
    * hash join (no shuffle, no sort) straight into the per-doc stitch
    * shuffle. The boilerplate set is small by construction — it is the
    * stuff that repeats corpus-wide; if a pathological corpus makes it
    * exceed the broadcast threshold, drop the hint and Spark falls back
    * to a shuffled anti join with the same semantics.
    */
  def removeBoilerplateSpans(df: DataFrame, id: Column, text: Column,
                             spanTokens: Int = 8, minDocs: Int = 3,
                             carry: Seq[String] = Nil): DataFrame = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    require(minDocs >= 2, "minDocs < 2 would cut every span")
    val idName = df.select(id).columns.head
    val carryCols = carry.map(col)
    val spans = df
      .select(id +: carryCols :+ TextAnalysis.tokens(text).as("__toks"): _*)
      .filter(size(col("__toks")) > 0)
      .select(col(idName) +: carryCols :+ col("__toks") :+
        posexplode(sequence(lit(1), size(col("__toks")), lit(spanTokens)))
          .as(Seq("__pos", "__start")): _*)
      .select(col(idName) +: carryCols :+
        col("__pos").cast("long").as("__pos") :+
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(spanTokens)))
          .as("__span"): _*)
    val boilerplate = spans
      .groupBy(col("__span"), col(idName)).agg(count(lit(1)).as("__dummy"))
      .groupBy(col("__span")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__span"))
    spans
      .join(broadcast(boilerplate), Seq("__span"), "left_anti")
      .groupBy(col(idName) +: carryCols: _*)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__span")))),
            x => x.getField("__span")), " ").as("text"),
        count(lit(1)).as("n_spans"))
  }

  /** INTRA-document repetition removal — the row-local sibling of
    * [[dedupSpans]]: drop every repeat of a block WITHIN its own document
    * (keep the first occurrence), stitch the survivors back in order.
    * Catches the looping-generator / boilerplate-self-repetition pathology
    * ([[graft.text.QualityFilters.repetitionMetrics]] measures it; this
    * removes it) without touching legitimate cross-document duplication.
    *
    * Scale shape: a PURE PROJECTION — block split, seen-before test, and
    * stitch are array HOFs per row; NO shuffle, NO state, parallelism =
    * the scan's. The seen-before test is O(blocks²) per document on block
    * strings (blocks = tokens/spanTokens; bounded by document length —
    * cap upstream like every per-doc pass).
    *
    * @return (id, n_spans, n_kept, text) — block counts before/after and
    *         the stitched text; zero-token docs pass through with empty
    *         text and 0 counts.
    */
  def dedupSpansLocal(df: DataFrame, id: Column, text: Column,
                      spanTokens: Int = 8): DataFrame = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    val idName = df.select(id).columns.head
    val toks = TextAnalysis.tokens(text)
    val nb = ceil(size(toks).cast("double") / spanTokens).cast("int")
    val blocks = transform(sequence(lit(0), nb - 1), i =>
      concat_ws(" ", slice(toks, i * spanTokens + 1, lit(spanTokens))))
    df.select(col(idName), when(nb > 0, blocks).otherwise(array()).as("__b"))
      // keep index i iff its block text does not appear among blocks 0..i-1
      // (slice with length i is empty at i=0 — no degenerate sequence)
      .withColumn("__keep", when(size(col("__b")) > 0,
        filter(sequence(lit(0), size(col("__b")) - 1),
          i => !exists(slice(col("__b"), lit(1), i),
            b => b === element_at(col("__b"), i + 1))))
        .otherwise(array()))
      .select(col(idName),
        size(col("__b")).cast("long").as("n_spans"),
        size(col("__keep")).cast("long").as("n_kept"),
        array_join(transform(col("__keep"),
          i => element_at(col("__b"), i + 1)), " ").as("text"))
  }
}
