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
  * Scale shape: Generate (no shuffle) → ONE hash shuffle on the span text
  * for the first-occurrence window (`row_number = 1` plans a
  * WindowGroupLimit, so each map partition forwards one candidate per span
  * — the shuffle carries survivors, not the corpus) → ONE shuffle on doc id
  * for the stitch-back aggregation. No joins, no driver actions; both
  * shuffle keys are high-cardinality, so there is no skew pole. At 100 TB
  * the span shuffle dominates; pre-hashing spans to 8-byte keys (xxhash64)
  * would shrink it ~spanTokens× at the cost of engine-neutral oracle
  * replay, so the text key stays — swap in the hash for production.
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
}
