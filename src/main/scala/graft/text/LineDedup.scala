package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-level boilerplate removal (Raffel et al. 2020, §2.2 of
  * the C4 recipe; reference repo has only doc-level filters): a line that
  * occurs in ≥ `minDf` distinct documents is navigation/footer/cookie
  * boilerplate, and every occurrence of it is struck from every document.
  * This is the step that turns scraped web pages into training text —
  * doc-level dedup ([[graft.dedup]]) can't touch it because the documents
  * differ outside the repeated lines.
  *
  * The caller supplies the line segmentation as an array column (real
  * corpora: `split(text, '\n')`; the synthetic fixture has no newlines,
  * so the registry query segments into fixed 8-token pseudo-lines — the
  * operator is agnostic). Emitted per document: line counts before/after
  * and the polynomial fingerprint of the CLEANED text, so a downstream
  * exact-dedup pass can run on the cleaned corpus without materializing
  * it twice.
  *
  * Plan: one (line → distinct-doc-count) rollup — the only line-scale
  * shuffle; qualifying lines are boilerplate-scale by definition and
  * broadcast into an ANTI join (the d16 posture — per-doc rows never
  * reshuffle for the filter); reassembly collects each doc's kept lines
  * (bounded by document size, the w14 position-credit pattern). At
  * 100 TB hash the line text to an 8-byte join key first (the d10b
  * lesson) — kept as text here so the DuckDB oracle replays verbatim.
  */
object LineDedup {

  def removeCommonLines(df: DataFrame, id: Column, lineArr: Column,
                        minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val lines = df
      .select(id.as("__id"), posexplode(lineArr).as(Seq("__pos", "__line")))
    val common = lines
      .groupBy(col("__line"))
      .agg(count_distinct(col("__id")).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__line"))
    val kept = lines
      .join(broadcast(common), Seq("__line"), "left_anti")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), " ").as("__kept_text"))
    df.select(id.as("__id"), size(lineArr).cast("long").as("n_lines"))
      .join(kept, Seq("__id"), "left")
      .select(col("__id").as("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        TextAnalysis.fingerprintHof(coalesce(col("__kept_text"), lit("")))
          .as("clean_fp"))
  }
}
