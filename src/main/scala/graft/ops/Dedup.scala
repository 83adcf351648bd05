package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-1-per-key dedup — the reference's signature pattern (SURVEY §2.5,
  * W1–W4; reference `1-basedata_first_query.sql:4-5`,
  * `3-basedata_df_final_query.sql:49-63`).
  *
  * `row_number() OVER (PARTITION BY keys ORDER BY order)` then keep rank 1.
  *
  * Scale notes:
  *  - One shuffle on the partition keys; Spark's window exec sorts within
  *    partitions, so the cost is shuffle + sort — the minimum possible for
  *    this semantics without a pre-bucketed layout.
  *  - Callers MUST pass a total order (unique tiebreaker last) or the
  *    surviving row is partition-order-dependent (SURVEY §7 hard-point 1).
  *  - For very hot keys the window itself is skew-sensitive; AQE cannot
  *    split a single window partition. If one key dominates, pre-aggregate
  *    with max_by instead (see [[Aggregates.argmax]]) which gets map-side
  *    partial aggregation for free.
  */
object Dedup {

  /** Keep the first row per key group under `order` (ascending list as
    * given — pass `col.desc` for latest-first).
    */
  def topOnePerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest version per (entity, calendar day) — W2
    * (`1-basedata_first_query.sql:4-5`): dedup a CDC stream to one record
    * per listing per day, newest change wins.
    */
  def latestPerKeyAndDay(
      df: DataFrame,
      key: Column,
      changeTs: Column,
      tiebreak: Seq[Column]): DataFrame =
    topOnePerKey(df, Seq(key, to_date(changeTs)), changeTs.desc +: tiebreak)

  /** Exact duplicate removal at training-data scale: group identical values
    * of `dupKeys` and keep the row with the smallest `keep` value.
    * Hash-shuffle on the dup key; equivalent plan to `groupBy(...).agg(min_by)`
    * but preserves all columns without listing them.
    */
  def dropExactDuplicates(df: DataFrame, dupKeys: Seq[Column], keep: Column): DataFrame =
    topOnePerKey(df, dupKeys, Seq(keep.asc))

  /** Incremental ingest dedup — the daily-pipeline counterpart of the
    * full-corpus dedups: drop batch rows whose dedup key already exists in
    * the historical corpus (anti join), then keep one row per key WITHIN
    * the batch (smallest `keep` wins). The history side projects the key
    * ONLY before the join, so at 100 TB the anti join shuffles 8-byte
    * fingerprints, never documents; with history stored bucketed by the
    * key, its side of the shuffle disappears entirely.
    */
  def dropAlreadySeen(batch: DataFrame, history: DataFrame,
                      key: Column, keep: Column): DataFrame = {
    val seen = history.select(key.as("__seen")).distinct()
    topOnePerKey(batch.join(seen, key === col("__seen"), "left_anti"),
      Seq(key), Seq(keep.asc))
  }

  /** Soft deduplication — downweight instead of drop: every row keeps its
    * place in the corpus but carries `weight_ppm = 10⁶ div n_copies` over
    * its exact-duplicate cluster, so a document duplicated 100× trains
    * with 1% loss weight instead of 100× gradient mass (the SoftDeDup
    * idea: repetition signal preserved, memorization pressure removed —
    * and no content is ever deleted, which matters when the dup cluster
    * spans licensing tiers the hard-drop variants can't arbitrate).
    *
    * Plan: one fingerprint-keyed rollup (map-side combined) + one shuffle
    * join back on the same key — Catalyst reuses the partitioning, and
    * only the 8-byte key plus a count travels, never the text twice.
    */
  def softDedupWeights(df: DataFrame, id: Column, dupKey: Column): DataFrame = {
    val keyed = df.select(id.as("doc_id"), dupKey.as("__k"))
    val sizes = keyed.groupBy("__k").agg(count(lit(1)).as("n_copies"))
    keyed.join(sizes, Seq("__k"))
      .select(col("doc_id"), col("n_copies"),
        expr("1000000 div n_copies").as("weight_ppm"))
  }

  /** Corpus snapshot diff — the data-versioning audit between two runs of
    * an ingest pipeline: classify every id as `added` (new only),
    * `removed` (old only), `changed` (both, different content
    * fingerprint), or `unchanged`. The input is (id, fingerprint)
    * projections, never full documents — the caller supplies a content
    * hash column (`md5(text)` is the engine-neutral default), so at
    * 100 TB the full-outer join shuffles two slim (id, 16-byte) frames.
    * With both snapshots stored bucketed by id (the [[dropAlreadySeen]]
    * history convention) the join is zero-shuffle.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, fpCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("__id"), col(fpCol).as("__fp_old"))
    val n = newSnap.select(col(idCol).as("__id"), col(fpCol).as("__fp_new"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__fp_old").isNull, lit("added"))
          .when(col("__fp_new").isNull, lit("removed"))
          .when(col("__fp_old") === col("__fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Normalization-key ("fuzzy-exact") dedup — the cheapest rung of the
    * near-dup ladder, standard in web-corpus pipelines between byte-exact
    * dedup and MinHash: collapse documents that differ only in case,
    * punctuation, or whitespace. The key is the canonicalized text
    * (casefold → non-alphanumerics to spaces → runs of spaces collapsed →
    * trimmed); one group per key keeps the smallest id and reports the
    * collapse count. One hash shuffle on the key with map-side partials.
    * At 100 TB, shuffle an 8-byte fingerprint OF the key instead of the
    * key text (the [[graft.dedup.SpanDedup]] hashed-key posture) — the
    * string key here is what makes the oracle replay engine-neutral.
    */
  def normalizedDedup(df: DataFrame, id: Column, text: Column): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))
    df.select(id.as("__id"), norm.as("__k"))
      .groupBy(col("__k"))
      .agg(min(col("__id")).as("kept_doc_id"),
        count(lit(1)).as("n_copies"))
      .select(col("kept_doc_id"), col("n_copies"),
        length(col("__k")).cast("long").as("norm_len"))
  }
}
