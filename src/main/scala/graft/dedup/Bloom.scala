package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered ingest gate — the scale upgrade of the exact
  * incremental gate ([[graft.ops.Dedup.dropAlreadySeen]]): instead of
  * anti-joining every batch against the FULL fingerprint history (a
  * history-scale shuffle per batch), the history compresses once into
  * a bit table of `words` int64 rows that BROADCASTS; batch rows whose
  * bit is unset are certainly new (Bloom filters have no false
  * negatives) and skip the exact check entirely, so the expensive join
  * runs only over the candidate minority. In production the bit table
  * persists between batches and the build cost amortizes to zero;
  * here it builds inline so the whole gate is one deterministic query.
  *
  * Engine-exactness: one hash function (the fingerprint itself, mod
  * m), and 62 usable bits per word — bit index ≤ 61 keeps
  * `1 << bit` inside positive int64 on BOTH engines (DuckDB
  * range-checks `1::BIGINT << 63`; the sign bit is nobody's friend in
  * a cross-engine contract). Sizing: false-positive rate ≈ fill
  * ratio `n_history / (words·62)` for the single-hash filter — spend
  * int64 words accordingly (they broadcast at ~8 bytes each; 10⁹
  * history keys at 1 % fill is ~200 MB — still broadcastable, and
  * the word table can also hash-join instead when not).
  */
object Bloom {

  /** Usable bits per int64 word (see scaladoc — sign bit excluded). */
  val BitsPerWord = 62L

  /** The packed bit table: one row per occupied word, `(word, bits)`. */
  def build(history: DataFrame, fp: Column, words: Int): DataFrame = {
    require(words >= 1, s"words must be >= 1, got $words")
    val m = words * BitsPerWord
    history.select(pmod(fp, lit(m)).as("__pos"))
      .select(call_function("div", col("__pos"), lit(BitsPerWord))
          .as("word"),
        (col("__pos") % BitsPerWord).as("__bit"))
      .groupBy(col("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(__bit AS INT)))")
        .as("bits"))
  }

  /** Gate a batch against the history and report per `group`:
    * `n_batch, n_clean` (bit unset — provably new, no exact check),
    * `n_candidates` (bit set — exact-checked), `n_true_dup`,
    * `n_false_pos` (candidates that were new after all — the cost of
    * the chosen `words`).
    */
  def gateReport(batch: DataFrame, history: DataFrame, fp: Column,
                 group: Column, words: Int): DataFrame = {
    val bloom = build(history, fp, words)
    val m = words * BitsPerWord
    val b = batch
      .select(group.as("group"), fp.as("__fp"), pmod(fp, lit(m)).as("__pos"))
      .withColumn("word",
        call_function("div", col("__pos"), lit(BitsPerWord)))
      .withColumn("__mask",
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__pos % $BitsPerWord AS INT))"))
      .join(broadcast(bloom), Seq("word"), "left")
      .withColumn("__cand", col("bits").isNotNull &&
        col("bits").bitwiseAND(col("__mask")) =!= 0)
    val trueDup = b.filter(col("__cand"))
      .join(history.select(fp.as("__fp")).distinct(), Seq("__fp"),
        "left_semi")
      .groupBy(col("group")).agg(count(lit(1)).as("__td"))
    b.groupBy(col("group"))
      .agg(count(lit(1)).as("n_batch"),
        sum(when(!col("__cand"), 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("__cand"), 1L).otherwise(0L)).as("n_candidates"))
      .join(trueDup, Seq("group"), "left")
      .select(col("group"), col("n_batch"), col("n_clean"),
        col("n_candidates"),
        coalesce(col("__td"), lit(0L)).as("n_true_dup"),
        (col("n_candidates") - coalesce(col("__td"), lit(0L)))
          .as("n_false_pos"))
  }
}
