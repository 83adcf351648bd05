package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding APPLICATION (Sennrich et al. 2016): encode text
  * against a FIXED, rank-ordered merge table — the tokenizer-apply step a
  * training-data pipeline runs at corpus scale after the (offline,
  * single-machine) BPE training produced the merges.
  *
  * Correctness of the rank-ascending single sweep: trained merge tables
  * are CONSTRUCTIVE — a pair at rank r references only symbols that are
  * single characters or outputs of merges at ranks < r (that is how BPE
  * training builds them). Under that invariant, applying each merge once
  * in rank order IS the full iterate-to-fixpoint BPE: a merge at rank r
  * creates the new symbol `ab`, and `ab` can only ever participate in
  * pairs of rank > r — which the sweep has not reached yet. No earlier
  * pair can newly appear (merging replaces two adjacent symbols with one;
  * it never makes two OLD symbols adjacent). [[validate]] enforces the
  * invariant instead of assuming it. Within one rank, occurrences merge
  * greedy-leftmost non-overlapping — and a re-match against the freshly
  * merged symbol is impossible (`ab = a` would need `b` empty), so one
  * left-to-right pass per rank is also exhaustive for that rank.
  *
  * Plan shape: a PURE PROJECTION — zero shuffles, zero joins; the merge
  * table compiles into the expression tree (one fold per rank), so 100 TB
  * of text encodes embarrassingly parallel. Each per-word fold carries
  * (accumulated subwords, one pending symbol) — O(word length) work per
  * rank.
  */
object Bpe {

  /** Enforce the constructive invariant: every multi-character symbol a
    * rank-r pair references must be the output of some merge at rank < r.
    */
  def validate(merges: Seq[(String, String)]): Unit = {
    val built = scala.collection.mutable.Set[String]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      Seq(a, b).foreach { sym =>
        require(sym.nonEmpty, s"rank $r: empty symbol")
        require(sym.length == 1 || built.contains(sym),
          s"rank $r references '$sym', which no earlier merge builds — " +
            "not a constructively-ordered (trained) merge table")
      }
      built += a + b
    }
  }

  /** One greedy-leftmost merge pass of (a, b) → ab over a symbol array.
    * Fold state: (emitted symbols, one pending symbol) — the pending slot
    * is what lets the pass see adjacency without indexed access.
    */
  private def mergePass(arr: Column, a: String, b: String): Column = {
    def st(acc: Column, pend: Column) =
      struct(acc.as("acc"), pend.as("pend"))
    aggregate(arr,
      st(array().cast("array<string>"), lit(null).cast("string")),
      (s, t) => when(s.getField("pend").isNull,
          st(s.getField("acc"), t))
        .when(s.getField("pend") === a && t === b,
          st(concat(s.getField("acc"), array(lit(a + b))),
            lit(null).cast("string")))
        .otherwise(st(concat(s.getField("acc"),
          array(s.getField("pend"))), t)),
      s => when(s.getField("pend").isNull, s.getField("acc"))
        .otherwise(concat(s.getField("acc"), array(s.getField("pend")))))
  }

  /** Encode one word column: characters in, subword array out. */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(filter(split(word, ""), c => length(c) > 0)) {
      case (cur, (a, b)) => mergePass(cur, a, b)
    }

  /** Per-document BPE: `n_tokens` (words), `bpe_text` (space-joined
    * subwords), `n_bpe_tokens` — the corpus-scale tokenizer-apply report.
    *
    * Empty words (consecutive/leading/trailing spaces, empty text) are
    * dropped BEFORE encoding on both the engine and oracle sides: an empty
    * word encodes to zero subwords, so keeping it would make `n_tokens`
    * count phantom words while contributing nothing to `bpe_text` — and the
    * contract must not depend on corpus whitespace hygiene.
    */
  def encode(df: DataFrame, id: Column, text: Column,
             merges: Seq[(String, String)]): DataFrame = {
    validate(merges)
    df.select(id,
        filter(split(lower(text), " "), w => length(w) > 0).as("__w"))
      .select(id, size(col("__w")).as("n_tokens"),
        flatten(transform(col("__w"), w => encodeWord(w, merges)))
          .as("__enc"))
      .select(id, col("n_tokens"),
        concat_ws(" ", col("__enc")).as("bpe_text"),
        size(col("__enc")).as("n_bpe_tokens"))
  }
}
