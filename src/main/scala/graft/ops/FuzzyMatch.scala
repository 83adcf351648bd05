package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy self-match on short strings (names, SKUs, codes) within
  * Levenshtein distance 1 — the record-linkage primitive for typo-level
  * entity resolution. The all-pairs formulation is O(n²) and dies at
  * warehouse scale; the candidate stage here is the SymSpell
  * deletion-neighborhood scheme (Garbe 2012): each string emits its
  * distinct single-deletion variants plus itself as JOIN KEYS, and any
  * two strings within distance 1 provably share a key —
  *
  *   - substitution at i: deleting i from both sides yields the same
  *     string, so both emit it;
  *   - insertion/deletion: deleting the inserted char from the longer
  *     side yields the shorter side verbatim, which emits itself.
  *
  * So key-equality candidates are LOSSLESS (100% recall), and the exact
  * `levenshtein ≤ 1` filter after the join restores 100% precision —
  * the same bucket-join-then-verify shape as the MinHash/Jaccard dedup
  * family, with bucket fan-out = string length + 1 and bucket width
  * bounded by the alphabet (≈ length × |Σ| strings can share one
  * deletion key), never corpus-wide.
  *
  * Plan: map-side key explode, ONE shuffle on the key, pair distinct
  * (a pair can share several keys), then the exact verify on the
  * DISTINCT pair set. Pairs emit once with `id_a < id_b`.
  */
object FuzzyMatch {

  def selfPairs(df: DataFrame, id: Column, name: Column): DataFrame = {
    val base = df.select(id.as("__id"), name.as("__s"))
    def keyed(suffix: String) = base
      .select(col("__id").as(s"id$suffix"), col("__s").as(s"name$suffix"),
        explode(array_distinct(expr(
          "concat(array(__s), transform(sequence(1, length(__s)), i -> " +
            "concat(substring(__s, 1, i - 1), substring(__s, i + 1))))")))
          .as("__key"))
    keyed("_a")
      .join(keyed("_b"), Seq("__key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 1)
  }
}
