package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity — the correctness baseline that
  * [[MinHashLSH]] approximates.
  *
  * All-pairs exact Jaccard is inherently quadratic; this implementation is
  * probe-vs-corpus (left side is typically a sample or a candidate list) and
  * goes through a token-inverted-index join rather than a cross join, so
  * pairs sharing no token are never materialized. Still: at 100 TB use
  * [[MinHashLSH]] to generate candidates and this only to verify.
  */
object Jaccard {

  /** (id, shingle set) prep. */
  def shingleSets(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("__id"), array_distinct(MinHashLSH.wordShingles(text, n)).as("__set"))

  /** Exact Jaccard ≥ threshold between `probes` and `corpus` (both outputs
    * of [[shingleSets]]); id_a from probes, id_b from corpus, id_a < id_b.
    *
    * Inverted-index plan: explode both sides on shingle, equi-join on the
    * shingle (shuffle on shingle value — prunes non-overlapping pairs),
    * count shared shingles per pair, then one join back per side for set
    * sizes. |A∪B| = |A| + |B| − shared.
    */
  def similarPairs(probes: DataFrame, corpus: DataFrame, threshold: Double): DataFrame = {
    val pa = probes.select(col("__id").as("id_a"), col("__set").as("set_a"))
    val pb = corpus.select(col("__id").as("id_b"), col("__set").as("set_b"))
    val ia = pa.select(col("id_a"), size(col("set_a")).as("na"), explode(col("set_a")).as("s"))
    val ib = pb.select(col("id_b"), size(col("set_b")).as("nb"), explode(col("set_b")).as("s"))
    ia.join(ib, ia("s") === ib("s") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
