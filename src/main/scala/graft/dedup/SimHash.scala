package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: each document gets a 64-bit fingerprint
  * whose bits are majority votes of its token hashes; near-dups are pairs
  * with small Hamming distance.
  *
  * Pairing uses the pigeonhole chunk trick: split the fingerprint into
  * `maxHamming + 1` chunks — any pair within `maxHamming` bits must agree on
  * at least one whole chunk, so an equi-join on (chunk index, chunk value)
  * finds all of them with NO quadratic stage outside the (tiny) chunk
  * buckets. This is the standard web-scale simhash-dedup layout.
  */
object SimHash {

  /** (id, simhash) — one shuffle-free fold per document: hash the distinct
    * tokens once, then a single `aggregate` pass carries all 64 bit-vote
    * counters (same plan shape as [[MinHashLSH.signatures]]; the explode +
    * 64-column groupBy alternative shuffles every (doc, token) row and its
    * wide aggregate falls out of whole-stage codegen).
    */
  def fingerprints(df: DataFrame, id: Column, text: Column): DataFrame = {
    // 1L << i for i = 0..63 — bit masks; zip_with can't shift by a column,
    // so the mask array stands in for the shift.
    val powers = typedLit((0 until 64).map(i => 1L << i))
    val hashes = transform(array_distinct(split(lower(text), " ")), t => xxhash64(t))
    val votes = aggregate(hashes, typedLit(Seq.fill(64)(0)),
      (acc, h) => zip_with(acc, powers,
        (v, p) => v + when(h.bitwiseAND(p) =!= 0, 1).otherwise(-1)))
    df.select(id.as("__id"),
      aggregate(
        zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
        lit(0L), (a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Pairs (id_a < id_b) with Hamming distance ≤ maxHamming. */
  def nearDuplicatePairs(fps: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    val chunkStructs = array((0 until chunks).map { j =>
      struct(lit(j).as("c"),
        shiftright(col("simhash"), j * bits)
          .bitwiseAND((1L << bits) - 1).as("cv"))
    }: _*)
    // Cached: the chunk self-join reads `chunked` on BOTH sides — without
    // this the fingerprint computation runs twice.
    val chunked = fps.select(col("__id"), col("simhash"), explode(chunkStructs).as("ch"))
      .select(col("__id"), col("simhash"), col("ch.c").as("c"), col("ch.cv").as("cv"))
      .cache()
    chunked.alias("x").join(chunked.alias("y"),
        col("x.c") === col("y.c") && col("x.cv") === col("y.cv") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** End-to-end: fingerprint then pair. */
  def nearDuplicates(df: DataFrame, id: Column, text: Column, maxHamming: Int = 3): DataFrame =
    nearDuplicatePairs(fingerprints(df, id, text), maxHamming)
}
