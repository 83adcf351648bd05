package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** SimHash near-duplicate detection: each document gets a 64-bit fingerprint
  * whose bits are majority votes of its token hashes; near-dups are pairs
  * with small Hamming distance.
  *
  * Bit hashes come from a pairwise-independent affine family over the
  * engine-neutral [[TextAnalysis.tokenHash]]: bit i of token t votes +1 iff
  * `(a_i·h(t) + b_i) mod P < P/2`. Pure 64-bit modular arithmetic — exactly
  * reproducible in the DuckDB oracle (unlike xxhash64 bit-sampling, which
  * only Spark can compute).
  *
  * Pairing uses the pigeonhole chunk trick: split the fingerprint into
  * `maxHamming + 1` chunks — any pair within `maxHamming` bits must agree on
  * at least one whole chunk, so an equi-join on (chunk index, chunk value)
  * finds all of them with NO quadratic stage outside the (tiny) chunk
  * buckets. This is the standard web-scale simhash-dedup layout.
  */
object SimHash {

  /** Affine-family modulus (Mersenne prime 2^31−1) and the majority-vote
    * threshold: values below `Half` vote the bit to 1.
    */
  val P: Long = 2147483647L
  val Half: Long = (P + 1) / 2 // 1073741824

  /** Deterministic per-bit hash family: (a, b) with 1 <= a < P, 0 <= b < P.
    * The d3 oracle SQL is generated from the SAME constants.
    */
  def hashParams(bits: Int = 64, seed: Long = 7L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)((1L + rnd.nextLong(P - 1), rnd.nextLong(P)))
  }

  /** (id, simhash) — one shuffle-free fold per document: hash the distinct
    * tokens once, then a single `aggregate` pass carries all 64 bit-vote
    * counters (same plan shape as [[MinHashLSH.signatures]]; the explode +
    * 64-column groupBy alternative shuffles every (doc, token) row and its
    * wide aggregate falls out of whole-stage codegen).
    */
  def fingerprints(df: DataFrame, id: Column, text: Column): DataFrame = {
    val params = hashParams()
    val hashes = transform(array_distinct(split(lower(text), " ")),
      t => TextAnalysis.tokenHash(t))
    // the 64×n vote loop runs as one generated Java nest
    // (SimHashFingerprint) — the aggregate(zip_with(...)) HOF formulation
    // costs an interpreted lambda dispatch per (token, bit)
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    df.select(id.as("__id"),
      asColumn(graft.functions.SimHashFingerprint(asExpression(hashes),
        params.map(_._1).toArray, params.map(_._2).toArray, P)).as("simhash"))
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
