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

  /** (id, simhash) — explode tokens, one groupBy with 64 vote-sums (partial
    * aggregation ⇒ the shuffle carries 64 ints per doc), then OR the sign
    * bits together.
    */
  def fingerprints(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = array_distinct(split(lower(text), " "))
    val exploded = df.select(id.as("__id"), explode(toks).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__v_$i")
    }
    exploded.groupBy(col("__id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("__id"),
        (0 until 64).map { i =>
          when(col(s"__v_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _).as("simhash"))
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
    val chunked = fps.select(col("__id"), col("simhash"), explode(chunkStructs).as("ch"))
      .select(col("__id"), col("simhash"), col("ch.c").as("c"), col("ch.cv").as("cv"))
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
