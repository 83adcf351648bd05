package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashing-trick feature buckets — the audit behind every
  * fixed-width hashed bag-of-words / categorical-cross feature: how
  * evenly does the vocabulary land in `buckets` slots, and how bad
  * are the collisions. Feature hashing (Weinberger et al. 2009)
  * trades a dictionary for `h(token) mod B`; this report is the B-row
  * table that tells you whether B is big enough (distinct tokens per
  * bucket ≈ collisions a linear model will conflate).
  *
  * The hash is the engine-neutral [[TextAnalysis.tokenHash]] (base-131
  * Horner mod 1e9+7) — the same integer on Spark and any SQL oracle,
  * never a JVM-private `hashCode`. Plan: tokens roll up to
  * (bucket, token) first — map-side partials shrink the explode
  * before anything shuffles — then bucket grain. Output is exactly
  * B rows: occupancy, distinct tokens, the collision count, and the
  * heaviest single token's share of the bucket in ppm.
  */
object FeatureHash {

  /** Per-bucket profile of whitespace-tokenized, lowercased `text`
    * hashed into `buckets` slots: `bucket, n_occ, n_distinct,
    * top_token_ppm` (heaviest token's occurrence share of the
    * bucket).
    */
  def bucketProfile(docs: DataFrame, text: Column,
                    buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val perTok = docs
      .select(explode(split(lower(text), " +", -1)).as("__tok"))
      .groupBy(pmod(TextAnalysis.tokenHash(col("__tok")),
        lit(buckets.toLong)).as("bucket"), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    perTok.groupBy(col("bucket"))
      .agg(sum(col("__c")).as("n_occ"),
        count(lit(1)).as("n_distinct"),
        max(col("__c")).as("__top"))
      .select(col("bucket"), col("n_occ"), col("n_distinct"),
        call_function("div", col("__top") * lit(1000000L), col("n_occ"))
          .as("top_token_ppm"))
  }
}
