package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Rendezvous (highest-random-weight) sharding: a key lands on the shard
  * whose per-(key, shard) hash is largest. The consistent-hashing property
  * that matters for an INCREMENTAL corpus pipeline: growing `n` shards to
  * `n+1` moves ONLY the keys whose new shard's hash wins — ~1/(n+1) of
  * them, and every mover goes TO the new shard; keys never reshuffle
  * between surviving shards (a plain `hash mod n` remaps (n−1)/n of the
  * corpus, invalidating every cached/bucketed artifact). Kept simple over
  * ring-based consistent hashing: no virtual-node table to distribute, and
  * per-key cost is `n` hash evaluations — fine for shard counts in the
  * hundreds; go to a ring past that.
  *
  * Pure projection (the shard set compiles into the expression tree — no
  * join, no shuffle); hashes are the engine-neutral
  * [[TextAnalysis.tokenHash]] pushed through [[TextAnalysis.mixHash]]
  * TWICE, and the doubling is load-bearing: the n per-key candidate
  * strings differ only in their shard suffix, so their Horner hashes form
  * a near-arithmetic progression whose argmax after ONE squaring still
  * favors the endpoint shards (measured ~16% vs 12.5% at n = 8 — an AP
  * mod p wraps monotonically, so its max clusters at the wrap ends); the
  * second squaring decorrelates the progression and the argmax balances.
  * Assignments replay bit-for-bit in SQL. Ties — vanishing at 10⁻⁹ but
  * defined — keep the smallest shard id.
  */
object Sharding {

  /** The winning (hash, shard) struct for a key — strict `>` keeps the
    * earliest shard on ties. The candidates materialize as ONE array and
    * the argmax is a single `aggregate` fold: a `when(...).otherwise(...)`
    * reduce tree re-embeds each candidate's hash expression at every
    * level — the first candidate's hash is evaluated 2^(n−1) times, and
    * the n = 8 query measured 3.2 s for 5 000 rows in that shape vs
    * 0.24 s as the fold (13×, same results bit-for-bit).
    */
  private def best(key: Column, nShards: Int): Column = {
    val candidates = array((0 until nShards).map { sh =>
      struct(TextAnalysis.mixHash(TextAnalysis.mixHash(TextAnalysis.tokenHash(
        concat(key.cast("string"), lit(":" + sh))))).as("h"),
        lit(sh).as("s"))
    }: _*)
    aggregate(candidates,
      struct(lit(-1L).as("h"), lit(0).as("s")),
      (acc, c) => when(c.getField("h") > acc.getField("h"), c).otherwise(acc))
  }

  /** One row per input row: the key, its `shard`, and the winning
    * `shard_hash` (exposed so audits can verify the argmax).
    */
  def rendezvous(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val keyName = df.select(key).columns.head
    df.select(key)
      .withColumn("__b", best(col(keyName), nShards))
      .select(col(keyName), col("__b.s").as("shard"),
        col("__b.h").as("shard_hash"))
  }
}
