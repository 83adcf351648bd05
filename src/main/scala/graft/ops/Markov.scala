package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key event streams:
  * `P(next state | current state)` in integer ppm — the
  * next-event-prediction feature table (recommendation priors, anomaly
  * scoring against expected flows, funnel leak maps). Transitions are
  * WITHIN a key's timeline, ordered by `(ts, event_id)` — the pair
  * (last event of user A, first event of user B) is never a transition.
  *
  * Plan: one shuffle keys the lead window; the (cur, next) rollup
  * partial-aggregates; the per-cur normalizer is a window over the
  * STATE-DOMAIN-scale count table (|states|² rows — dozens), so the
  * only data-scale work is the first sort. Shares are
  * `cnt·10⁶ DIV Σ_cur` — engine-exact, and each row's denominator
  * rides along as `n_from` so consumers can re-derive exact fractions.
  */
object Markov {

  def transitionMatrix(events: DataFrame, key: Column, ts: Column,
                       eventId: Column, state: Column): DataFrame = {
    val keyName = events.select(key).columns.head
    val w = Window.partitionBy(col(keyName))
      .orderBy(col("__us"), col("__eid"))
    val wCur = Window.partitionBy(col("cur_state"))
    events
      .select(key, unix_micros(ts).as("__us"), eventId.as("__eid"),
        state.as("cur_state"))
      .withColumn("next_state", lead(col("cur_state"), 1).over(w))
      .filter(col("next_state").isNotNull)
      .groupBy("cur_state", "next_state")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from", sum("n").over(wCur))
      .withColumn("share_ppm",
        call_function("div", col("n") * 1000000L, col("n_from")))
  }

  /** Top-k length-3 event paths — the sequential-pattern rollup behind
    * "what do users actually do" journey maps (the order-3 sibling of
    * [[transitionMatrix]]'s order-1 view; k-length paths are the unit
    * clickstream mining tools rank). Two `lead`s on ONE per-key window
    * (single sort), trigrams never cross keys, the count rollup
    * partial-aggregates, and the top-k ends in TakeOrderedAndProject
    * (per-partition heaps — no global sort), fully ordered
    * `(n DESC, path ASC)` for a deterministic cut boundary.
    */
  def topPaths(events: DataFrame, key: Column, ts: Column,
               eventId: Column, state: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyName = events.select(key).columns.head
    val w = Window.partitionBy(col(keyName))
      .orderBy(col("__us"), col("__eid"))
    events
      .select(key, unix_micros(ts).as("__us"), eventId.as("__eid"),
        state.as("s1"))
      .select(col("s1"), lead(col("s1"), 1).over(w).as("s2"),
        lead(col("s1"), 2).over(w).as("s3"))
      .filter(col("s3").isNotNull)
      .groupBy("s1", "s2", "s3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1").asc, col("s2").asc, col("s3").asc)
      .limit(k)
  }
}
