package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the nightly-snapshot pattern the
  * reference's delete-insert consume loop implies (recompute a partition,
  * keep the rest; cf. `script/main.py`'s per-run-date delete-insert): a
  * per-key aggregate STATE is kept as a table of mergeable partials, and
  * each new batch folds in WITHOUT rescanning history.
  *
  * Why this matters at 100 TB: the full-history rollup rescans everything
  * ever ingested on every run; the incremental form scans ONLY the new
  * batch (delta-scale) plus the state table (key-scale). All chosen
  * statistics are commutative monoids — count/sum add, min/max combine,
  * so `merge(state(A), state(B)) == state(A ∪ B)` exactly, which is the
  * algebraic fact the oracle checks (the oracle recomputes from the full
  * history; the engine never does).
  *
  * Plan shape: one map-side-combined shuffle per batch at delta scale,
  * then a key-scale union+re-aggregate for the merge. Timestamps ride as
  * `epoch_us` int64 (engine-neutral, no timezone surface); money as
  * micro-units — both exact under re-aggregation in any order.
  */
object Incremental {

  /** Mergeable per-key partial state of one batch: event count, exact
    * micro-value sum, first/last event time (epoch µs).
    */
  def state(events: DataFrame, key: Column, ts: Column,
            valueMicro: Column): DataFrame =
    events
      .select(key.as("key"), unix_micros(ts).as("__us"),
        valueMicro.as("__vm"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        sum(col("__vm")).as("value_micro"),
        min(col("__us")).as("first_us"),
        max(col("__us")).as("last_us"))

  /** Fold any number of partial states into one — the nightly merge.
    * Associative and commutative: every column is a monoid fold
    * (sum/sum/min/max), so batch arrival order never changes the result.
    */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    states.reduce(_ unionByName _)
      .groupBy("key")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("value_micro")).as("value_micro"),
        min(col("first_us")).as("first_us"),
        max(col("last_us")).as("last_us"))
  }

  /** Mergeable DISTINCT-count state of one batch: the per-key KMV sketch
    * (k smallest distinct token hashes, [[graft.functions.KMinValues]]) —
    * the statistic `COUNT(DISTINCT …)` itself is NOT a monoid (distinct
    * sets don't add), but its KMV sketch IS: the k smallest of a union
    * are the k smallest of each side's k smallest, so
    * `kmvMerge(kmvState(A), kmvState(B)) == kmvState(A ∪ B)` EXACTLY —
    * sketch content, not just estimate. State is O(k) longs per key
    * (vs the unbounded distinct set an exact incremental count would
    * have to carry), which is the only shape that survives nightly
    * maintenance at 100 TB.
    */
  def kmvState(docs: DataFrame, key: Column, text: Column,
               k: Int): DataFrame = {
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    import graft.text.TextAnalysis
    docs
      .select(key.as("key"), explode(TextAnalysis.tokens(text)).as("__tok"))
      .select(col("key"), TextAnalysis.tokenHash(col("__tok")).as("__h"))
      .groupBy("key")
      .agg(asColumn(graft.functions.KMinValues(asExpression(col("__h")), k)
        .toAggregateExpression()).as("kmv"))
  }

  /** Merge KMV states and read off the estimator — the same
    * `(k-1)·M/h_k` as `t27` (exact below k). The merge re-feeds each
    * state's values through the SAME KMV aggregate (explode at k·keys
    * scale — sketch scale, never corpus scale), so the merged sketch is
    * bit-identical to a from-scratch build over the union; `state_kth`
    * (the largest kept hash) is emitted so the oracle certifies the
    * state itself, not only the derived estimate.
    */
  def kmvMerge(states: Seq[DataFrame], k: Int): DataFrame = {
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    require(states.nonEmpty, "need at least one state to merge")
    states.reduce(_ unionByName _)
      .select(col("key"), explode(col("kmv")).as("__h"))
      .groupBy("key")
      .agg(asColumn(graft.functions.KMinValues(asExpression(col("__h")), k)
        .toAggregateExpression()).as("__kmv"))
      .select(col("key"),
        when(size(col("__kmv")) < k, size(col("__kmv")).cast("long"))
          .otherwise(round(lit((k - 1).toDouble) *
            lit(graft.text.TextAnalysis.HashP.toDouble) /
            element_at(col("__kmv"), k)).cast("long")).as("n_est"),
        element_at(col("__kmv"), size(col("__kmv"))).as("state_kth"))
  }

  /** Mergeable token-frequency state of one batch: the
    * [[graft.text.CountMin]] grid — Depth×Width counters, CONSTANT size
    * regardless of vocabulary or batch size, which is what lets frequency
    * telemetry ride every nightly ingest without a vocabulary-scale
    * shuffle ever rescanning history.
    */
  def cmState(docs: DataFrame, text: Column): DataFrame =
    graft.text.CountMin.sketch(
      docs.select(explode(graft.text.TextAnalysis.tokens(text)).as("__tok")),
      col("__tok"))

  /** Cell-wise grid addition — Count-Min's merge is exact (each cell is a
    * plain sum), so `cmMerge(cmState(A), cmState(B)) == cmState(A ∪ B)`
    * cell-for-cell, the strongest possible incremental-maintenance
    * contract. Grid-scale work only.
    */
  def cmMerge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    states.reduce(_ unionByName _)
      .groupBy("row", "cell").agg(sum(col("n")).as("n"))
  }

  /** Point-estimate a fixed probe list against a maintained grid: each
    * token reads the MIN of its Depth cells (classic CM overestimate-only
    * bound). The grid broadcasts (≤ Depth·Width rows); the probe fan-out
    * is literal-array explode — nothing here touches the corpus.
    */
  def cmEstimate(grid: DataFrame, tokens: Seq[String]): DataFrame = {
    require(tokens.nonEmpty, "need at least one probe token")
    import graft.text.{CountMin, TextAnalysis}
    val probes = grid.sparkSession.range(1)
      .select(explode(array(tokens.map(lit): _*)).as("token"))
      .withColumn("__h", TextAnalysis.tokenHash(col("token")))
      .select(col("token"), explode(array((0 until CountMin.Depth).map(r =>
        struct(lit(r).as("row"),
          CountMin.cellOf(col("__h"), r).as("cell"))): _*)).as("__rc"))
      .select(col("token"), col("__rc.row").as("row"),
        col("__rc.cell").as("cell"))
    // LEFT join + coalesce 0: the sketch stores only OCCUPIED cells, but
    // CM semantics read every probed cell — an empty cell is a 0 counter
    // (dropping it would inflate an unseen token's min to its one
    // colliding hot cell, or lose the token from the report entirely)
    probes.join(broadcast(grid), Seq("row", "cell"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
  }

  /** Retraction-capable per-key state: count and exact micro-sum ONLY —
    * the group-invertible statistics (min/max are monoid-only: deleting
    * the current max forces a rescan, so [[state]] handles append-only
    * streams and THIS handles delete-bearing CDC). The Flink
    * retract-stream contract in batch form.
    */
  def retractableState(events: DataFrame, key: Column,
                       valueMicro: Column): DataFrame =
    events.select(key.as("key"), valueMicro.as("__vm"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"), sum(col("__vm")).as("value_micro"))

  /** Apply a delete batch to a maintained state by SUBTRACTING the
    * deletes' own partial state — count/sum form a group, so
    * `retract(state(A), state(D)) == state(A ∖ D)` exactly for any
    * `D ⊆ A` (multiset semantics). Keys retracted to zero rows drop from
    * the state (a key the deletes fully consume must disappear, exactly
    * as a recompute would show). Work is key-scale on both inputs; the
    * delete batch is never joined against history.
    */
  def retract(state: DataFrame, deletes: DataFrame): DataFrame =
    state.unionByName(deletes.select(col("key"),
        (-col("n_events")).as("n_events"),
        (-col("value_micro")).as("value_micro")))
      .groupBy("key")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("value_micro")).as("value_micro"))
      .filter(col("n_events") > 0)
}
