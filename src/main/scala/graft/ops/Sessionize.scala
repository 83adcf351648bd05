package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: consecutive events of the
  * same key belong to one session while the gap between them stays under
  * `gapSeconds`; a larger gap opens the next session.
  *
  * Plan shape: one running window over (key, ts) marks session OPENS
  * (gap > threshold or first event), a running sum turns the marks into a
  * per-key session sequence number, and the per-session rollup groups by
  * (key, seq). Catalyst satisfies the groupBy's clustering from the
  * window's hash-partitioning on the key, so the whole operator costs ONE
  * shuffle — the session aggregation never re-exchanges. Gaps compare in
  * exact integer MICROseconds (`unix_micros` ≙ DuckDB `epoch_us`) — a
  * seconds cast would truncate and misclassify sub-second gaps, and
  * fractional-epoch doubles round differently across engines. Events tied
  * on (key, ts) sessionize deterministically whatever their scan order:
  * intra-tie gaps are zero, so no tie-break column is needed.
  *
  * The streaming analog is Spark's native `session_window`
  * ([[graft.streaming.StreamOps.sessionCounters]]); this batch form exists
  * because the reference-style daily job sessionizes landed history, where
  * a watermark has no meaning.
  */
object Sessionize {

  /** One row per (key, session): sequence number (1-based, in time order),
    * event count, and the session's start/end timestamps.
    */
  def sessions(events: DataFrame, key: Column, ts: Column,
               gapSeconds: Long): DataFrame = {
    require(gapSeconds >= 1, "gapSeconds must be >= 1")
    val keyName = events.select(key).columns.head
    val w = Window.partitionBy(col(keyName)).orderBy(col("__ts"))
    val prev = lag(unix_micros(col("__ts")), 1).over(w)
    events
      .select(key, ts.as("__ts"))
      .withColumn("__open",
        when(prev.isNull ||
          unix_micros(col("__ts")) - prev > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__open")).over(w))
      .groupBy(col(keyName), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__ts")).as("session_start"),
        max(col("__ts")).as("session_end"))
  }
}
