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

  /** Session-depth distribution — the engagement histogram product teams
    * read first: how many sessions contain 1, 2, 3, … events, with the
    * share in exact ppm. Composes [[sessions]]; the histogram rollup and
    * its one-row total are session-count-scale.
    */
  def depthHistogram(events: DataFrame, key: Column, ts: Column,
                     gapSeconds: Long): DataFrame = {
    val hist = sessions(events, key, ts, gapSeconds)
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"))
    hist.crossJoin(broadcast(hist.agg(sum("n_sessions").as("__t"))))
      .select(col("n_events"), col("n_sessions"),
        call_function("div", col("n_sessions") * 1000000L, col("__t"))
          .as("share_ppm"))
  }

  /** Inter-arrival-time spectrum — bursty-vs-steady traffic triage: the
    * per-key gap between consecutive events, histogrammed into
    * power-of-two second bands (band = binary digit count of the gap —
    * integer, no float log; band 0 = same-second). A human browse
    * session piles into the low bands with a long tail; a fixed-rate
    * scraper puts everything in one band. One per-key window (the
    * sessionize sort), then a band-scale rollup; min/max per band show
    * the realized range.
    */
  def interArrivalSpectrum(events: DataFrame, key: Column,
                           ts: Column): DataFrame = {
    val keyName = events.select(key).columns.head
    val w = Window.partitionBy(col(keyName)).orderBy(col("__ts"))
    val gaps = events.select(key, ts.as("__ts"))
      .withColumn("__gap_s",
        call_function("div",
          unix_micros(col("__ts")) - lag(unix_micros(col("__ts")), 1).over(w),
          lit(1000000L)))
      .filter(col("__gap_s").isNotNull)
    val bands = gaps
      .groupBy(when(col("__gap_s") === 0L, 0L)
        .otherwise(length(bin(col("__gap_s"))).cast("long")).as("band"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("__gap_s")).as("min_gap_s"),
        max(col("__gap_s")).as("max_gap_s"))
    bands.crossJoin(broadcast(bands.agg(sum("n_gaps").as("__t"))))
      .select(col("band"), col("n_gaps"), col("min_gap_s"),
        col("max_gap_s"),
        call_function("div", col("n_gaps") * 1000000L, col("__t"))
          .as("share_ppm"))
  }
}
