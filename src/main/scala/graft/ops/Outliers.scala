package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-key outlier detection via median absolute deviation — the
  * anomaly gate that survives what breaks z-scores: a key whose history
  * already contains outliers (they inflate the stddev until nothing
  * flags) or heavy-tailed values (where "3σ" fires constantly). Median
  * and MAD have a 50% breakdown point; the flag is
  * `|v − median| > k · MAD`.
  *
  * Exactness: values arrive as integers (caller pre-scales, e.g.
  * milli-units); both medians use the [[Quantiles]] crossing rule
  * (percentile_disc — smallest value whose cumulative count reaches
  * half), so every emitted column is an integer and the comparison
  * `dev > k·mad` never touches a float. The k·MAD product stays far
  * under int64 for any sane k.
  *
  * Plan: two [[Quantiles.exact]] passes (each: one distinct-value-scale
  * rollup + window, keyed on the key) and two enrich joins back to the
  * event stream, all hash-partitioned on the SAME key — Catalyst reuses
  * the partitioning, so the chain costs two logical shuffles of the
  * distinct-value tables and one of the events. Keys whose MAD is 0
  * (over half the values identical) flag any deviation at all — the
  * documented degenerate case of the MAD rule, kept faithful.
  */
object Outliers {

  /** Flagged rows only: key, event id, value, the key's median and MAD,
    * the absolute deviation — evidence enough to audit every flag.
    */
  def madOutliers(events: DataFrame, key: Column, eventId: Column,
                  value: Column, k: Long = 3L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyName = events.select(key).columns.head
    val base = events.select(key, eventId.as("event_id"),
      value.cast("long").as("v"))
    val med = Quantiles.exact(base, col(keyName), col("v"),
        Seq("med" -> 500000L))
      .select(col(keyName), col("med"))
    val dev = base.join(med, Seq(keyName))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = Quantiles.exact(dev, col(keyName), col("dev"),
        Seq("mad" -> 500000L))
      .select(col(keyName), col("mad"))
    dev.join(mad, Seq(keyName))
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col(keyName), col("event_id"), col("v"), col("med"),
        col("mad"), col("dev"))
  }

  /** Seasonal anomaly detection over hourly event counts: each hour-of-week
    * slot (ISO dow × hour-of-day — the traffic rhythm w38/w40 profile) has
    * its own robust baseline, and an hour flags when its count deviates
    * more than `k·MAD` from ITS OWN slot's median — so Monday 09:00 is
    * judged against Monday-09:00 history, never against the weekend trough
    * (which a global MAD would let drown weekday spikes).
    *
    * Scale shape: the raw stream collapses to hour grain FIRST (one
    * map-side-combined shuffle at event scale — everything after runs on
    * calendar-scale rows, ~8.8k/year); the slot key is
    * `isodow·100 + hour` (Spark `weekday()+1` ≡ DuckDB `isodow` — the w38
    * lesson), and the baseline reuses [[madOutliers]]' exact crossing-rule
    * medians, so every emitted column is an integer.
    */
  def seasonalAnomalies(events: DataFrame, ts: Column,
                        k: Long = 3L): DataFrame = {
    val counts = events
      .select(date_trunc("hour", ts).as("__hs"))
      .groupBy("__hs")
      .agg(count(lit(1)).as("__cnt"))
      .select(unix_micros(col("__hs")).as("__hus"), col("__cnt"))
    // densify the hour spine over [min, max]: a ZERO-event hour is the
    // severest anomaly there is (total outage) — leaving it absent both
    // makes it unflaggable and skews every low-traffic slot's median up
    val spine = counts
      .agg(min(col("__hus")).as("__lo"), max(col("__hus")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"),
        lit(3600000000L))).as("__hus"))
    val t = timestamp_micros(col("__hus"))
    val hourly = spine.join(counts, Seq("__hus"), "left")
      .select(((weekday(t) + 1) * 100 + hour(t)).cast("long").as("skey"),
        col("__hus").as("__hour_us"),
        coalesce(col("__cnt"), lit(0L)).as("__cnt"))
    madOutliers(hourly, col("skey"), col("__hour_us"), col("__cnt"), k)
      .select(col("skey"), col("event_id").as("hour_us"),
        col("v").as("cnt"), col("med"), col("mad"), col("dev"))
  }
}
