package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("intervals: versions chain half-open, latest is current") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "a"),
      (1L, ts("2024-01-02 00:00:00"), 11L, "b"),
      (1L, ts("2024-01-05 00:00:00"), 12L, "c"),
      (2L, ts("2024-01-03 00:00:00"), 13L, "x")
    ).toDF("user_id", "ts", "event_id", "state")
    val out = Scd2.intervals(changes, col("user_id"), col("ts"),
        col("event_id"), col("state"))
      .orderBy("user_id", "version")
      .select("user_id", "version", "state", "valid_from", "valid_to",
        "is_current")
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 1, "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")), false),
      (1L, 2, "b", ts("2024-01-02 00:00:00"), Some(ts("2024-01-05 00:00:00")), false),
      (1L, 3, "c", ts("2024-01-05 00:00:00"), None, true),
      (2L, 1, "x", ts("2024-01-03 00:00:00"), None, true)))
  }

  test("intervals: equal timestamps order by the tie-break, deterministically") {
    val t = ts("2024-01-01 12:00:00")
    val changes = Seq(
      (1L, t, 20L, "second"), (1L, t, 19L, "first")
    ).toDF("user_id", "ts", "event_id", "state")
    val out = Scd2.intervals(changes, col("user_id"), col("ts"),
        col("event_id"), col("state"))
      .orderBy("version").select("version", "state", "is_current")
      .as[(Int, String, Boolean)].collect().toSeq
    assert(out == Seq((1, "first", false), (2, "second", true)))
  }

  test("timeWeightedMean: held durations weight the value, horizon closes the last") {
    // user 1: value 2000 milli held 00:00→06:00 (6h), 8000 held 06:00→24:00
    // (18h) → (2000·6 + 8000·18)/24 = 6500
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 2000L),
      (1L, ts("2024-01-01 06:00:00"), 2L, 8000L)
    ).toDF("user_id", "ts", "event_id", "vm")
    val out = graft.ops.Scd2.timeWeightedMean(changes, col("user_id"),
        col("ts"), col("event_id"), col("vm"),
        horizonTs = "2024-01-02 00:00:00")
      .as[(Long, Long, Long)].head()
    assert(out == ((1L, 86400000000L, 6500L)))
  }

  test("timeWeightedMean: a tied pair gives its first member zero weight") {
    val t = ts("2024-01-01 00:00:00")
    val changes = Seq(
      (1L, t, 1L, 999999L), // zero-duration: overwritten in the same µs
      (1L, t, 2L, 4000L)
    ).toDF("user_id", "ts", "event_id", "vm")
    val out = graft.ops.Scd2.timeWeightedMean(changes, col("user_id"),
        col("ts"), col("event_id"), col("vm"),
        horizonTs = "2024-01-01 01:00:00")
      .as[(Long, Long, Long)].head()
    assert(out == ((1L, 3600000000L, 4000L)))
  }

  test("intervals costs exactly one hash exchange (shared window)") {
    spark.conf.set("spark.graft.parallelizeInputs", "false")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.queries("w6_scd2_intervals")(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.graft.parallelizeInputs", "true")
    }
  }

  test("lookup: each fact gets the version valid at its timestamp") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "bronze"),
      (1L, ts("2024-02-01 00:00:00"), 11L, "silver"),
      (1L, ts("2024-03-01 00:00:00"), 12L, "gold")
    ).toDF("k", "ts", "id", "tier")
    val dim = Scd2.intervals(changes, col("k"), col("ts"), col("id"),
        col("tier"))
      .select(col("k").as("d_k"), col("valid_from"), col("version"),
        col("tier"))
    val facts = Seq(
      (100L, 1L, ts("2024-01-15 00:00:00")),  // bronze era
      (101L, 1L, ts("2024-02-01 00:00:00")),  // boundary: silver starts
      (102L, 1L, ts("2024-06-01 00:00:00")),  // current (gold)
      (103L, 1L, ts("2023-12-01 00:00:00"))   // before history → dropped
    ).toDF("fact_id", "k", "fts")
    val out = Scd2.lookup(facts, dim, Seq(("k", "d_k")), "fts")
      .select("fact_id", "version", "tier")
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set((100L, 1, "bronze"), (101L, 2, "silver"),
      (102L, 3, "gold")))
  }
}
