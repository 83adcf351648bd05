package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{KeyedEvent, StreamOps}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("latestPerKey keeps newest row per key across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StreamOps.startMemorySink(
      StreamOps.latestPerKey(input.toDS()).toDF(), "latest_q", OutputMode.Update())

    input.addData(
      KeyedEvent(1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0),
      KeyedEvent(1L, ts("2024-01-01 11:00:00"), 101L, "view", 2.0),
      KeyedEvent(2L, ts("2024-01-01 09:00:00"), 102L, "click", 3.0))
    query.processAllAvailable()
    // out-of-order late event for key 1 must NOT displace the newer state
    input.addData(KeyedEvent(1L, ts("2024-01-01 10:30:00"), 103L, "click", 9.0))
    query.processAllAvailable()

    val rows = spark.table("latest_q")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts")).as("latest"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    query.stop()
    assert(rows(1L) == 101L) // 11:00 event survives the 10:30 late arrival
    assert(rows(2L) == 102L)
  }

  test("latestPerKeyWithTtl answers like latestPerKey and GCs idle state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    // Generous TTL so nothing times out mid-test. With a processing-time
    // timeout registered the engine schedules timeout-check batches FOREVER
    // — the stream never idles, so processAllAvailable blocks and even an
    // AvailableNow query does not self-terminate (both measured). The only
    // stable pattern is: add data, poll the sink for the expected answer,
    // stop. Cross-trigger late-arrival ordering is covered by the
    // latestPerKey test — this pins the TTL variant's semantics and
    // exercises its setTimeoutDuration path.
    input.addData(
      KeyedEvent(1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0),
      KeyedEvent(1L, ts("2024-01-01 11:00:00"), 101L, "view", 2.0),
      KeyedEvent(1L, ts("2024-01-01 10:30:00"), 103L, "click", 9.0),
      KeyedEvent(2L, ts("2024-01-01 09:00:00"), 102L, "click", 3.0))
    val query = StreamOps.startMemorySink(
      StreamOps.latestPerKeyWithTtl(input.toDS(), "1 hour").toDF(),
      "latest_ttl_q", OutputMode.Update())
    try {
      def latest() = spark.table("latest_ttl_q")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap // user -> event
      val deadline = System.currentTimeMillis + 120000
      while (System.currentTimeMillis < deadline &&
        (latest().get(1L) != Some(101L) || !latest().contains(2L)))
        Thread.sleep(200)
      assert(latest() == Map(1L -> 101L, 2L -> 102L)) // 11:00 beats late 10:30
    } finally query.stop()
  }

  test("windowedCounters emits per-window counts and sums after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val counters = StreamOps.windowedCounters(
      input.toDF(), "ts", "user_id", "value", "1 hour", "10 minutes")
    val query = StreamOps.startMemorySink(counters, "counter_q", OutputMode.Append())

    input.addData(
      KeyedEvent(1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.5),
      KeyedEvent(1L, ts("2024-01-01 10:20:00"), 2L, "click", 2.5),
      KeyedEvent(2L, ts("2024-01-01 10:40:00"), 3L, "click", 4.0))
    query.processAllAvailable()
    // advance watermark far enough to close the 10:00 window
    input.addData(KeyedEvent(3L, ts("2024-01-01 12:00:00"), 4L, "click", 0.0))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("counter_q")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.contains((1L, 2L, 4.0))) // key 1: two events, 1.5 + 2.5
    assert(out.contains((2L, 1L, 4.0)))
  }

  test("sessionCounters: native session_window closes sessions at the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StreamOps.startMemorySink(
      StreamOps.sessionCounters(input.toDS().toDF(), "ts", "user_id",
        gap = "30 minutes", watermarkDelay = "0 seconds"),
      "session_q", OutputMode.Append())

    input.addData(
      KeyedEvent(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      KeyedEvent(1L, ts("2024-01-01 10:20:00"), 2L, "view", 1.0),  // merges
      KeyedEvent(1L, ts("2024-01-01 12:00:00"), 3L, "click", 1.0)) // new session
    query.processAllAvailable()
    // advance the watermark far enough to close and emit both sessions
    input.addData(KeyedEvent(9L, ts("2024-01-02 00:00:00"), 9L, "click", 1.0))
    query.processAllAvailable()
    val rows = spark.table("session_q")
      .filter(org.apache.spark.sql.functions.col("user_id") === 1L)
      .select("n_events").as[Long].collect().sorted.toSeq
    query.stop()
    assert(rows == Seq(1L, 2L), s"expected sessions of 2 and 1 events, got $rows")
  }

  test("partition-overwrite sink lands micro-batches idempotently (streaming K3)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, date_format}
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-k3").toString
    def start(input: MemoryStream[KeyedEvent], cp: String) =
      StreamOps.startPartitionOverwriteSink(
        input.toDS().toDF().withColumn("pm", date_format(col("ts"), "yyyy-MM")),
        s"$outDir/table", "pm", s"$outDir/$cp")

    val first = MemoryStream[KeyedEvent]
    val q1 = start(first, "cp1")
    first.addData(
      KeyedEvent(1L, ts("2024-01-05 10:00:00"), 1L, "click", 1.0),
      KeyedEvent(2L, ts("2024-02-05 10:00:00"), 2L, "view", 2.0))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(s"$outDir/table").count() == 2)

    // the post-failure at-least-once case: a new query incarnation
    // re-processes the SAME January/February data (plus a new month) into
    // the same table — its partitions must overwrite, not append
    val replay = MemoryStream[KeyedEvent]
    val q2 = start(replay, "cp2")
    replay.addData(
      KeyedEvent(1L, ts("2024-01-05 10:00:00"), 1L, "click", 1.0),
      KeyedEvent(2L, ts("2024-02-05 10:00:00"), 2L, "view", 2.0),
      KeyedEvent(3L, ts("2024-03-05 10:00:00"), 3L, "click", 3.0)) // new month
    q2.processAllAvailable()
    q2.stop()
    val back = spark.read.parquet(s"$outDir/table")
    assert(back.count() == 3, "replayed partitions must overwrite, not append")
    assert(back.select("pm").distinct().count() == 3)
  }

  test("partition-overwrite sink: closed-window append survives a partition " +
       "value spanning input triggers") {
    // The sink's contract: one micro-batch per partition value. The safe
    // pattern is a window-derived partition in Append mode — events for the
    // same window arrive across SEVERAL triggers, but the watermark emits
    // the window ONCE, complete, after it closes. (Under the old hardcoded
    // Update mode each trigger would re-land only its changed keys and the
    // last rewrite dropped every key not updated in that trigger.)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, date_format}
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-k3w").toString
    val input = MemoryStream[KeyedEvent]
    val counters = StreamOps.windowedCounters(
      input.toDS().toDF(), "ts", "user_id", "value",
      windowDuration = "1 hour", watermarkDelay = "0 seconds")
      .withColumn("pd", date_format(col("window_start"), "yyyy-MM-dd"))
    val q = StreamOps.startPartitionOverwriteSink(
      counters, s"$outDir/table", "pd", s"$outDir/cp")

    // two triggers feed the SAME 10:00 window with different keys
    input.addData(KeyedEvent(1L, ts("2024-01-05 10:05:00"), 1L, "click", 1.0))
    q.processAllAvailable()
    input.addData(KeyedEvent(2L, ts("2024-01-05 10:15:00"), 2L, "view", 2.0))
    q.processAllAvailable()
    // nothing lands until the watermark closes the window
    // a third trigger advances the watermark past 11:00, closing it
    input.addData(KeyedEvent(3L, ts("2024-01-05 12:00:00"), 3L, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(s"$outDir/table")
      .filter(col("window_start") === ts("2024-01-05 10:00:00"))
    // BOTH keys survive: the window landed once, complete
    assert(back.count() == 2,
      s"closed window must land complete, got ${back.collect().mkString(";")}")
  }

  test("intervalJoin pairs events within the time bound, across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[KeyedEvent]
    val views = MemoryStream[KeyedEvent]
    val joined = StreamOps.intervalJoin(
      clicks.toDS().toDF(), views.toDS().toDF(),
      keyCol = "user_id", tsCol = "ts",
      lookback = "10 minutes", lookahead = "10 minutes",
      watermarkDelay = "0 seconds")
    val query = StreamOps.startMemorySink(joined, "ij_q", OutputMode.Append())

    clicks.addData(KeyedEvent(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0))
    query.processAllAvailable()
    // right event arrives a TRIGGER later but within the interval — the
    // buffered left row must still pair with it
    views.addData(
      KeyedEvent(1L, ts("2024-01-01 10:05:00"), 2L, "view", 1.0),  // in range
      KeyedEvent(1L, ts("2024-01-01 10:30:00"), 3L, "view", 1.0),  // out of range
      KeyedEvent(2L, ts("2024-01-01 10:05:00"), 4L, "view", 1.0))  // wrong key
    query.processAllAvailable()
    val pairs = spark.table("ij_q").select("event_id", "event_id_r")
      .as[(Long, Long)].collect().toSet
    query.stop()
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("intervalJoin left_outer emits unmatched left rows once the watermark " +
       "proves no partner can arrive") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[KeyedEvent]
    val views = MemoryStream[KeyedEvent]
    val joined = StreamOps.intervalJoin(
      clicks.toDS().toDF(), views.toDS().toDF(),
      keyCol = "user_id", tsCol = "ts",
      lookback = "10 minutes", lookahead = "10 minutes",
      watermarkDelay = "0 seconds", joinType = "left_outer")
    val query = StreamOps.startMemorySink(joined, "ij_lo_q", OutputMode.Append())

    clicks.addData(
      KeyedEvent(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),  // will match
      KeyedEvent(2L, ts("2024-01-01 10:00:00"), 2L, "click", 1.0))  // never matches
    views.addData(KeyedEvent(1L, ts("2024-01-01 10:05:00"), 3L, "view", 1.0))
    query.processAllAvailable()
    // advance BOTH watermarks past 10:10 so user 2's click provably has no
    // in-interval partner — only then may the null-padded row emit
    clicks.addData(KeyedEvent(9L, ts("2024-01-01 12:00:00"), 8L, "click", 1.0))
    views.addData(KeyedEvent(9L, ts("2024-01-01 12:00:00"), 9L, "view", 1.0))
    query.processAllAvailable()
    val got = spark.table("ij_lo_q")
      .select("event_id", "event_id_r").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    query.stop()
    assert(got.contains((1L, 3L)), s"matched pair missing: $got")
    assert(got.contains((2L, -1L)), s"null-padded unmatched left row missing: $got")
    // the inner-mode guard: an unsupported join type fails fast
    intercept[IllegalArgumentException] {
      StreamOps.intervalJoin(clicks.toDS().toDF(), views.toDS().toDF(),
        "user_id", "ts", "10 minutes", "10 minutes", "0 seconds", "full_outer")
    }
  }

  test("repairCdcStream resurrects tombstones from managed state across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StreamOps.startMemorySink(
      StreamOps.repairCdcStream(input.toDS()).toDF(), "repair_q",
      OutputMode.Append())

    // trigger 1: two versions; trigger 2: a tombstone → borrows v2's payload
    input.addData(
      KeyedEvent(1L, ts("2024-01-01 10:00:00"), 1L, "upsert", 10.0),
      KeyedEvent(1L, ts("2024-01-01 11:00:00"), 2L, "upsert", 20.0),
      // tombstone with NO prior version → dropped
      KeyedEvent(2L, ts("2024-01-01 09:00:00"), 3L, "error", -1.0))
    query.processAllAvailable()
    input.addData(KeyedEvent(1L, ts("2024-01-02 00:00:00"), 4L, "error", -1.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("repair_q").collect()
      .map(r => (r.getLong(0), r.getString(3), r.getDouble(4))).toSeq
    // 2 versions pass through + 1 resurrected with value 20.0; user 2 dropped
    assert(rows.count(_._2 == "upsert") == 2)
    assert(rows.contains((1L, "error", 20.0)))
    assert(!rows.exists(_._1 == 2L))
  }

  test("repairCdcStreamEventTime repairs CROSS-TRIGGER disorder the eager variant misses") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StreamOps.startMemorySink(
      StreamOps.repairCdcStreamEventTime(input.toDS(), "10 minutes").toDF(),
      "repair_et_q", OutputMode.Append())

    // trigger 1: v1 and a tombstone, both inside the watermark horizon —
    // nothing finalizes yet
    input.addData(
      KeyedEvent(1L, ts("2024-01-01 10:00:00"), 1L, "upsert", 10.0),
      KeyedEvent(1L, ts("2024-01-01 10:05:00"), 2L, "error", -1.0))
    query.processAllAvailable()
    // trigger 2: a LATE version that predates the tombstone (event-time
    // 10:03 arriving after the tombstone's trigger) + a watermark-advancing
    // event on another key
    input.addData(
      KeyedEvent(1L, ts("2024-01-01 10:03:00"), 3L, "upsert", 30.0),
      KeyedEvent(2L, ts("2024-01-01 11:00:00"), 4L, "upsert", 1.0))
    query.processAllAvailable()
    // trigger 3: nudge so the event-time timeout fires after the watermark
    // advanced past 10:05
    input.addData(KeyedEvent(2L, ts("2024-01-01 11:30:00"), 5L, "upsert", 2.0))
    query.processAllAvailable()
    query.stop()

    val k1 = spark.table("repair_et_q").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getString(3), r.getTimestamp(1), r.getDouble(4))).toSet
    // the tombstone resurrects the LATE 10:03 version (value 30), exactly
    // like the batch operator replaying the landed table would
    assert(k1.contains(("error", ts("2024-01-01 10:05:00"), 30.0)), s"got $k1")
    assert(k1.contains(("upsert", ts("2024-01-01 10:00:00"), 10.0)))
    assert(k1.contains(("upsert", ts("2024-01-01 10:03:00"), 30.0)))
  }

  test("repairCdcStreamEventTime collapses duplicate (key, ts) tombstones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StreamOps.startMemorySink(
      StreamOps.repairCdcStreamEventTime(input.toDS(), "5 minutes").toDF(),
      "repair_et_dup_q", OutputMode.Append())

    input.addData(
      KeyedEvent(1L, ts("2024-01-01 10:00:00"), 1L, "upsert", 10.0),
      KeyedEvent(1L, ts("2024-01-01 10:05:00"), 2L, "error", -1.0),
      KeyedEvent(1L, ts("2024-01-01 10:05:00"), 3L, "error", -1.0))
    query.processAllAvailable()
    input.addData(KeyedEvent(2L, ts("2024-01-01 12:00:00"), 9L, "upsert", 0.0))
    query.processAllAvailable()
    input.addData(KeyedEvent(2L, ts("2024-01-01 12:30:00"), 10L, "upsert", 0.0))
    query.processAllAvailable()
    query.stop()

    val k1 = spark.table("repair_et_dup_q").collect().filter(_.getLong(0) == 1L)
    // one version + ONE resurrected row (batch tie rule), not two
    assert(k1.count(_.getString(3) == "error") == 1)
    assert(k1.count(_.getString(3) == "upsert") == 1)
  }

  test("dedupWithinWatermark suppresses duplicate ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val deduped = StreamOps.dedupWithinWatermark(
      input.toDF(), Seq("event_id"), "ts", "1 hour")
    val query = StreamOps.startMemorySink(deduped, "dedup_q", OutputMode.Append())

    input.addData(
      KeyedEvent(1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0),
      KeyedEvent(1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0), // dup
      KeyedEvent(1L, ts("2024-01-01 10:01:00"), 101L, "view", 2.0))
    query.processAllAvailable()
    query.stop()

    assert(spark.table("dedup_q").count() == 2)
  }

  test("corpus quality filter + fingerprint dedup run unchanged on a stream") {
    // The corpus-prep operators are projections, so the same Columns drive
    // batch and streaming: filter by quality rules, fingerprint, then
    // watermark-bounded content dedup — an incremental DataPrep.
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val good = ("the data " * 15).trim             // 30 tokens, passes rules
    val prepared = graft.text.QualityFilters.qualityFilter(
        docs, col("doc_id"), col("text"),
        stopwords = Seq("the", "a"), minUniqRatio = 0.05,
        extra = Seq(col("ts"),
          graft.text.TextAnalysis.fingerprint(col("text")).as("fingerprint")))
      .filter(col("drop_reason").isNull)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fingerprint")
    val query = StreamOps.startMemorySink(prepared, "prep_q", OutputMode.Append())

    input.addData(
      (1L, ts("2024-01-01 10:00:00"), good),
      (2L, ts("2024-01-01 10:01:00"), good),        // same content → deduped
      (3L, ts("2024-01-01 10:02:00"), "tiny doc"))  // fails too_short
    query.processAllAvailable()
    input.addData((4L, ts("2024-01-01 10:05:00"), good + " extra")) // new content
    query.processAllAvailable()
    query.stop()

    val kept = spark.table("prep_q").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("KMV sketch aggregates incrementally in a streaming group-by") {
    // TypedImperativeAggregate's update/merge contract IS the streaming
    // state contract: per-window distinct estimates with O(k) state per
    // group, where streaming countDistinct is unsupported outright and
    // collect_set state grows with the distinct count.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    val sketched = input.toDF().toDF("user_id", "ts", "item_hash")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(asColumn(graft.functions.KMinValues(
        asExpression(col("item_hash")), 4).toAggregateExpression()).as("kmv"))
    val query = StreamOps.startMemorySink(sketched, "kmv_q", OutputMode.Update())

    input.addData((1L, ts("2024-01-01 10:00:00"), 9L),
      (1L, ts("2024-01-01 10:10:00"), 3L), (1L, ts("2024-01-01 10:20:00"), 7L))
    query.processAllAvailable()
    // a later trigger MERGES into existing window state: 5 enters, 9 falls out
    input.addData((1L, ts("2024-01-01 10:30:00"), 5L),
      (1L, ts("2024-01-01 10:40:00"), 1L), (1L, ts("2024-01-01 10:50:00"), 3L))
    query.processAllAvailable()
    query.stop()

    val last = spark.table("kmv_q").orderBy(col("window.start"))
      .select("kmv").collect().last.getSeq[Long](0)
    assert(last == Seq(1L, 3L, 5L, 7L))
  }

  test("Count-Min grid accumulates across triggers and matches the batch sketch") {
    // The CM grid is a plain (row, cell) streaming group-by: constant
    // Depth×Width state regardless of vocabulary, updatable per trigger —
    // frequency telemetry over an unbounded token stream where an exact
    // per-token count would grow state with the vocabulary.
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val toksOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(explode(split(lower(col("text")), " ")).as("token"))
    val sketched = graft.text.CountMin.sketch(
      toksOf(input.toDF().toDF("id", "ts", "text")), col("token"))
    val query = StreamOps.startMemorySink(sketched, "cm_q", OutputMode.Complete())

    input.addData((1L, ts("2024-01-01 10:00:00"), "a a b c"))
    query.processAllAvailable()
    input.addData((2L, ts("2024-01-01 10:10:00"), "a c d d d"))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("cm_q")
      .select("row", "cell", "n").as[(Int, Long, Long)].collect().toSet
    val batch = graft.text.CountMin.sketch(
        toksOf(Seq((1L, "a a b c"), (2L, "a c d d d")).toDF("id", "text")),
        col("token"))
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch, "streaming grid must equal the batch grid")
    assert(streamed.size <= graft.text.CountMin.Depth * graft.text.CountMin.Width)
  }

  test("HLL registers accumulate across triggers and match the batch sketch") {
    // Elementwise-max merge makes the register array a CRDT: per-window
    // cardinality telemetry in m BYTES of state per group, where
    // countDistinct is unsupported in streaming and collect_set state
    // grows with the distinct count.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    def mixed(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("h", graft.text.TextAnalysis.mixHash(
        pmod(col("item"), lit(graft.text.TextAnalysis.HashP))))
    val sketched = mixed(input.toDF().toDF("user_id", "ts", "item"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(asColumn(graft.functions.HllRegisters(
        asExpression(col("h")), 16).toAggregateExpression()).as("regs"))
    val query = StreamOps.startMemorySink(sketched, "hll_q", OutputMode.Update())

    input.addData((1L, ts("2024-01-01 10:00:00"), 900001L),
      (1L, ts("2024-01-01 10:10:00"), 900002L))
    query.processAllAvailable()
    input.addData((1L, ts("2024-01-01 10:30:00"), 900003L),
      (1L, ts("2024-01-01 10:40:00"), 900002L)) // dup: registers unchanged
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("hll_q").orderBy(col("window.start"))
      .select("regs").collect().last.getSeq[Int](0)
    val batch = mixed(Seq(900001L, 900002L, 900003L).toDF("item"))
      .agg(asColumn(graft.functions.HllRegisters(
        asExpression(col("h")), 16).toAggregateExpression()).as("regs"))
      .select("regs").collect().head.getSeq[Int](0)
    assert(streamed == batch, "streamed registers must equal the batch sketch")
    assert(streamed.length == 16)
  }

  test("funnelStages carries stage state across triggers and matches the batch fold") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val steps = Seq("signup", "view", "purchase")
    val staged = StreamOps.funnelStages(input.toDS(), steps)
    val query = StreamOps.startMemorySink(staged.toDF(), "funnel_q",
      OutputMode.Update())

    def ev(u: Long, t: String, id: Long, tp: String) =
      KeyedEvent(u, ts(t), id, tp, 0.0)
    // trigger 1: user 1's view PRECEDES signup (ignored), then signup;
    // user 2 signs up
    input.addData(ev(1L, "2024-01-01 09:00:00", 1, "view"),
      ev(1L, "2024-01-01 10:00:00", 2, "signup"),
      ev(2L, "2024-01-01 10:00:00", 3, "signup"))
    query.processAllAvailable()
    // trigger 2: user 1 advances through view AND purchase in one batch;
    // user 2's purchase cannot skip the view stage
    input.addData(ev(1L, "2024-01-01 11:00:00", 4, "view"),
      ev(1L, "2024-01-01 11:30:00", 5, "purchase"),
      ev(2L, "2024-01-01 11:00:00", 6, "purchase"))
    query.processAllAvailable()
    query.stop()

    val last = spark.table("funnel_q")
      .groupBy("user_id").agg(max(struct(col("at_us"), col("stage"))).as("s"))
      .select(col("user_id"), col("s.stage")).as[(Long, Int)].collect().toMap
    assert(last == Map(1L -> 3, 2L -> 1))

    // the same events through the BATCH fold give the same reached stages
    val batch = graft.ops.Funnel.conversion(
      Seq((1L, ts("2024-01-01 09:00:00"), "view"),
        (1L, ts("2024-01-01 10:00:00"), "signup"),
        (2L, ts("2024-01-01 10:00:00"), "signup"),
        (1L, ts("2024-01-01 11:00:00"), "view"),
        (1L, ts("2024-01-01 11:30:00"), "purchase"),
        (2L, ts("2024-01-01 11:00:00"), "purchase"))
        .toDF("user_id", "ts", "event_type"),
      col("user_id"), col("ts"), col("event_type"), steps)
      .select("step_idx", "n_keys").as[(Int, Long)].collect().toMap
    // stage >= k counts: step 1 → both users, steps 2 and 3 → user 1 only
    assert(batch == Map(1 -> 2L, 2 -> 1L, 3 -> 1L))
  }

  test("abandonmentStream decides at the watermark and matches the batch frame") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val outcomes = StreamOps.abandonmentStream(input.toDS(),
      touchTypes = Seq("view", "click"), conversionType = "purchase",
      windowSeconds = 3600L, watermarkDelay = "0 seconds")
    val query = StreamOps.startMemorySink(outcomes.toDF(), "abandon_q",
      OutputMode.Append())

    def ev(u: Long, t: String, id: Long, tp: String) =
      KeyedEvent(u, ts(t), id, tp, 0.0)
    // trigger 1: two clicks; nothing decidable yet
    input.addData(ev(1L, "2024-01-01 10:00:00", 1, "click"),
      ev(2L, "2024-01-01 10:00:00", 2, "click"))
    query.processAllAvailable()
    assert(spark.table("abandon_q").count() == 0)
    // trigger 2: user 1 converts IN window — still held until the
    // deadline passes (an earlier conversion could arrive late)
    input.addData(ev(1L, "2024-01-01 10:30:00", 3, "purchase"))
    query.processAllAvailable()
    // trigger 3+: advance the watermark past both deadlines (11:00)
    input.addData(ev(9L, "2024-01-01 13:00:00", 9, "signup"))
    query.processAllAvailable()
    input.addData(ev(9L, "2024-01-01 13:30:00", 10, "signup"))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("abandon_q")
      .select("user_id", "touch_id", "converted_us", "abandoned")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    def us(s: String) = ts(s).getTime * 1000L
    assert(streamed == Set(
      (1L, 1L, Some(us("2024-01-01 10:30:00")), false),
      (2L, 2L, None, true)))

    // batch operator over the same events agrees
    val batch = graft.ops.Attribution.unconvertedTouches(
      Seq((1L, ts("2024-01-01 10:00:00"), 1L, "click"),
        (2L, ts("2024-01-01 10:00:00"), 2L, "click"),
        (1L, ts("2024-01-01 10:30:00"), 3L, "purchase"),
        (9L, ts("2024-01-01 13:00:00"), 9L, "signup"),
        (9L, ts("2024-01-01 13:30:00"), 10L, "signup"))
        .toDF("user_id", "ts", "event_id", "event_type"),
      col("user_id"), col("ts"), col("event_id"),
      col("event_type").isin("view", "click"),
      col("event_type") === "purchase", windowSeconds = 3600L)
      .select("user_id", "touch_id", "converted_us", "abandoned")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(batch == streamed)
  }

  test("ewmaPerKey: O(1) state lands on the batch operator's exact fixpoint") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val smoothed = StreamOps.ewmaPerKey(input.toDS(), alphaPpm = 500000L)
    val query = StreamOps.startMemorySink(smoothed.toDF(), "ewma_q",
      OutputMode.Update())

    def ev(u: Long, t: String, id: Long, v: Double) =
      KeyedEvent(u, ts(t), id, "m", v)
    val all = Seq(
      // trigger 1: user 1 two readings (out of order inside the batch),
      // user 2 one
      Seq(ev(1L, "2024-01-01 00:00:01", 2, 3.0),
        ev(1L, "2024-01-01 00:00:00", 1, 1.0),
        ev(2L, "2024-01-01 00:00:00", 3, 10.0)),
      // trigger 2: state carries — user 1's EWMA continues from 2000
      Seq(ev(1L, "2024-01-01 00:00:02", 4, 0.5),
        ev(2L, "2024-01-01 00:00:01", 5, 4.0)))
    all.foreach { batch => input.addData(batch: _*); query.processAllAvailable() }
    query.stop()

    val streamed = spark.table("ewma_q")
      .groupBy("user_id")
      .agg(max(struct(col("n_obs"), col("last_us"), col("ewma_milli"))).as("s"))
      .select(col("user_id"), col("s.n_obs"), col("s.ewma_milli"))
      .as[(Long, Long, Long)].collect().map { case (u, n, e) => u -> ((n, e)) }.toMap
    // hand fold, α=0.5: u1: 1000 → (3000+1000)/2=2000 → (500+2000)/2=1250
    //                   u2: 10000 → (4000+10000)/2=7000
    assert(streamed == Map(1L -> ((3L, 1250L)), 2L -> ((2L, 7000L))))

    // the batch operator over the union of all triggers agrees exactly
    val batchOut = graft.ops.Ewma.smooth(
        all.flatten.map(e => (e.user_id, e.ts, e.event_id, e.value))
          .toDF("user_id", "ts", "event_id", "value"),
        col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 1000) AS BIGINT)"), alphaPpm = 500000L)
      .select(col("user_id"), col("n_obs"), col("ewma_milli"))
      .as[(Long, Long, Long)].collect().map { case (u, n, e) => u -> ((n, e)) }.toMap
    assert(batchOut == streamed)
  }

  test("holtPerKey: two-long state lands on the batch Holt fixpoint") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val smoothed = StreamOps.holtPerKey(input.toDS(),
      alphaPpm = 200000L, betaPpm = 300000L)
    val query = StreamOps.startMemorySink(smoothed.toDF(), "holt_q",
      OutputMode.Update())

    def ev(u: Long, t: String, id: Long, v: Double) =
      KeyedEvent(u, ts(t), id, "m", v)
    val all = Seq(
      // trigger 1: the w23 hand case's first two points (out of order)
      Seq(ev(1L, "2024-01-01 00:00:01", 2, 2.0),
        ev(1L, "2024-01-01 00:00:00", 1, 1.0)),
      // trigger 2: state carries into the third point
      Seq(ev(1L, "2024-01-01 00:00:02", 3, 3.0)))
    all.foreach { batch => input.addData(batch: _*); query.processAllAvailable() }
    query.stop()

    val streamed = spark.table("holt_q")
      .groupBy("user_id")
      .agg(max(struct(col("n_obs"), col("last_us"), col("level_milli"),
        col("trend_milli"))).as("s"))
      .select(col("user_id"), col("s.n_obs"), col("s.level_milli"),
        col("s.trend_milli"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // hand fold (EwmaSpec's case): l=1608, b=164
    assert(streamed == Seq((1L, 3L, 1608L, 164L)))

    val batchOut = graft.ops.Ewma.holt(
        all.flatten.map(e => (e.user_id, e.ts, e.event_id, e.value))
          .toDF("user_id", "ts", "event_id", "value"),
        col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 1000) AS BIGINT)"),
        alphaPpm = 200000L, betaPpm = 300000L)
      .select(col("user_id"), col("n_obs"), col("level_milli"),
        col("trend_milli"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(batchOut == streamed)
  }

  test("holtWintersPerKey: fixed-width seasonal state lands on the batch fixpoint") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val smoothed = StreamOps.holtWintersPerKey(input.toDS(),
      alphaPpm = 200000L, betaPpm = 300000L, gammaPpm = 400000L)
    val query = StreamOps.startMemorySink(smoothed.toDF(), "hw_q",
      OutputMode.Update())

    def ev(u: Long, t: String, id: Long, v: Double) =
      KeyedEvent(u, ts(t), id, "m", v)
    // 9 points split across triggers so the warm-up period STRADDLES the
    // trigger boundary — the state must resume phase 1 mid-period
    val vs = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.15)
    val all = Seq(vs.take(4), vs.slice(4, 8), vs.drop(8)).zipWithIndex
      .map { case (chunk, t) =>
        chunk.zipWithIndex.map { case (v, i) =>
          val pos = vs.indexOf(v)
          ev(1L, f"2024-01-01 00:00:${pos}%02d", pos.toLong, v)
        }
      }
    all.foreach { batch => input.addData(batch: _*); query.processAllAvailable() }
    query.stop()

    val streamed = spark.table("hw_q")
      .groupBy("user_id")
      .agg(max(struct(col("n_obs"), col("level_milli"), col("trend_milli"),
        col("s1"), col("s2"), col("s3"), col("s4"), col("s5"), col("s6"),
        col("s7"))).as("s"))
      .select(col("user_id"), col("s.n_obs"), col("s.level_milli"),
        // batch season_milli reads the NEXT position's slot:
        // (n_obs % 7) + 1 = (9 % 7) + 1 = 3
        col("s.trend_milli"), col("s.s3"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    val batchOut = graft.ops.Ewma.holtWinters(
        all.flatten.map(e => (e.user_id, e.ts, e.event_id, e.value))
          .toDF("user_id", "ts", "event_id", "value"),
        col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 1000) AS BIGINT)"),
        alphaPpm = 200000L, betaPpm = 300000L, gammaPpm = 400000L)
      .select(col("user_id"), col("n_obs"), col("level_milli"),
        col("trend_milli"), col("season_milli"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(streamed == batchOut,
      s"streamed $streamed != batch $batchOut")
  }

  test("Incremental.state maintains across micro-batches via foreachBatch (IVM)") {
    import org.apache.spark.sql.{DataFrame, Row, Dataset}
    import org.apache.spark.sql.functions.{col, expr}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val vm = expr("CAST(round(value * 1000000) AS BIGINT)")
    // the maintained state table — in production a key-scale sink table;
    // here materialized per batch (the merge itself is the op under test)
    var state: Option[DataFrame] = None
    val q = input.toDS().toDF().writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val bs = graft.ops.Incremental.state(batch.toDF(), col("user_id"),
          col("ts"), vm)
        val merged = state
          .map(st => graft.ops.Incremental.merge(Seq(st, bs)))
          .getOrElse(bs)
        state = Some(spark.createDataFrame(
          java.util.Arrays.asList(merged.collect(): _*), merged.schema))
        ()
      }
      .start()
    val b1 = Seq(
      KeyedEvent(1L, ts("2024-01-02 10:00:00"), 1L, "click", 0.1),
      KeyedEvent(2L, ts("2024-01-01 00:00:00"), 2L, "view", 0.007))
    val b2 = Seq(
      KeyedEvent(1L, ts("2024-01-20 09:00:00"), 3L, "click", 0.05),
      KeyedEvent(3L, ts("2024-02-01 12:00:00"), 4L, "view", 0.009))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = state.get.orderBy("key")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val batchAll = graft.ops.Incremental.state((b1 ++ b2).toDF(),
        col("user_id"), col("ts"), vm)
      .orderBy("key").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batchAll, s"streamed $streamed != batch $batchAll")
  }

  /** Rows in the stateful operator's store at the most recent batch — the
    * number SCALE.md's streaming claims rest on. `recentProgress` keeps the
    * last batches; the newest entry with a state operator is the current
    * store size.
    */
  private def stateRows(query: org.apache.spark.sql.streaming.StreamingQuery): Long =
    query.recentProgress.reverseIterator
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(-1L)

  test("state-size audit: CDC repair state is O(keys), and buffers drain at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StreamOps.startMemorySink(
      StreamOps.repairCdcStreamEventTime(input.toDS(), "1 minute").toDF(),
      "state_audit_repair_q", OutputMode.Append())

    // 50 keys × 4 in-horizon events each: 200 buffered events, but the
    // store must hold ONE row per key (the buffer is a field of the row,
    // not a row per event)
    val burst = for (k <- 1L to 50L; i <- 0 to 3) yield
      KeyedEvent(k, ts(f"2024-01-01 10:0$i%d:00"), k * 10 + i, "upsert", i.toDouble)
    input.addData(burst: _*)
    query.processAllAvailable()
    assert(stateRows(query) == 50L,
      s"expected one state row per key, got ${stateRows(query)}")

    // advance the watermark past every buffered event (12:00 - 1 min
    // horizon covers all of 10:0x): buffers finalize; keys keep ONLY the
    // O(1) latest-version row (needed for tombstone resurrection), plus
    // the new key — state is O(keys), never O(history)
    input.addData(KeyedEvent(999L, ts("2024-01-01 12:00:00"), 9990L, "upsert", 0.0))
    query.processAllAvailable()
    input.addData(KeyedEvent(999L, ts("2024-01-01 12:30:00"), 9991L, "upsert", 0.0))
    query.processAllAvailable()
    assert(stateRows(query) == 51L,
      s"expected 51 latest-version rows after drain, got ${stateRows(query)}")
    // every buffered event was emitted once finalized
    assert(spark.table("state_audit_repair_q")
      .filter("user_id <= 50").count() == 200L)
    query.stop()
  }

  test("state-size audit: abandonment state drains to zero once every touch is decided") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val outcomes = StreamOps.abandonmentStream(input.toDS(),
      touchTypes = Seq("click"), conversionType = "purchase",
      windowSeconds = 600L, watermarkDelay = "0 seconds")
    val query = StreamOps.startMemorySink(outcomes.toDF(),
      "state_audit_abandon_q", OutputMode.Append())

    // 30 keys, one undecided touch each
    input.addData((1L to 30L).map(k =>
      KeyedEvent(k, ts("2024-01-01 10:00:00"), k, "click", 0.0)): _*)
    query.processAllAvailable()
    assert(stateRows(query) == 30L)

    // watermark passes every deadline (10:10): all touches decide as
    // abandoned and their state rows are REMOVED, not retained
    input.addData(KeyedEvent(500L, ts("2024-01-01 11:00:00"), 900L, "signup", 0.0))
    query.processAllAvailable()
    input.addData(KeyedEvent(500L, ts("2024-01-01 11:30:00"), 901L, "signup", 0.0))
    query.processAllAvailable()
    assert(stateRows(query) == 0L,
      s"decided keys must drop their state rows, got ${stateRows(query)}")
    assert(spark.table("state_audit_abandon_q").count() == 30L)
    query.stop()
  }

  test("firstSeenGate admits each fingerprint exactly once across triggers, " +
      "matching the batch gate, with O(distinct fingerprints) state") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.FingerprintedDoc
    def doc(id: Long, fp: Long) =
      FingerprintedDoc(id, fp, ts("2024-01-01 10:00:00"))
    val input = MemoryStream[FingerprintedDoc]
    val query = StreamOps.startMemorySink(
      StreamOps.firstSeenGate(input.toDS()).toDF(),
      "first_seen_q", OutputMode.Append())

    // trigger 1: fpA duplicated within the trigger (smallest doc_id wins,
    // the batch gate's order), fpB unique
    val t1 = Seq(doc(7L, 100L), doc(2L, 100L), doc(3L, 200L))
    input.addData(t1: _*)
    query.processAllAvailable()
    assert(spark.table("first_seen_q").select("doc_id")
      .as[Long].collect().toSet == Set(2L, 3L))
    // trigger 2: fpA again (suppressed by history), fpC new
    val t2 = Seq(doc(4L, 100L), doc(5L, 300L))
    input.addData(t2: _*)
    query.processAllAvailable()
    val admitted = spark.table("first_seen_q").select("doc_id")
      .as[Long].collect().toSet
    assert(admitted == Set(2L, 3L, 5L))
    // one state row per distinct fingerprint ever seen — the batch
    // history-table cardinality, not O(documents)
    assert(stateRows(query) == 3L)
    query.stop()
    // batch parity: the landed-table gate over (history = trigger 1,
    // batch = trigger 2) admits exactly what the stream did in trigger 2
    val batchAdmitted = graft.ops.Dedup.dropAlreadySeen(
        t2.toDF(), t1.toDF(),
        org.apache.spark.sql.functions.col("fingerprint"),
        org.apache.spark.sql.functions.col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(batchAdmitted == admitted -- Set(2L, 3L))
  }

  test("startNearDupGateSink: fuzzy ingest dedup accumulates an admitted " +
      "history across triggers, matching the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-ndgate")
    val hist = base.resolve("history").toString
    val cp = base.resolve("cp").toString
    // word-SET shingles (shingleN = 1): a permutation of the same words is
    // an exact set match (J = 1.0), distinct vocabularies share nothing
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tAperm = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    val tB = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val tC = "phi chi psi omega digamma koppa sampi stigma sho heta"
    val input = MemoryStream[(Long, String)]
    val query = StreamOps.startNearDupGateSink(
      input.toDS().toDF("doc_id", "text"), hist, cp,
      "doc_id", "text", threshold = 0.95)
    try {
      // trigger 1: 1 and 2 are near-dups of each other (min id survives
      // the within-trigger cluster), 3 is unique
      input.addData((1L, tA), (2L, tAperm), (3L, tB))
      query.processAllAvailable()
      def admitted(): Set[Long] = spark.read.parquet(hist)
        .select("doc_id").as[Long].collect().toSet
      assert(admitted() == Set(1L, 3L))
      // trigger 2: 4 near-dups the ADMITTED history (drop), 5 is novel
      input.addData((4L, tA), (5L, tC))
      query.processAllAvailable()
      assert(admitted() == Set(1L, 3L, 5L))
      // batch parity: d12's gate over (batch = trigger 2, history =
      // trigger 1's admissions) admits exactly what the stream did
      val batchAdmitted = graft.dedup.MinHashLSH.dropNearSeen(
          Seq((4L, tA), (5L, tC)).toDF("doc_id", "text"),
          Seq((1L, tA), (3L, tB)).toDF("doc_id", "text"),
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"), threshold = 0.95)
        .select("doc_id").as[Long].collect().toSet
      assert(batchAdmitted == Set(5L))
    } finally {
      query.stop()
      import scala.jdk.CollectionConverters._
      // Using: Files.walk holds a directory-stream handle until closed
      scala.util.Using.resource(java.nio.file.Files.walk(base)) { st =>
        st.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("nearDupGateBatch: replaying a batch under the same id reproduces " +
      "history exactly — no self-gating erasure") {
    val base = java.nio.file.Files.createTempDirectory("graft-ndreplay")
    val hist = base.resolve("history").toString
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tAperm = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    val tB = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val tC = "phi chi psi omega digamma koppa sampi stigma sho heta"
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      StreamOps.nearDupGateBatch(rows.toDF("doc_id", "text"), hist, id,
        "doc_id", "text", threshold = 0.95)
    def state(): Seq[(Long, Long)] = spark.read.parquet(hist)
      .select("doc_id", "__batch").as[(Long, Long)].collect().toSeq.sorted
    try {
      val b0 = Seq((1L, tA), (2L, tAperm), (3L, tB))
      run(b0, 0L)
      val after0 = state()
      assert(after0.map(_._1) == Seq(1L, 3L))
      // checkpoint-recovery replay: same rows, same batch id. Without the
      // own-partition exclusion, doc 1 would self-match its admitted copy
      // (J = 1.0), drop, and the rewrite would erase it from history.
      run(b0, 0L)
      assert(state() == after0)
      // a later batch gates against the healed history as usual...
      val b1 = Seq((4L, tA), (5L, tC))
      run(b1, 1L)
      assert(state().map(_._1) == Seq(1L, 3L, 5L))
      // ...and replays idempotently too (its own partition excluded, the
      // prior batches' partitions untouched)
      run(b1, 1L)
      assert(state().map(_._1) == Seq(1L, 3L, 5L))
    } finally {
      import scala.jdk.CollectionConverters._
      // Using: Files.walk holds a directory-stream handle until closed
      scala.util.Using.resource(java.nio.file.Files.walk(base)) { st =>
        st.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("nearDupGateBatch compaction: history partition count stays bounded, " +
      "admissions and replay are unchanged") {
    // Two identical 12-trigger ingest streams, one with compaction
    // (compactEvery = 4) and one effectively without (compactEvery high):
    // the admitted sets must be identical trigger by trigger, and the
    // compacted table's `__batch=*` directory count — which IS the
    // per-trigger history read's listing/open bound — must never exceed
    // compactEvery, while the uncompacted one grows with the trigger count.
    val base = java.nio.file.Files.createTempDirectory("graft-ndcompact")
    val histC = base.resolve("hist_c").toString
    val histU = base.resolve("hist_u").toString
    // trigger i carries: one doc near-dupping trigger i-1's novel text
    // (permuted word set — must be DROPPED against history), one novel doc
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
      "omicron", "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi")
    def novelText(i: Int): String =
      (0 until 10).map(j => vocab((i * 7 + j * 3) % vocab.size) + s"$i").mkString(" ")
    def permuted(i: Int): String = novelText(i).split(" ").reverse.mkString(" ")
    def batchRows(i: Int): Seq[(Long, String)] =
      if (i == 0) Seq((0L, novelText(0)))
      else Seq((i * 10L, permuted(i - 1)), (i * 10L + 1L, novelText(i)))
    def partDirs(hist: String): Seq[String] = {
      val root = new org.apache.hadoop.fs.Path(hist)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(root, "__batch=*")))
        .getOrElse(Array.empty).map(_.getPath.getName).toSeq
    }
    def admitted(hist: String): Set[Long] = spark.read.parquet(hist)
      .select("doc_id").as[Long].collect().toSet
    try {
      (0 until 12).foreach { i =>
        StreamOps.nearDupGateBatch(batchRows(i).toDF("doc_id", "text"),
          histC, i.toLong, "doc_id", "text", threshold = 0.95,
          compactEvery = 2)
        StreamOps.nearDupGateBatch(batchRows(i).toDF("doc_id", "text"),
          histU, i.toLong, "doc_id", "text", threshold = 0.95,
          compactEvery = 1000)
        // identical verdicts under compaction, every trigger
        assert(admitted(histC) == admitted(histU))
        // the tiered layout's partition count is bounded by
        // 2*compactEvery + 2 (batches + level-1 generations + the one
        // level-2 mega-generation + the current batch) — never grows
        // with the trigger count
        assert(partDirs(histC).size <= 2 * 2 + 2,
          s"trigger $i: ${partDirs(histC)}")
      }
      // both tiers actually exercised: an odd level-1 generation existed
      // and a level-2 (even-negative) mega-generation has formed
      assert(partDirs(histC).exists { d =>
        val v = d.stripPrefix("__batch=").toLong
        v < 0 && v % 2 == 0
      }, s"expected a level-2 generation in ${partDirs(histC)}")
      // only the novel doc of each trigger was admitted
      val expect = (0 until 12).map(i => if (i == 0) 0L else i * 10L + 1L).toSet
      assert(admitted(histC) == expect)
      // the uncompacted control accreted one partition per admitting
      // trigger — the unbounded growth the fold exists to stop
      assert(partDirs(histU).size == 12)
      // replay after compaction: the last batch reruns under its own id
      // against a history whose older partitions are folded — same state
      val before = admitted(histC)
      StreamOps.nearDupGateBatch(batchRows(11).toDF("doc_id", "text"),
        histC, 11L, "doc_id", "text", threshold = 0.95, compactEvery = 2)
      assert(admitted(histC) == before)
      // crash-window heal: simulate a kill mid-fold (a partition renamed
      // to trash, not yet restored) — the next trigger must restore it
      // BEFORE gating, or the trashed admissions would be re-admitted
      val root = new org.apache.hadoop.fs.Path(histC)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val victim = partDirs(histC).head
      val trash = new org.apache.hadoop.fs.Path(root, "_trash_test")
      fs.mkdirs(trash)
      assert(fs.rename(new org.apache.hadoop.fs.Path(root, victim),
        new org.apache.hadoop.fs.Path(trash, victim)))
      StreamOps.nearDupGateBatch(Seq((999L, novelText(99)))
        .toDF("doc_id", "text"), histC, 12L, "doc_id", "text",
        threshold = 0.95, compactEvery = 2)
      assert(admitted(histC) == before + 999L)
      assert(!fs.exists(trash))
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(base)) { st =>
        st.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }
}
