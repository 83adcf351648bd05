package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed CDC-style event — the streaming analog of the reference's
  * listings stream rows (entity key + change timestamp + payload).
  */
final case class KeyedEvent(
    user_id: Long,
    ts: java.sql.Timestamp,
    event_id: Long,
    event_type: String,
    value: Double)

/** O(1) per-key streaming EWMA state ([[StreamOps.ewmaPerKey]]). */
final case class EwmaState(
    user_id: Long,
    n_obs: Long,
    last_us: Long,
    ewma_milli: Long)

/** Two-long per-key streaming Holt state ([[StreamOps.holtPerKey]]). */
final case class HoltState(
    user_id: Long,
    n_obs: Long,
    last_us: Long,
    level_milli: Long,
    trend_milli: Long)

/** Fixed-width (9 longs + bookkeeping) per-key streaming Holt–Winters
  * state ([[StreamOps.holtWintersPerKey]]) — the seasonal slots are
  * explicit fields, the same shape as the batch fold's struct, and
  * `level_milli` doubles as the warm-up sum during the first period
  * exactly as in the batch fold, so the state never grows with the
  * timeline.
  */
final case class HwState(
    user_id: Long,
    n_obs: Long,
    last_us: Long,
    level_milli: Long,
    trend_milli: Long,
    s1: Long, s2: Long, s3: Long, s4: Long, s5: Long, s6: Long, s7: Long)

/** A fingerprinted document row — the streaming ingest-gate analog of the
  * batch d8 frame: doc id + 8-byte content fingerprint (computed upstream
  * with the same [[graft.text.TextAnalysis.fingerprint]] column) + arrival
  * event time.
  */
final case class FingerprintedDoc(
    doc_id: Long,
    fingerprint: Long,
    ts: java.sql.Timestamp)

/** Structured Streaming facade (SURVEY §2.10).
  *
  * The reference consumes its Kafka/Kinesis streams as already-landed batch
  * snapshots; these are the true streaming equivalents of its batch idioms,
  * so the same pipeline semantics can run on a live `readStream` source:
  *
  *  - late/out-of-order data: watermarks instead of the reference's 10-day
  *    look-back window re-read;
  *  - per-day counters (A2/A3): watermarked tumbling-window aggregation
  *    instead of daily batch groupBy;
  *  - latest-version-per-key dedup (W2): `mapGroupsWithState` keeping one
  *    state row per entity instead of a `row_number` window over history;
  *  - duplicate suppression: `dropDuplicatesWithinWatermark` instead of the
  *    batch top-1-per-key window.
  *
  * Scale notes: all stateful ops key on the entity id, so state is
  * hash-distributed across executors; watermarks bound state size (state per
  * key is O(1) here — a single latest row or a window's partial counts).
  */
object StreamOps {

  /** A2/A3 streaming analog: per-(tumbling window, key) event counts and
    * null-safe value sums, emitting finalized windows via the watermark.
    */
  def windowedCounters(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration).as("win"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(coalesce(col(valueCol), lit(0.0))).as("value_sum"))
      .select(col("win.start").as("window_start"), col("win.end").as("window_end"),
        col(keyCol), col("n_events"), col("value_sum"))

  /** Per-key funnel progress carried across triggers. `at_us` is the exact
    * µs of the last completed step (`Long.MinValue` before step 1).
    */
  final case class FunnelProgress(user_id: Long, stage: Int, at_us: Long)

  /** Streaming ordered-funnel tracker — [[graft.ops.Funnel]] semantics
    * under `mapGroupsWithState`: per key, O(1) state (completed stage +
    * its exact µs), each trigger folding its batch's step events in
    * (ts, step) order into the carried state. Emits the key's current
    * progress every trigger it appears in (Update mode). Equals the batch
    * fold whenever keys see trigger-monotone event time (a later trigger
    * carries no event older than one already folded for that key) —
    * the same contract as [[latestPerKey]]; for genuinely disordered
    * streams, buffer first (the [[repairCdcStreamEventTime]] pattern).
    * Against an unbounded key domain, wrap with a TTL exactly as
    * [[latestPerKeyWithTtl]] does.
    */
  def funnelStages(ds: Dataset[KeyedEvent],
                   steps: Seq[String]): Dataset[FunnelProgress] = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    implicit val progEnc = Encoders.product[FunnelProgress]
    implicit val longEnc = Encoders.scalaLong
    val idx = steps.zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: Long, events: Iterator[KeyedEvent],
         state: GroupState[FunnelProgress]) =>
          var stage = state.getOption.map(_.stage).getOrElse(0)
          var at = state.getOption.map(_.at_us).getOrElse(Long.MinValue)
          val evs = events.flatMap { e =>
            idx.get(e.event_type).map { i =>
              (e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000, i)
            }
          }.toArray.sorted
          evs.foreach { case (us, i) =>
            if (i == stage + 1 && us > at) { stage = i; at = us }
          }
          val out = FunnelProgress(k, stage, at)
          state.update(out)
          out
      }
  }

  /** Streaming gap-based sessionization via Spark's NATIVE `session_window`:
    * per (key, session) event counts, emitted once the watermark passes the
    * session's close (gap with no events). The batch analog over landed
    * history is [[graft.ops.Sessionize.sessions]] — same gap semantics,
    * window-sum formulation, because a watermark has no meaning there.
    */
  def sessionCounters(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String,
      watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("session_start"),
        col("win.end").as("session_end"), col(keyCol), col("n_events"))

  /** Streaming exact-dedup: suppress repeated ids arriving within the
    * watermark horizon (at-least-once source → effectively-once sink).
    */
  def dedupWithinWatermark(
      df: DataFrame,
      idCols: Seq[String],
      tsCol: String,
      watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** W2 streaming analog: maintain the latest event per key as managed
    * state; each trigger emits the keys whose latest row changed. Order is
    * (ts, event_id) — the same deterministic total order the batch dedup
    * uses.
    */
  def latestPerKey(ds: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    implicit val eventEnc = Encoders.product[KeyedEvent]
    implicit val longEnc = Encoders.scalaLong
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: Long, events: Iterator[KeyedEvent], state: GroupState[KeyedEvent]) =>
          val candidates = events ++ state.getOption.iterator
          val latest = candidates.maxBy(e => (e.ts.getTime, e.event_id))
          state.update(latest)
          latest
      }
  }

  /** [[latestPerKey]] with idle-key state GC: a key whose last event is
    * older than `idleTtl` of PROCESSING time has its state dropped on the
    * next trigger (a later event for the key simply re-seeds it — the
    * "latest" answer can regress across a drop, which is the standard
    * trade-off of TTL'd dedup state). Without a TTL, one state row per
    * ever-seen key lives forever — unbounded on an open key domain like
    * cookie/session ids; with it, state is bounded by keys active inside
    * the TTL window.
    *
    * Processing-time (not event-time) timeout on purpose: the state must
    * drain even when the source goes quiet, and an event-time watermark
    * cannot advance without new data.
    */
  def latestPerKeyWithTtl(ds: Dataset[KeyedEvent], idleTtl: String): Dataset[KeyedEvent] = {
    implicit val eventEnc = Encoders.product[KeyedEvent]
    implicit val longEnc = Encoders.scalaLong
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: Long, events: Iterator[KeyedEvent], state: GroupState[KeyedEvent]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val latest = (events ++ state.getOption.iterator)
              .maxBy(e => (e.ts.getTime, e.event_id))
            state.update(latest)
            state.setTimeoutDuration(idleTtl)
            Iterator.single(latest)
          }
      }
  }

  /** d8 streaming analog — the incremental exact-dedup INGEST GATE
    * ([[graft.ops.Dedup.dropAlreadySeen]]) as managed state: a document is
    * admitted iff its fingerprint was never seen before, with one state
    * row (the admitted doc id) per distinct fingerprint standing in for
    * the batch gate's history table. Within a trigger the same
    * deterministic order as the batch gate decides the survivor (smallest
    * `doc_id` wins).
    *
    * Scale shape: state is keyed on the 8-byte fingerprint, so it
    * hash-distributes like the batch anti join's shuffle and holds
    * O(distinct fingerprints) rows of two longs — the cardinality the
    * batch history table carries, never O(documents × triggers). For an
    * open-ended stream that bound still grows monotonically (so does the
    * batch history table); `idleTtl` caps it by processing-time idleness
    * at the standard TTL'd-dedup trade — a fingerprint idle past the TTL
    * is forgotten and its next copy re-admitted.
    */
  def firstSeenGate(ds: Dataset[FingerprintedDoc],
                    idleTtl: Option[String] = None): Dataset[FingerprintedDoc] = {
    implicit val docEnc = Encoders.product[FingerprintedDoc]
    implicit val longEnc = Encoders.scalaLong
    val timeout = if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: Long, docs: Iterator[FingerprintedDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            // already admitted: refresh the idle clock, emit nothing
            idleTtl.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else {
            val first = docs.minBy(_.doc_id)
            state.update(first.doc_id)
            idleTtl.foreach(state.setTimeoutDuration)
            Iterator.single(first)
          }
      }
  }

  /** Streaming integer EWMA — the live analog of
    * [[graft.ops.Ewma.smooth]], and the proof of its design claim: the
    * recurrence `s ← (α·v + (10⁶−α)·s) DIV 10⁶` needs NO look-back
    * beyond the previous smoothed value, so per-key state is O(1) (one
    * struct, four longs). Each trigger folds its events in `(ts,
    * event_id)` order on top of the carried state; because Scala's `Long`
    * division, Spark's `DIV`, and DuckDB's `//` all truncate toward
    * zero, the streaming fold lands on EXACTLY the batch operator's
    * integer fixpoint — asserted trigger-by-trigger in StreamingSpec.
    *
    * Cross-trigger disorder: like [[repairCdcStream]], state only moves
    * forward — an event arriving a trigger late folds in arrival
    * position, and the batch operator over the landed table remains the
    * reconciliation path.
    */
  def ewmaPerKey(ds: Dataset[KeyedEvent], alphaPpm: Long): Dataset[EwmaState] = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000,
      s"alphaPpm $alphaPpm out of (0, 1e6]")
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val longEnc = Encoders.scalaLong
    val beta = 1000000L - alphaPpm
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: Long, events: Iterator[KeyedEvent], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(k, 0L, 0L, 0L))
          events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val vm = Math.round(e.value * 1000)
            val s = if (st.n_obs == 0L) vm
              else (alphaPpm * vm + beta * st.ewma_milli) / 1000000L
            st = EwmaState(k, st.n_obs + 1, e.ts.getTime * 1000L, s)
          }
          state.update(st)
          st
      }
  }

  /** Streaming Holt — [[graft.ops.Ewma.holt]]'s (level, trend) integer
    * recurrence carried incrementally: exactly two longs of per-key
    * state beyond the bookkeeping, the promise the batch operator's
    * scaladoc makes. Same monotone-event-time contract and Update-mode
    * emission as [[ewmaPerKey]]; Scala `/`, Spark `DIV` and DuckDB `//`
    * all truncate toward zero, so the streamed fixpoint equals the
    * batch fold bit-for-bit (StreamingSpec proves it).
    */
  def holtPerKey(ds: Dataset[KeyedEvent], alphaPpm: Long,
                 betaPpm: Long): Dataset[HoltState] = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000,
      s"alphaPpm $alphaPpm out of (0, 1e6]")
    require(betaPpm >= 1 && betaPpm <= 1000000,
      s"betaPpm $betaPpm out of (0, 1e6]")
    implicit val stateEnc = Encoders.product[HoltState]
    implicit val longEnc = Encoders.scalaLong
    val na = 1000000L - alphaPpm
    val nb = 1000000L - betaPpm
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: Long, events: Iterator[KeyedEvent], state: GroupState[HoltState]) =>
          var st = state.getOption.getOrElse(HoltState(k, 0L, 0L, 0L, 0L))
          events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val vm = Math.round(e.value * 1000)
            val (l, b) =
              if (st.n_obs == 0L) (vm, 0L)
              else {
                val ln = (alphaPpm * vm +
                  na * (st.level_milli + st.trend_milli)) / 1000000L
                val bn = (betaPpm * (ln - st.level_milli) +
                  nb * st.trend_milli) / 1000000L
                (ln, bn)
              }
            st = HoltState(k, st.n_obs + 1, e.ts.getTime * 1000L, l, b)
          }
          state.update(st)
          st
      }
  }

  /** Streaming Holt–Winters — [[graft.ops.Ewma.holtWinters]]'s
    * three-phase integer fold carried incrementally in the promised
    * fixed-width state (9 longs: level, trend, 7 seasonal slots;
    * `level_milli` accumulates the warm-up sum for the first period,
    * exactly the batch fold's phase A). Same monotone-event-time
    * contract as [[ewmaPerKey]]/[[holtPerKey]]; the streamed fixpoint
    * equals the batch fold bit-for-bit once a key has ≥ 8 observations
    * (StreamingSpec proves it) — before that the batch operator emits
    * nothing while the stream exposes the warm-up state, which is the
    * honest difference between a report and a live estimator.
    */
  def holtWintersPerKey(ds: Dataset[KeyedEvent], alphaPpm: Long,
                        betaPpm: Long, gammaPpm: Long): Dataset[HwState] = {
    for ((n, p) <- Seq("alpha" -> alphaPpm, "beta" -> betaPpm,
        "gamma" -> gammaPpm))
      require(p >= 1 && p <= 1000000, s"${n}Ppm $p out of (0, 1e6]")
    implicit val stateEnc = Encoders.product[HwState]
    implicit val longEnc = Encoders.scalaLong
    val (na, nb, ng) =
      (1000000L - alphaPpm, 1000000L - betaPpm, 1000000L - gammaPpm)
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: Long, events: Iterator[KeyedEvent], state: GroupState[HwState]) =>
          var st = state.getOption.getOrElse(
            HwState(k, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val vm = Math.round(e.value * 1000)
            val s = Array(0L, st.s1, st.s2, st.s3, st.s4, st.s5, st.s6, st.s7)
            var (l, b) = (st.level_milli, st.trend_milli)
            val i = st.n_obs
            if (i < 6) { l += vm; s((i + 1).toInt) = vm; b = 0L }
            else if (i == 6) {
              val lf = (l + vm) / 7
              for (j <- 1 to 6) s(j) -= lf
              s(7) = vm - lf; l = lf; b = 0L
            } else {
              val j = (i % 7).toInt + 1
              val sj = s(j)
              val ln = (alphaPpm * (vm - sj) + na * (l + b)) / 1000000L
              val bn = (betaPpm * (ln - l) + nb * b) / 1000000L
              s(j) = (gammaPpm * (vm - ln) + ng * sj) / 1000000L
              l = ln; b = bn
            }
            st = HwState(k, i + 1, e.ts.getTime * 1000L, l, b,
              s(1), s(2), s(3), s(4), s(5), s(6), s(7))
          }
          state.update(st)
          st
      }
  }

  /** Streaming CDC repair — the live-stream analog of
    * [[graft.ops.AsOfJoin.resurrectDeletes]] (reference
    * `0-merge_delete_query.sql`): each key's latest version is managed
    * state; a tombstone (`event_type == deleteType`) emits a resurrected
    * row borrowing that state's payload, versions pass through and advance
    * the state. Tombstones with no prior version drop, like the batch inner
    * join.
    *
    * Ordering: events are sorted by (ts, event_id) WITHIN each trigger
    * batch; across triggers the state only moves forward, so a version
    * arriving in a later trigger than an earlier-keyed tombstone cannot
    * retroactively resurrect it — the batch operator re-run over the landed
    * table (the reference's daily job) remains the reconciliation path.
    * State per key is O(1).
    */
  def repairCdcStream(ds: Dataset[KeyedEvent],
                      deleteType: String = "error"): Dataset[KeyedEvent] = {
    implicit val eventEnc = Encoders.product[KeyedEvent]
    implicit val longEnc = Encoders.scalaLong
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, events: Iterator[KeyedEvent], state: GroupState[KeyedEvent]) =>
          var latest = state.getOption
          val out = Seq.newBuilder[KeyedEvent]
          events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (e.event_type == deleteType) {
              latest.foreach(v =>
                out += KeyedEvent(e.user_id, e.ts, v.event_id, deleteType, v.value))
            } else {
              if (latest.forall(l => Ordering[(Long, Long)].lt(
                  (l.ts.getTime, l.event_id), (e.ts.getTime, e.event_id))))
                latest = Some(e)
              out += e
            }
          }
          latest.foreach(state.update)
          out.result().iterator
      }
  }

  /** Buffered event state for the event-time CDC repair: unprocessed events
    * plus the latest finalized version.
    */
  final case class RepairBuffer(buffer: Seq[KeyedEvent], latest: Option[KeyedEvent])

  /** Event-time-buffered CDC repair: batch-equivalent semantics under
    * CROSS-TRIGGER disorder, bounded by the watermark.
    *
    * [[repairCdcStream]] processes each trigger's events immediately, so a
    * version that arrives one trigger LATER than a tombstone it should have
    * resurrected is missed. This variant holds every event in keyed state
    * until the watermark passes its timestamp, then replays the finalized
    * prefix in (ts, event_id) order through the same logic as the batch
    * operator — including the duplicate-(key, ts)-tombstone collapse.
    * Emission is append-mode correct: a row is emitted exactly once, when
    * finalized.
    *
    * State per key is O(events inside the watermark horizon) — the same
    * bound every watermarked stateful op has; the timeout timestamp is the
    * earliest buffered event, so state drains as the watermark advances.
    */
  def repairCdcStreamEventTime(
      ds: Dataset[KeyedEvent],
      watermarkDelay: String,
      deleteType: String = "error"): Dataset[KeyedEvent] = {
    implicit val eventEnc = Encoders.product[KeyedEvent]
    implicit val stateEnc = Encoders.product[RepairBuffer]
    implicit val longEnc = Encoders.scalaLong

    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, events: Iterator[KeyedEvent], state: GroupState[RepairBuffer]) =>
          val prior = state.getOption.getOrElse(RepairBuffer(Nil, None))
          // versions sort BEFORE tombstones at equal ts: the batch as-of is
          // inclusive (v.ts <= d.ts), so a version at the tombstone's exact
          // timestamp must be visible to it (AsOfJoin's __side ordering)
          val all = (prior.buffer ++ events).sortBy(e =>
            (e.ts.getTime, if (e.event_type == deleteType) 1 else 0, e.event_id))
          val wm = state.getCurrentWatermarkMs()

          // finalized prefix: watermark guarantees nothing earlier can arrive
          val (ready, pending) = all.partition(_.ts.getTime <= wm)

          var latest = prior.latest
          val out = Seq.newBuilder[KeyedEvent]
          var lastTombTs = Long.MinValue
          ready.foreach { e =>
            if (e.event_type == deleteType) {
              // duplicate (key, ts) tombstones collapse — batch tie rule
              if (e.ts.getTime != lastTombTs) {
                latest.foreach(v =>
                  out += KeyedEvent(e.user_id, e.ts, v.event_id, deleteType, v.value))
                lastTombTs = e.ts.getTime
              }
            } else {
              latest = Some(e)
              out += e
            }
          }

          if (pending.isEmpty && latest.isEmpty) state.remove()
          else {
            state.update(RepairBuffer(pending, latest))
            // wake when the watermark can finalize the next buffered event
            pending.headOption.foreach(e => state.setTimeoutTimestamp(e.ts.getTime))
          }
          out.result().iterator
      }
  }

  /** Keyed buffer for the streaming abandonment decision: undecided
    * touches and the conversions that might still resolve one.
    */
  final case class AbandonBuffer(touches: Seq[(Long, Long)],
                                 conversions: Seq[Long])

  /** Per-touch funnel outcome ([[abandonmentStream]]); times in µs. */
  final case class TouchOutcome(user_id: Long, touch_id: Long,
                                touch_us: Long, converted_us: Option[Long],
                                abandoned: Boolean)

  /** Streaming funnel abandonment — the live twin of
    * [[graft.ops.Attribution.unconvertedTouches]]: a touch emits as
    * CONVERTED the moment its window is provably decided, or as
    * ABANDONED when the event-time watermark passes `touch + window`
    * with no conversion seen. Append-mode correct: each touch emits
    * exactly once, when decidable.
    *
    * The decision is event-time exact under cross-trigger disorder: a
    * touch holds in state until `watermark ≥ touch_ts + window`, by
    * which point every conversion that could fall inside `(t, t+window]`
    * is final (the repairCdcStreamEventTime finalized-prefix argument).
    * The matching rule replays the batch frame — strictly after the
    * touch, inclusive at `+window`, earliest conversion wins. State per
    * key is O(events inside one window + watermark delay) and conversions
    * prune once `c + window < watermark` (any touch they could convert is
    * already decided). Timestamps decide at MILLISECOND resolution
    * (`getTime`, the streaming-facade convention); the batch operator is
    * the µs-exact reconciliation path.
    */
  def abandonmentStream(ds: Dataset[KeyedEvent], touchTypes: Seq[String],
                        conversionType: String, windowSeconds: Long,
                        watermarkDelay: String): Dataset[TouchOutcome] = {
    implicit val outEnc = Encoders.product[TouchOutcome]
    implicit val stateEnc = Encoders.product[AbandonBuffer]
    implicit val longEnc = Encoders.scalaLong
    val wMs = windowSeconds * 1000L
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (k: Long, events: Iterator[KeyedEvent],
         state: GroupState[AbandonBuffer]) =>
          val prior = state.getOption.getOrElse(AbandonBuffer(Nil, Nil))
          val incoming = events.toSeq
          val touches = (prior.touches ++ incoming
            .filter(e => touchTypes.contains(e.event_type))
            .map(e => (e.ts.getTime, e.event_id))).sorted
          val convs = (prior.conversions ++ incoming
            .filter(_.event_type == conversionType)
            .map(_.ts.getTime)).sorted
          val wm = state.getCurrentWatermarkMs()

          val (decided, pending) = touches.partition(_._1 + wMs <= wm)
          val out = decided.map { case (t, id) =>
            val hit = convs.find(c => c > t && c <= t + wMs)
            TouchOutcome(k, id, t * 1000L, hit.map(_ * 1000L),
              abandoned = hit.isEmpty)
          }
          val liveConvs = convs.filter(_ + wMs >= wm)
          if (pending.isEmpty && liveConvs.isEmpty) state.remove()
          else {
            state.update(AbandonBuffer(pending, liveConvs))
            pending.headOption.foreach { case (t, _) =>
              state.setTimeoutTimestamp(t + wMs)
            }
          }
          out.iterator
      }
  }

  /** Stream-stream interval join: each left event pairs with right events
    * of the same key whose timestamp lies in
    * `[left.ts - lookback, left.ts + lookahead]`. Both sides carry
    * watermarks, and the time-range predicate bounds HOW LONG each side's
    * rows must be buffered — without it a stream-stream join keeps
    * unbounded state, which is the failure mode this helper exists to make
    * unrepresentable (the interval is a required argument, not an optional
    * hint). Columns from the right side are suffixed `_r`.
    *
    * `joinType` accepts `inner` (default) or `left_outer` — the outer
    * variant emits unmatched left rows with null right columns once the
    * watermark proves no in-interval match can still arrive (Spark's
    * stream-stream outer join needs exactly the watermark + event-time
    * range bound this helper already mandates, so the outer mode is free
    * surface). Rows-without-a-partner materialize LATE by construction —
    * only at watermark passage, not at arrival.
    *
    * The batch analog needs no helper: it is a plain range-predicate join,
    * and the as-of join covers the latest-match-only variant.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      lookback: String,
      lookahead: String,
      watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer")(joinType),
      s"intervalJoin supports inner | left_outer, got $joinType")
    val l = left.withWatermark(tsCol, watermarkDelay)
    val r0 = right.withWatermark(tsCol, watermarkDelay)
    val r = r0.columns.foldLeft(r0)((df, c) => df.withColumnRenamed(c, s"${c}_r"))
    l.join(r,
      col(keyCol) === col(s"${keyCol}_r") &&
        col(s"${tsCol}_r") >= col(tsCol) - expr(s"INTERVAL $lookback") &&
        col(s"${tsCol}_r") <= col(tsCol) + expr(s"INTERVAL $lookahead"),
      joinType)
  }

  /** Wire a streaming DataFrame through to an in-memory or file sink for
    * tests/jobs: update-mode for stateful latest-per-key, append for
    * watermarked aggregations.
    */
  def startMemorySink(df: DataFrame, queryName: String, outputMode: OutputMode) =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()

  /** Streaming → K3: land each micro-batch with delete-insert partition
    * semantics ([[graft.io.Sinks.overwritePartitions]]) via `foreachBatch`.
    * Partitions present in a batch are replaced wholesale, untouched ones
    * survive — so a REPLAYED batch (post-failure re-processing, the
    * at-least-once reality of checkpoint recovery) overwrites its own
    * partitions instead of appending duplicates: idempotent landing
    * without a transactional table format.
    *
    * CONTRACT — one micro-batch per partition value: because the grain of
    * the delete-insert is the whole partition, a partition value that
    * spans several micro-batches would have each later batch REPLACE the
    * earlier batches' rows. Callers must therefore derive `partitionCol`
    * from a CLOSED event-time window under `OutputMode.Append` (the
    * default here): the watermark guarantees each window — hence each
    * partition value — is emitted exactly once, complete, in one batch.
    * Replays re-emit the same closed windows, which is exactly the
    * idempotent case above. `partitionCol` must also be stable across
    * replays (event-time-derived like `partition_month`, never processing
    * time). Update mode composes ONLY for stateless pass-through streams
    * whose batches happen to align with partitions; for aggregations it
    * is actively wrong (only changed rows reach `foreachBatch`, so a
    * rewrite drops the partition's unchanged keys) — which is why the
    * mode is a caller decision, not hardcoded.
    */
  def startPartitionOverwriteSink(df: DataFrame, path: String,
                                  partitionCol: String,
                                  checkpointDir: String,
                                  outputMode: OutputMode = OutputMode.Append) =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.io.Sinks.overwritePartitions(batch.toDF(), path, partitionCol)
      }
      .start()

  /** d12 streaming analog — the FUZZY near-dup ingest gate at streaming
    * cadence. Unlike [[firstSeenGate]] (exact, one fingerprint = one state
    * key), near-dup admission cannot be managed per-key state: a
    * document's verdict depends on ALL of its LSH band buckets plus an
    * exact verify against every colliding prior document — cross-key
    * coordination no single `flatMapGroupsWithState` key can see. The
    * Spark-first composition is therefore the `foreachBatch` loop every
    * production ingest dedup runs: each trigger drives the BATCH gate
    * ([[graft.dedup.MinHashLSH.dropNearSeen]], banded batch×history join
    * + exact verify) against an accumulating parquet history table of
    * previously ADMITTED documents, then dedups the survivors within the
    * trigger ([[graft.dedup.Clusters.dropNearDuplicates]] — history-gate
    * first, so a batch-mate of a dropped duplicate is judged on its own
    * novelty, the d8 gate's order) and lands them.
    *
    * Idempotent under replay: admitted rows write through the
    * `__batch`-partitioned delete-insert sink, so a checkpoint-recovery
    * re-run of batch N REPLACES batch N's partition instead of appending
    * duplicates (same contract as [[startPartitionOverwriteSink]]) — and
    * the history read EXCLUDES partition N itself, so the replay gates
    * against exactly the original run's inputs (a doc would otherwise
    * self-match its own prior admission and be erased by the rewrite).
    *
    * Scale shape per trigger: the band join is batch×history on band-key
    * buckets (never all-pairs), history's side prunes to band keys the
    * batch actually probes, and the history table is the batch operator's
    * input — at 100 TB it is stored bucketed by band key so its side of
    * the shuffle disappears (the d12/d25 posture, unchanged).
    *
    * History COMPACTION (round 11 — the unbounded-growth fix): left
    * alone, the `__batch` layout accretes one partition directory (with
    * `coalesce`-free small files) per trigger FOREVER, and every
    * trigger's history read lists and opens all of them — at streaming
    * cadence the file count, the listing cost, and the per-trigger scan
    * grow without bound. The fix is a TIERED fold (two LSM-style
    * levels) through [[graft.io.Sinks.replaceWhere]]: when `compactEvery`
    * batch partitions have accumulated they fold into one odd-negative
    * generation partition (`__batch = −(2·batchId+1)` — reading ONLY
    * those small partitions, so per-trigger amortized rewrite is
    * O(recent batches), never O(history)); when `compactEvery` odd
    * generations have accumulated, they and the standing even
    * mega-generation merge into a fresh even generation
    * (`−(2·batchId+2)` — the only full-history rewrite, once every
    * ~compactEvery² triggers). Batch ids strictly increase, so generation
    * keys never collide. Each fold rides the staged-commit protocol and
    * its intent manifest, so a KILL anywhere inside a fold is healed
    * (rolled FORWARD — never doubled, never torn) by
    * [[graft.io.Sinks.recoverStagedCommit]] at the next trigger's entry;
    * a dead run's leftover writer lock is taken over via the lock's
    * same-host dead-pid liveness check (instant on a single box) or the
    * fold's 10-min staleness bound (cross-host restart), while a LIVE
    * concurrent writer — two streams misconfigured onto one historyPath —
    * still fails fast. The per-trigger history
    * read is bounded by `2·compactEvery + 2` partition directories
    * regardless of how many triggers have run.
    *
    * The replay contract survives compaction: only partitions with
    * `__batch ≠ current batchId` are folded, so the current batch still
    * owns (and on replay overwrites) its own partition; a replayed batch
    * N whose ORIGINAL attempt ran the fold simply sees the folded history
    * — the same admitted-document SET it gated against originally, so the
    * deterministic pipeline reproduces the same admissions. Batches older
    * than the running one are checkpoint-committed and can never replay,
    * so folding them is safe by construction.
    */
  def startNearDupGateSink(df: DataFrame, historyPath: String,
                           checkpointDir: String, idCol: String,
                           textCol: String, threshold: Double,
                           compactEvery: Int = 16) =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        nearDupGateBatch(batch.toDF(), historyPath, batchId, idCol, textCol,
          threshold, compactEvery)
      }
      .start()

  /** One trigger of [[startNearDupGateSink]] — exposed so the replay
    * contract (same batch + same batchId twice ⇒ identical history) and
    * the compaction bound are directly testable without forcing a
    * checkpoint recovery.
    */
  private[graft] def nearDupGateBatch(b: DataFrame, historyPath: String,
      batchId: Long, idCol: String, textCol: String,
      threshold: Double, compactEvery: Int = 16): Unit = {
        require(compactEvery >= 2, "compactEvery must be >= 2")
        val spark = b.sparkSession
        val root = new org.apache.hadoop.fs.Path(historyPath)
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        // heal any KILLED prior compaction before anything reads the
        // table: a kill inside the fold's commit can leave a partition in
        // `_trash_*` and not yet live — reading past it would silently
        // drop those admissions from the gate and re-admit their
        // near-dups. No-op on a clean table.
        if (fs.exists(root)) graft.io.Sinks.recoverStagedCommit(fs, root)
        // "history exists" = at least one LANDED partition dir, not a bare
        // directory: an interrupted first write can leave _SUCCESS or
        // _temporary debris with no parquet files, and a bare-exists check
        // would then feed an unreadable path to spark.read on every later
        // trigger (permanent query death). globStatus may return NULL
        // (not an empty array) on some FileSystem implementations when
        // nothing matches — Option-wrapped so that can't NPE-kill the
        // query (round-10 advice).
        val parts: Array[org.apache.hadoop.fs.FileStatus] =
          if (fs.exists(root))
            Option(fs.globStatus(
              new org.apache.hadoop.fs.Path(root, "__batch=*")))
              .getOrElse(Array.empty)
          else Array.empty
        // TIERED fold (round-11 review: a single-generation fold re-read
        // and re-wrote the ENTIRE history every compactEvery triggers —
        // O(T²/c) cumulative write amplification). Key spaces: batches are
        // ≥ 0; level-1 generations are ODD negatives −(2·batchId+1);
        // level-2 are EVEN negatives −(2·batchId+2). Batch ids strictly
        // increase, so generation keys never collide, and a REPLAYED
        // trigger recomputes the same keys — idempotent. The current
        // batch's own partition (present only on replay) never folds — it
        // must stay individually overwritable.
        val priorKeys = parts.map(
            _.getPath.getName.stripPrefix("__batch=").toLong)
          .filter(_ != batchId).distinct.toSeq
        // staleLockMs: the gate is the table's only writer by construction
        // (triggers are checkpoint-serialized), so a lock found at trigger
        // entry normally belongs to a killed run — the lock's same-host
        // dead-pid liveness check steals those INSTANTLY (local mode and
        // single-box deployments; a killed run's pid is provably dead).
        // The 10-min bound only gates the cross-host case (driver restarted
        // on another machine). It is deliberately NOT 0 (r11 advice): two
        // streams misconfigured onto the same historyPath are both ALIVE,
        // and 0 made every lock instantly stealable — mutual exclusion
        // disabled exactly when it mattered. With a positive bound the
        // second stream fails fast and descriptively instead.
        def fold(srcVals: Seq[Long], genKey: Long): Unit = {
          val folded = spark.read.parquet(historyPath)
            .filter(col("__batch").isin(srcVals: _*))
            .withColumn("__batch", lit(genKey))
          graft.io.Sinks.replaceWhere(folded, historyPath, "__batch",
            (srcVals.filter(_ != genKey) :+ genKey).map(_.toString),
            staleLockMs = 10L * 60 * 1000)
        }
        val batchKeys = priorKeys.filter(_ >= 0)
        val gen1Keys = priorKeys.filter(v => v < 0 && v % 2 != 0)
        val gen2Keys = priorKeys.filter(v => v < 0 && v % 2 == 0)
        // level 1: fold the accumulated SMALL batch partitions into one
        // fresh odd generation — reads only those partitions, so the
        // per-trigger amortized rewrite is O(recent batches), not O(history)
        val gen1After =
          if (batchKeys.size >= compactEvery) {
            fold(batchKeys, -(2 * batchId + 1))
            gen1Keys :+ (-(2 * batchId + 1))
          } else gen1Keys
        // level 2: when odd generations accrete to the bound, merge them
        // (plus the standing even mega-generation, if any) into one fresh
        // even generation — the full-history rewrite now happens every
        // ~compactEvery² triggers instead of every compactEvery
        if (gen1After.size >= compactEvery)
          fold(gen1After ++ gen2Keys, -(2 * batchId + 2))
        val hasHistory = parts.nonEmpty
        // a REPLAYED batch must not gate against its own prior admissions:
        // doc X admitted by the first run of batch N would self-match
        // (J = 1.0) on replay, be dropped, and the partition overwrite
        // would then erase it from history. Excluding partition N from the
        // history read gives the replay the exact inputs of the original
        // run — the seeded MinHash pipeline is deterministic, so the
        // rewrite reproduces the original admissions bit-for-bit.
        val history = if (hasHistory)
          spark.read.parquet(historyPath)
            .filter(col("__batch") =!= lit(batchId))
            .select(b.columns.map(col): _*)
        else b.limit(0)
        // CacheScope: dropNearSeen/nearDuplicates cache their internal
        // prep frames (shingle sets + signatures) per CALL with
        // caller-owned lifecycle; the scope releases exactly those frames
        // at trigger end — NOT `spark.catalog.clearCache()`, which would
        // also evict every co-resident workload's caches on a shared
        // session (round-10 advice).
        graft.dedup.CacheScope.withScope {
          // persisted: `novel` feeds BOTH the pair stage and the cluster
          // anti-join — lazily that would run the banded batch×history
          // gate (the trigger's dominant join) twice
          val novel = graft.dedup.MinHashLSH.dropNearSeen(
            b, history, col(idCol), col(textCol), threshold).persist()
          try {
            val pairs = graft.dedup.MinHashLSH.nearDuplicates(
                novel, col(idCol), col(textCol), threshold)
              .select("id_a", "id_b")
            // persisted: consumed twice — the emptiness probe AND the
            // write; lazily the within-trigger pair join + components
            // loop would execute twice per trigger (round-10 advice)
            val admitted = graft.dedup.Clusters.dropNearDuplicates(
              novel, col(idCol), pairs).persist()
            try {
              // skip the write when nothing was admitted: a zero-row
              // dynamic overwrite touches no partitions but CREATES the
              // directory (with only _SUCCESS), poisoning the
              // history-exists check above
              if (admitted.take(1).nonEmpty)
                graft.io.Sinks.overwritePartitions(
                  admitted.withColumn("__batch", lit(batchId)),
                  historyPath, "__batch")
            } finally admitted.unpersist(blocking = false)
          } finally novel.unpersist(blocking = false)
        }
  }
}
