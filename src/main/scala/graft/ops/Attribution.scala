package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-touch attribution: for every conversion event, the timestamp of
  * the key's EARLIEST touch event inside a strict lookback window
  * `[conversion − lookback, conversion)` plus the touch count — the
  * marketing-attribution primitive (last-touch is the same frame with
  * `max`).
  *
  * Plan shape: ONE shuffle. Both window functions ride a single per-key
  * RANGE frame over exact integer µs — value-based framing, so the
  * lookback is true TIME distance (a ROWS frame would count events, the
  * classic attribution bug), and the `AND 1 PRECEDING` upper bound makes
  * "before" STRICT: same-µs peers are excluded by RANGE semantics in any
  * engine. Conditional aggregation inside the frame (min/count over the
  * touch-typed events only) avoids a touches×conversions self-join
  * entirely — the join formulation re-shuffles the event log and
  * explodes on hot keys; this is one pass over each key's timeline.
  */
object Attribution {

  /** One row per conversion: key, `conversion_id`, `conversion_us`,
    * `first_touch_us` (null when no touch inside the window),
    * `n_touches` in the window.
    */
  /** The mirror image of [[firstTouch]]: every touch event with NO
    * conversion by the same key within `(t, t + window]` — the
    * abandonment report (clicks that never became purchases), the
    * denominator of any conversion-rate funnel. One shuffle, one RANGE
    * frame looking FORWARD (`1 FOLLOWING AND window FOLLOWING` — strict
    * "after", same-µs conversions excluded symmetrically to firstTouch's
    * strict "before"); `converted_us` carries the evidence for the
    * non-abandoned rows, so one output serves both sides of the funnel.
    * The join formulation (touches × conversions) re-shuffles the event
    * log and explodes on hot keys; this is one pass per key timeline.
    */
  def unconvertedTouches(events: DataFrame, key: Column, ts: Column,
                         eventId: Column, isTouch: Column,
                         isConversion: Column,
                         windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 1, "windowSeconds must be >= 1")
    val keyName = events.select(key).columns.head
    val w = Window.partitionBy(col(keyName)).orderBy(col("__us"))
      .rangeBetween(1L, windowSeconds * 1000000L)
    events
      .select(key, unix_micros(ts).as("__us"), eventId.as("touch_id"),
        isTouch.as("__touch"), isConversion.as("__conv"))
      .select(col(keyName), col("__us"), col("touch_id"), col("__touch"),
        min(when(col("__conv"), col("__us"))).over(w).as("converted_us"))
      .filter(col("__touch"))
      .select(col(keyName), col("touch_id"), col("__us").as("touch_us"),
        col("converted_us"),
        col("converted_us").isNull.as("abandoned"))
  }

  /** U-shaped (position-based) multi-touch attribution: each conversion
    * splits its credit across every touch in the lookback window — 40%
    * to the first touch, 40% to the last, the middle 20% divided among
    * the rest. Credit is integer ppm and sums to EXACTLY 10⁶ per
    * conversion: the middle share is `200000 DIV (n−2)` with the
    * remainder going one ppm each to the EARLIEST middles (the Hamilton
    * idiom positionally — deterministic, no float split). Degenerate
    * sizes follow industry convention: n=1 → 10⁶, n=2 → 500000 each.
    *
    * Shape: the same ONE-shuffle strict-before RANGE frame as
    * [[firstTouch]] — but credit needs per-touch OUTPUT rows, so the
    * frame COLLECTS the touch list (bounded by the lookback window by
    * construction — an unbounded timeline never rides in one buffer) and
    * a posexplode fans it back out. RANGE frames allow one ordering
    * expression, so same-µs collection order is pinned by sorting the
    * collected (us, eid) structs, not the frame.
    */
  def positionCredit(events: DataFrame, key: Column, ts: Column,
                     eventId: Column, isTouch: Column, isConversion: Column,
                     lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds >= 1, "lookbackSeconds must be >= 1")
    val keyName = events.select(key).columns.head
    val w = Window.partitionBy(col(keyName)).orderBy(col("__us"))
      .rangeBetween(-lookbackSeconds * 1000000L, -1L)
    events
      .select(key, unix_micros(ts).as("__us"),
        eventId.as("conversion_id"), isTouch.as("__touch"),
        isConversion.as("__conv"))
      .select(col(keyName), col("__us"), col("conversion_id"), col("__conv"),
        collect_list(when(col("__touch"),
          struct(col("__us").as("us"), col("conversion_id").as("eid"))))
          .over(w).as("__raw"))
      .select(col(keyName), col("__us"), col("conversion_id"), col("__conv"),
        sort_array(col("__raw")).as("__ts"))
      .filter(col("__conv") && size(col("__ts")) > 0)
      .select(col(keyName), col("conversion_id"),
        size(col("__ts")).as("__n"),
        posexplode(col("__ts")).as(Seq("position", "__t")))
      .select(col(keyName), col("conversion_id"),
        col("__t.eid").as("touch_id"), col("position"),
        when(col("__n") === 1, lit(1000000L))
          .when(col("__n") === 2, lit(500000L))
          .when(col("position") === 0 || col("position") === col("__n") - 1,
            lit(400000L))
          .otherwise(
            call_function("div", lit(200000L), col("__n") - 2) +
              when(col("position") <= pmod(lit(200000L), col("__n") - 2),
                1L).otherwise(0L))
          .as("credit_ppm"))
  }

  /** Time-decay multi-touch attribution: each conversion splits its
    * 10⁶ ppm of credit across the lookback touches with weight halving
    * per elapsed half-life — the industry scheme between first-touch
    * (all credit to discovery) and last-touch (all to closing).
    *
    * EXACT INTEGER throughout: the decay weight is a POWER OF TWO,
    * `w = 2^(40 − min(40, age div halflife))` — halving per whole
    * half-life is the decay law itself, not an approximation of
    * `exp(−λt)`, and the shift form means no float ever exists. The cap
    * floors the weight at 1 (a touch 40+ half-lives out still holds a
    * sliver), so the normalizer is never 0. Credit is then Hamilton
    * apportionment of 10⁶ by weight (floor shares + one ppm to the
    * largest remainders, ties to the earliest touch) — Σcredit is
    * EXACTLY 10⁶ per conversion, engine-replayable.
    *
    * Shape: the [[positionCredit]] one-shuffle collect frame; weights,
    * floors, remainders and the remainder-rank all compute INSIDE the
    * array (index-aware HOFs, O(n²) rank over the bounded window — no
    * second exchange on (key, conversion)). Int64 headroom: the
    * normalizer `Σw ≤ n·2⁴⁰` and each `w·10⁶ ≤ 2⁴⁰·10⁶ ≈ 1.1×10¹⁸`
    * stay under 2⁶³ while a conversion has < ~8×10⁶ touches in-window.
    */
  def timeDecayCredit(events: DataFrame, key: Column, ts: Column,
                      eventId: Column, isTouch: Column,
                      isConversion: Column, lookbackSeconds: Long,
                      halflifeSeconds: Long): DataFrame = {
    require(lookbackSeconds >= 1, "lookbackSeconds must be >= 1")
    require(halflifeSeconds >= 1, "halflifeSeconds must be >= 1")
    val keyName = events.select(key).columns.head
    val w = Window.partitionBy(col(keyName)).orderBy(col("__us"))
      .rangeBetween(-lookbackSeconds * 1000000L, -1L)
    val hlUs = halflifeSeconds * 1000000L
    events
      .select(key, unix_micros(ts).as("__us"),
        eventId.as("conversion_id"), isTouch.as("__touch"),
        isConversion.as("__conv"))
      .select(col(keyName), col("__us"), col("conversion_id"), col("__conv"),
        collect_list(when(col("__touch"),
          struct(col("__us").as("us"), col("conversion_id").as("eid"))))
          .over(w).as("__raw"))
      .filter(col("__conv") && size(col("__raw")) > 0)
      .select(col(keyName), col("conversion_id"), col("__us"),
        sort_array(col("__raw")).as("__ts"))
      .withColumn("__ws", expr(
        s"transform(__ts, t -> shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(40 - least(40L, (__us - t.us) div $hlUs) AS INT)))"))
      .withColumn("__W", expr(
        "aggregate(__ws, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("__fl", expr("transform(__ws, w -> (w * 1000000) div __W)"))
      .withColumn("__rm", expr("transform(__ws, w -> (w * 1000000) % __W)"))
      .withColumn("__R", lit(1000000L) -
        expr("aggregate(__fl, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .select(col(keyName), col("conversion_id"), col("__ts"), col("__ws"),
        col("__R"),
        expr("transform(__fl, (f, i) -> f + IF(" +
          "1 + size(filter(sequence(0, size(__fl) - 1), j -> " +
          "element_at(__rm, j + 1) > element_at(__rm, i + 1) OR (" +
          "element_at(__rm, j + 1) = element_at(__rm, i + 1) AND j < i)" +
          ")) <= __R, CAST(1 AS BIGINT), CAST(0 AS BIGINT)))").as("__cr"))
      .select(col(keyName), col("conversion_id"),
        posexplode(col("__ts")).as(Seq("position", "__t")),
        col("__ws"), col("__cr"))
      .select(col(keyName), col("conversion_id"),
        col("__t.eid").as("touch_id"), col("position"),
        element_at(col("__ws"), col("position") + 1).as("weight"),
        element_at(col("__cr"), col("position") + 1).as("credit_ppm"))
  }

  def firstTouch(events: DataFrame, key: Column, ts: Column, eventId: Column,
                 isTouch: Column, isConversion: Column,
                 lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds >= 1, "lookbackSeconds must be >= 1")
    val keyName = events.select(key).columns.head
    val w = Window.partitionBy(col(keyName)).orderBy(col("__us"))
      .rangeBetween(-lookbackSeconds * 1000000L, -1L)
    events
      .select(key, unix_micros(ts).as("__us"),
        eventId.as("conversion_id"), isTouch.as("__touch"),
        isConversion.as("__conv"))
      // both aggregates in ONE projection → Catalyst plans ONE Window
      // node riding one sort (sequential withColumn would plan two)
      .select(col(keyName), col("__us"), col("conversion_id"),
        col("__conv"),
        min(when(col("__touch"), col("__us"))).over(w)
          .as("first_touch_us"),
        count(when(col("__touch"), lit(1))).over(w).as("n_touches"))
      .filter(col("__conv"))
      .select(col(keyName), col("conversion_id"),
        col("__us").as("conversion_us"), col("first_touch_us"),
        col("n_touches"))
  }
}
