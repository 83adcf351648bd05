package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion: how many keys performed step 1, then step 2
  * STRICTLY AFTER their step-1 time, then step 3 after that, … — the
  * sequenced-event analysis (signup → view → click → purchase) that a
  * per-step `count(distinct)` gets wrong, because it ignores ordering.
  *
  * Semantics: greedy earliest-completion matching. A key's step-k time is
  * the MINIMUM timestamp of a step-k event strictly after its step-(k−1)
  * time; greedy-earliest is optimal here (taking any later step-k event
  * can only shrink the set of events eligible for step k+1), so the
  * reached stage is the maximum over all matchings. Equal-timestamp
  * step-k/step-(k−1) events do NOT chain — "after" is strict, in integer
  * microseconds.
  *
  * Plan shape: ONE event-scale shuffle. Events are pre-filtered to funnel
  * step types (everything else never leaves the scan), grouped by key, and
  * each key's (ts_µs, step) list is sorted and folded ONCE with an
  * aggregate HOF whose state is two integers (current stage, last
  * completion µs) — the k-self-joins formulation re-shuffles the event log
  * k times; this fold reads it once, and per-key state is the collected
  * step-event list (funnel-typed events only). The per-stage rollup and
  * the permille denominator ride on frames of at most k rows.
  *
  * The fold sorts by (ts, step) so a same-µs tie between two DIFFERENT
  * steps processes the earlier step first; the later one is then rejected
  * by the strict-after gate — identical to the min-over-strictly-after
  * recurrence an oracle replays with chained joins.
  */
object Funnel {

  /** One row per funnel step: `step_idx` (1-based), `step_name`, `n_keys`
    * reaching it in order, and integer-permille conversion vs step 1.
    */
  def conversion(events: DataFrame, key: Column, ts: Column, step: Column,
                 steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    val keyName = events.select(key).columns.head
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (name, i)) =>
        when(step === name, lit(i + 1)).otherwise(acc)
      }
    val reached = events
      .select(key, unix_micros(ts).as("__us"), stepIdx.as("__step"))
      .filter(col("__step").isNotNull)
      .groupBy(col(keyName))
      .agg(sort_array(collect_list(struct(col("__us"), col("__step"))))
        .as("__evs"))
      .select(col(keyName),
        // fold state: (stage completed so far, µs of its completion);
        // an event advances the funnel iff it IS the next step and lands
        // strictly after the previous completion
        aggregate(col("__evs"),
          struct(lit(0).as("stage"), lit(Long.MinValue).as("at")),
          (st, ev) => when(
            ev.getField("__step") === st.getField("stage") + 1 &&
              ev.getField("__us") > st.getField("at"),
            struct((st.getField("stage") + 1).as("stage"),
              ev.getField("__us").as("at"))).otherwise(st),
          st => st.getField("stage")).as("__reached"))
    // ONE pass over the per-key stages: k conditional sums in a single
    // global aggregate (a per-step filter+count would re-run the event
    // fold k times), then unpivot the 1-row result to k output rows.
    val sums = steps.indices.map(i =>
      // coalesce: sum over an EMPTY key set is null, and an empty funnel
      // must still report k zero-count step rows
      coalesce(sum(when(col("__reached") >= i + 1, 1L).otherwise(0L)), lit(0L))
        .as(s"__c$i"))
    val counts = reached.agg(sums.head, sums.tail: _*)
    val stepRows = array(steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1).as("step_idx"), lit(name).as("step_name"),
        col(s"__c$i").as("n_keys"))
    }: _*)
    counts
      .select(explode(stepRows).as("__s"), col("__c0").as("__base"))
      .select(col("__s.step_idx").as("step_idx"),
        col("__s.step_name").as("step_name"),
        col("__s.n_keys").as("n_keys"),
        when(col("__base") > 0, expr("__s.n_keys * 1000 DIV __base"))
          .otherwise(lit(0L)).as("conv_permille"))
  }

  /** Time-WINDOWED funnel (the ClickHouse `windowFunnel` semantic):
    * a key reaches stage k iff steps 1..k occur in order with EVERY
    * consecutive hop inside `windowUs` of the previous stage's time —
    * the conversion question [[conversion]] can't ask, because an
    * unbounded funnel credits a purchase months after the view.
    *
    * The reached stage is the MAXIMUM over all chain anchorings, found
    * with an O(m)-state DP: per stage k, keep the LATEST stage-(k−1)
    * time of any valid chain reaching k (`a_k`). A later anchor can
    * only loosen every downstream window check, so max-anchor
    * dominates — greedy first-anchor would under-report whenever an
    * early view expires and a later one would have converted.
    *
    * Plan: identical to [[conversion]] — funnel-typed events only
    * leave the scan, one key shuffle, one sorted HOF fold (state = m
    * nullable longs), stage rollup over ≤ m+1 rows. Ordering inside
    * the fold is (µs, event_id) — total, engine-replayable.
    */
  def windowed(events: DataFrame, key: Column, ts: Column,
               eventId: Column, step: Column, steps: Seq[String],
               windowUs: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val keyName = events.select(key).columns.head
    val m = steps.size
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (name, i)) =>
        when(step === name, lit(i + 1)).otherwise(acc)
      }
    val init = s"named_struct(${(1 to m)
      .map(k => s"'a$k', CAST(NULL AS BIGINT)").mkString(", ")})"
    val upd = (1 to m).map { k =>
      if (k == 1)
        "'a1', CASE WHEN ev.__step = 1" +
          " THEN greatest(coalesce(s.a1, ev.__us), ev.__us) ELSE s.a1 END"
      else
        s"'a$k', CASE WHEN ev.__step = $k AND s.a${k - 1} IS NOT NULL" +
          s" AND ev.__us - s.a${k - 1} <= ${windowUs}L" +
          s" THEN greatest(coalesce(s.a$k, s.a${k - 1}), s.a${k - 1})" +
          s" ELSE s.a$k END"
    }.mkString(", ")
    val stageCase = "CASE " + (m to 1 by -1)
      .map(k => s"WHEN __st.a$k IS NOT NULL THEN $k").mkString(" ") +
      " ELSE 0 END"
    events
      .select(key, unix_micros(ts).as("__us"), eventId.as("__eid"),
        stepIdx.as("__step"))
      .filter(col("__step").isNotNull)
      .groupBy(col(keyName))
      .agg(sort_array(collect_list(struct(col("__us"), col("__eid"),
        col("__step")))).as("__evs"))
      .withColumn("__st",
        expr(s"aggregate(__evs, $init, (s, ev) -> named_struct($upd))"))
      .select(col(keyName), expr(stageCase).cast("long").as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }
}
