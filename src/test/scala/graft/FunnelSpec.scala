package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val steps = Seq("signup", "view", "purchase")

  private def run(rows: Seq[(Long, Timestamp, String)]) =
    Funnel.conversion(rows.toDF("user_id", "ts", "event_type"),
        col("user_id"), col("ts"), col("event_type"), steps)
      .orderBy("step_idx")
      .select("step_idx", "step_name", "n_keys", "conv_permille")
      .as[(Int, String, Long, Long)].collect().toSeq

  test("conversion: order matters — a view before signup does not chain") {
    val out = run(Seq(
      // user 1 completes all three in order
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "view"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2's only view precedes its signup: stops at step 1
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:00"), "signup"),
      // user 3 never signs up: contributes nothing anywhere
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:00:00"), "purchase")))
    assert(out == Seq(
      (1, "signup", 2L, 1000L), (2, "view", 1L, 500L),
      (3, "purchase", 1L, 500L)))
  }

  test("conversion: strictly-after gate — same-microsecond steps do not chain") {
    val t = ts("2024-01-01 10:00:00")
    val out = run(Seq(
      (1L, t, "signup"), (1L, t, "view"), // same µs: view rejected
      (1L, ts("2024-01-01 10:00:01"), "view"),
      (2L, t, "signup"))) // a later view exists for 1 only
    assert(out.map(r => (r._1, r._3)) == Seq((1, 2L), (2, 1L), (3, 0L)))
  }

  test("conversion: earliest completion is greedy through repeated events") {
    // signup at 10:00; views at 09:00 (too early) and 11:00; purchase at
    // 10:30 — BEFORE the qualifying view, so the funnel stops at view
    val out = run(Seq(
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:30:00"), "purchase"),
      (1L, ts("2024-01-01 11:00:00"), "view")))
    assert(out.map(_._3) == Seq(1L, 1L, 0L))
  }

  test("conversion: empty input emits all-zero step rows, permille guard holds") {
    val out = run(Seq.empty)
    assert(out == Seq(
      (1, "signup", 0L, 0L), (2, "view", 0L, 0L), (3, "purchase", 0L, 0L)))
  }

  test("conversion matches the chained-min recurrence on random event streams") {
    // reference: t_k = min ts of a step-k event strictly after t_{k-1}
    def reference(evs: Seq[(Long, Long, String)]): Map[Int, Long] = {
      val byUser = evs.groupBy(_._1)
      val stages = byUser.values.map { es =>
        var (stage, at) = (0, Long.MinValue)
        var advanced = true
        while (advanced && stage < steps.length) {
          val next = es.filter(e => e._3 == steps(stage) && e._2 > at)
          if (next.isEmpty) advanced = false
          else { at = next.map(_._2).min; stage += 1 }
        }
        stage
      }.toSeq
      steps.indices.map(i => (i + 1) -> stages.count(_ >= i + 1).toLong).toMap
    }
    val rng = new scala.util.Random(13)
    val types = steps ++ Seq("noise")
    val evs = (0 until 600).map { i =>
      (rng.nextInt(25).toLong, rng.nextInt(40).toLong * 1000000L,
        types(rng.nextInt(types.length)))
    }
    val df = evs.map { case (u, us, t) =>
      (u, new Timestamp(us / 1000), t)
    }.toDF("user_id", "ts", "event_type")
    val got = Funnel.conversion(df, col("user_id"), col("ts"),
        col("event_type"), steps)
      .select("step_idx", "n_keys").as[(Int, Long)].collect().toMap
    assert(got == reference(evs), "fold diverged from the recurrence")
  }

  test("windowed: max-anchor DP converts where greedy-first-anchor would not") {
    import java.sql.Timestamp
    def ev(u: Long, sec: Long, id: Long, t: String) =
      (u, new Timestamp(sec * 1000L), id, t)
    val rows = Seq(
      // u1: clean chain — the whole funnel inside 15 s of the view
      ev(1L, 0, 1, "view"), ev(1L, 5, 2, "click"), ev(1L, 10, 3, "purchase"),
      // u2: the first view (t=0) expires; the SECOND view (t=100)
      // anchors a full conversion — greedy-first-anchor reports stage 1
      ev(2L, 0, 4, "view"), ev(2L, 100, 5, "view"),
      ev(2L, 105, 6, "click"), ev(2L, 110, 7, "purchase"),
      // u3: purchase misses the click-anchor window (20 − 5 > 15... the
      // window check is vs the VIEW anchor: 20 − 0 > 15) → stage 2
      ev(3L, 0, 8, "view"), ev(3L, 5, 9, "click"), ev(3L, 20, 10, "purchase"),
      // u4: never views → stage 0
      ev(4L, 0, 11, "click"), ev(4L, 1, 12, "purchase"),
      // u5: steps in reverse order → only the view counts
      ev(5L, 0, 13, "purchase"), ev(5L, 1, 14, "click"), ev(5L, 2, 15, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.windowed(rows, col("user_id"), col("ts"),
        col("event_id"), col("event_type"),
        steps = Seq("view", "click", "purchase"),
        windowUs = 15L * 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 2L, 2L -> 1L, 1L -> 1L, 0L -> 1L),
      s"got $out") // stage 3: u1+u2; stage 2: u3; stage 1: u5; stage 0: u4
  }
}
