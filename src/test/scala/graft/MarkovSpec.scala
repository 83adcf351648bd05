package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Markov

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transitionMatrix: within-key transitions, ppm rows sum per cur") {
    val events = Seq(
      // user 1: a → b → a → c
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:00:01"), 2L, "b"),
      (1L, ts("2024-01-01 00:00:02"), 3L, "a"),
      (1L, ts("2024-01-01 00:00:03"), 4L, "c"),
      // user 2: a → b (the c→a CROSS-USER pair must not appear)
      (2L, ts("2024-01-01 00:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 00:00:01"), 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Markov.transitionMatrix(events, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .orderBy("cur_state", "next_state")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // a→b twice (u1, u2), a→c once; b is cur only once with a successor
    // (u1's b→a — u2's b is terminal, so it adds NO b-row mass);
    // c is terminal everywhere
    assert(out == Seq(
      ("a", "b", 2L, 3L, 666666L),
      ("a", "c", 1L, 3L, 333333L),
      ("b", "a", 1L, 1L, 1000000L)))
    assert(!out.exists(r => r._1 == "c"), "terminal state must emit no row")
  }

  test("transitionMatrix: same-µs ties order by event_id") {
    val t = ts("2024-01-01 00:00:00")
    val events = Seq((1L, t, 2L, "b"), (1L, t, 1L, "a"), (1L, t, 3L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Markov.transitionMatrix(events, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .select("cur_state", "next_state").as[(String, String)]
      .collect().toSet
    assert(out == Set(("a", "b"), ("b", "c")))
  }

  test("topPaths: trigrams stay within a key, ranked (n desc, path asc)") {
    def e(u: Long, sec: Int, id: Long, t: String) =
      (u, ts(f"2024-01-01 00:00:$sec%02d"), id, t)
    val events = Seq(
      // user 1: a b c d → trigrams abc, bcd
      e(1L, 0, 1L, "a"), e(1L, 1, 2L, "b"), e(1L, 2, 3L, "c"),
      e(1L, 3, 4L, "d"),
      // user 2: a b c → abc again (cross-user trigram d-a-b must NOT
      // exist)
      e(2L, 0, 5L, "a"), e(2L, 1, 6L, "b"), e(2L, 2, 7L, "c"),
      // user 3: too short for any trigram
      e(3L, 0, 8L, "a"), e(3L, 1, 9L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Markov.topPaths(events, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), k = 2)
      .as[(String, String, String, Long)].collect().toSeq
    assert(out == Seq(("a", "b", "c", 2L), ("b", "c", "d", 1L)))
    val plan = Markov.topPaths(events, col("user_id"), col("ts"),
      col("event_id"), col("event_type"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
  }
}
