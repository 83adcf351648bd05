package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Incremental

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, t: String, v: Long) =
    (u, Timestamp.valueOf(t), v)

  private val events = Seq(
    ev(1L, "2024-01-02 10:00:00", 100L),
    ev(1L, "2024-01-20 09:00:00", 50L),
    ev(2L, "2024-01-01 00:00:00", 7L),
    ev(3L, "2024-02-01 12:00:00", 9L)
  ).toDF("user_id", "ts", "vm")

  test("merge of split-batch states equals the full-history aggregate") {
    val split = lit("2024-01-15 00:00:00").cast("timestamp")
    val merged = Incremental.merge(Seq(
        Incremental.state(events.filter(col("ts") < split),
          col("user_id"), col("ts"), col("vm")),
        Incremental.state(events.filter(col("ts") >= split),
          col("user_id"), col("ts"), col("vm"))))
      .orderBy("key")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val full = Incremental.state(events, col("user_id"), col("ts"),
        col("vm"))
      .orderBy("key")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(merged == full)
    // user 1 spans both batches: count/sum add, first/last combine
    val u1 = merged.find(_._1 == 1L).get
    assert(u1._2 == 2L && u1._3 == 150L)
    assert(u1._4 == Timestamp.valueOf("2024-01-02 10:00:00").getTime * 1000)
    assert(u1._5 == Timestamp.valueOf("2024-01-20 09:00:00").getTime * 1000)
  }

  test("merge is order- and batching-invariant (monoid fold)") {
    val days = Seq("2024-01-10", "2024-01-20", "2024-02-05")
    def batch(from: String, until: String) = {
      var f = events
      if (from.nonEmpty) f = f.filter(col("ts") >= lit(from + " 00:00:00"))
      if (until.nonEmpty) f = f.filter(col("ts") < lit(until + " 00:00:00"))
      Incremental.state(f, col("user_id"), col("ts"), col("vm"))
    }
    val bounds = ("" +: days) :+ ""
    val batches = bounds.sliding(2).map { case Seq(a, b) => batch(a, b) }
      .toSeq
    val fwd = Incremental.merge(batches).orderBy("key").collect().toSeq
    val rev = Incremental.merge(batches.reverse).orderBy("key")
      .collect().toSeq
    val nested = Incremental.merge(Seq(Incremental.merge(batches.take(2)),
        Incremental.merge(batches.drop(2)))).orderBy("key").collect().toSeq
    assert(fwd == rev && fwd == nested)
  }

  test("kmvMerge of split states equals the from-scratch sketch") {
    val docs = Seq(
      (1L, "s0", "a b c d e"),
      (2L, "s0", "c d e f g"),
      (3L, "s0", "h i j"),
      (4L, "s1", "x y"),
      (5L, "s1", "y z")
    ).toDF("doc_id", "source", "text")
    def split(p: Int) = docs.filter(col("doc_id") % 2 === p)
    val merged = Incremental.kmvMerge(Seq(
        Incremental.kmvState(split(0), col("source"), col("text"), 4),
        Incremental.kmvState(split(1), col("source"), col("text"), 4)), 4)
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    val scratch = Incremental.kmvMerge(Seq(
        Incremental.kmvState(docs, col("source"), col("text"), 4)), 4)
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    assert(merged == scratch)
    // s1 has 3 distinct tokens < k=4: the sketch holds all, count exact
    assert(merged.find(_._1 == "s1").get._2 == 3L)
    // s0 has 10 distinct tokens > k: estimator path (positive estimate)
    assert(merged.find(_._1 == "s0").get._2 >= 4L)
  }

  test("cmMerge of split states equals the from-scratch grid; estimates bound exact") {
    val docs = Seq(
      (1L, "x x x y z"),
      (2L, "x y y w q"),
      (3L, "z z q w w")
    ).toDF("doc_id", "text")
    def grid(df: org.apache.spark.sql.DataFrame) =
      Incremental.cmState(df, col("text"))
    val merged = Incremental.cmMerge(Seq(
        grid(docs.filter(col("doc_id") % 2 === 0)),
        grid(docs.filter(col("doc_id") % 2 === 1))))
      .orderBy("row", "cell").collect().toSeq
    val scratch = Incremental.cmMerge(Seq(grid(docs)))
      .orderBy("row", "cell").collect().toSeq
    assert(merged == scratch)
    // CM never underestimates: est(x) >= 4, est(w) >= 3
    val est = Incremental.cmEstimate(Incremental.cmMerge(Seq(grid(docs))),
        Seq("x", "w"))
      .as[(String, Long)].collect().toMap
    assert(est("x") >= 4L && est("w") >= 3L)
  }

  test("cmEstimate: an unseen token reads its empty cells as 0, never a hot collision") {
    val docs = Seq((1L, "x x x")).toDF("doc_id", "text")
    val grid = Incremental.cmMerge(Seq(Incremental.cmState(docs, col("text"))))
    // "zzz_never_seen" has at least one empty cell among its 4 → min = 0
    // (with only one distinct corpus token, 4 simultaneous collisions are
    // impossible), and the token must still appear in the report
    val est = Incremental.cmEstimate(grid, Seq("x", "zzz_never_seen"))
      .as[(String, Long)].collect().toMap
    assert(est("x") >= 3L)
    assert(est("zzz_never_seen") == 0L)
  }

  test("retract(state(A), state(D)) equals state(A minus D); drained keys drop") {
    val all = Seq((1L, 100L), (1L, 50L), (1L, 7L), (2L, 9L), (3L, 4L))
      .toDF("user_id", "vm")
    val dels = Seq((1L, 50L), (2L, 9L)).toDF("user_id", "vm")
    def st(df: org.apache.spark.sql.DataFrame) =
      Incremental.retractableState(df, col("user_id"), col("vm"))
    val out = Incremental.retract(st(all), st(dels))
      .orderBy("key").as[(Long, Long, Long)].collect().toSeq
    // user 1 keeps 2 rows summing 107; user 2 fully drained → gone;
    // user 3 untouched
    assert(out == Seq((1L, 2L, 107L), (3L, 1L, 4L)))
  }
}
