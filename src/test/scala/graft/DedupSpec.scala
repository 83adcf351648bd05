package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("topOnePerKey keeps exactly one row per key, a member of the input, maximal under the order") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val rows = List.fill(60)((rnd.nextInt(6), rnd.nextInt(100), rnd.nextLong(1000)))
      val df = rows.toDF("k", "v", "uid")
      val out = Dedup.topOnePerKey(df, Seq(col("k")),
        Seq(col("v").desc, col("uid").desc)).collect()
      val byKey = out.groupBy(_.getInt(0))
      assert(byKey.values.forall(_.length == 1))
      assert(byKey.keySet == rows.map(_._1).toSet)
      val input = rows.toSet
      assert(out.forall(r => input.contains((r.getInt(0), r.getInt(1), r.getLong(2)))))
      val expected = rows.groupBy(_._1).view.mapValues(_.maxBy(t => (t._2, t._3))).toMap
      assert(out.forall(r => expected(r.getInt(0)) == ((r.getInt(0), r.getInt(1), r.getLong(2)))))
    }
  }

  test("dropExactDuplicates keeps the row with smallest keep-column") {
    val df = Seq(("a", 3L), ("a", 1L), ("b", 2L)).toDF("txt", "id")
    val out = Dedup.dropExactDuplicates(df, Seq(col("txt")), col("id"))
      .as[(String, Long)].collect().toSet
    assert(out == Set(("a", 1L), ("b", 2L)))
  }

  test("snapshotDiff: all four statuses; disjoint snapshots are pure add/remove") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "fp")
    val newSnap = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "fp")
    val out = Dedup.snapshotDiff(oldSnap, newSnap, "id", "fp")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // disjoint id spaces: every row classifies, nothing silently drops
    val disjoint = Dedup.snapshotDiff(
      Seq((1L, "x")).toDF("id", "fp"), Seq((9L, "y")).toDF("id", "fp"),
      "id", "fp").collect().map(r => r.getString(1)).sorted.toSeq
    assert(disjoint == Seq("added", "removed"))
  }

  test("dropAlreadySeen: history suppresses, batch self-dedupes, min keep wins") {
    val history = Seq((100L, "aaa"), (101L, "bbb")).toDF("id", "k")
    val batch = Seq(
        (1L, "aaa"),              // already in history -> dropped
        (2L, "ccc"), (3L, "ccc"), // in-batch dup -> keep id 2
        (4L, "ddd"))
      .toDF("id", "k")
    val out = Dedup.dropAlreadySeen(batch, history, col("k"), col("id"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(2L, 4L))
  }

  test("normalizedDedup: case/punct/whitespace variants collapse, min id kept") {
    val docs = Seq(
      (10L, "Hello, World!"),
      (11L, "hello world"),
      (12L, "HELLO  world?!"),
      (20L, "something else"),
      (30L, "!!!"),      // all punctuation -> empty key
      (31L, "  ...  ")   // also empty key -> collapses with 30
    ).toDF("id", "text")
    val out = Dedup.normalizedDedup(docs, col("id"), col("text"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      10L -> ((3L, 11L)),  // "hello world" is 11 chars
      20L -> ((1L, 14L)),
      30L -> ((2L, 0L))))
  }

  test("softDedupWeights: every row kept, weight = 1e6/cluster truncated") {
    import org.apache.spark.sql.functions.md5
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b c"),  // cluster of 3
      (4L, "x y z"), (5L, "x y z"),                 // cluster of 2
      (6L, "unique text")
    ).toDF("doc_id", "text")
    val out = ops.Dedup.softDedupWeights(docs, col("doc_id"),
        md5(col("text")))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 6)  // nothing dropped
    assert(out(1L) == ((3L, 333333L)) && out(2L) == ((3L, 333333L)))
    assert(out(4L) == ((2L, 500000L)) && out(5L) == ((2L, 500000L)))
    assert(out(6L) == ((1L, 1000000L)))
  }
}
