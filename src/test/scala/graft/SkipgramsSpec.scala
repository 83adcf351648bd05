package graft

import org.apache.spark.sql.functions._
import graft.text.{FeatureHash, Skipgrams}

class SkipgramsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(texts: Seq[String], w: Int = 2, k: Int = 100) =
    Skipgrams.topPairs(texts.map(Tuple1(_)).toDF("text"), col("text"),
        w, k)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("window 2 pairs each position with the next two; unordered canonical") {
    val out = pairs(Seq("a b c d"))
    // positions: (a,b),(a,c),(b,c),(b,d),(c,d)
    assert(out == Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "d") -> 1L))
  }

  test("reversed contexts accumulate into one unordered pair") {
    val out = pairs(Seq("x y", "y x"))
    assert(out == Map(("x", "y") -> 2L))
  }

  test("single-token and empty docs contribute nothing") {
    val out = pairs(Seq("solo", "", "a b"))
    assert(out == Map(("a", "b") -> 1L))
  }

  test("top-k cuts on (n desc, w1, w2)") {
    val out = pairs(Seq("a b", "a b", "c d"), k = 1)
    assert(out == Map(("a", "b") -> 2L))
  }

  test("case folds before pairing") {
    val out = pairs(Seq("Fast SLOW", "fast slow"))
    assert(out == Map(("fast", "slow") -> 2L))
  }

  test("feature hash buckets: occupancy sums and collision counts") {
    val df = Seq("a b a", "c a").map(Tuple1(_)).toDF("text")
    val out = FeatureHash.bucketProfile(df, col("text"), buckets = 4)
      .as[(Long, Long, Long, Long)].collect()
    // total occurrences conserved
    assert(out.map(_._2).sum == 5L)
    // reconstruct expected buckets from the engine-neutral hash
    val h = (t: String) =>
      t.foldLeft(7L)((a, c) => (a * 131 + c.toLong) % 1000000007L) % 4
    val expect = Seq("a" -> 3L, "b" -> 1L, "c" -> 1L)
      .groupBy { case (t, _) => h(t) }
    out.foreach { case (b, occ, dist, topPpm) =>
      val toks = expect(b)
      assert(occ == toks.map(_._2).sum)
      assert(dist == toks.size.toLong)
      assert(topPpm == toks.map(_._2).max * 1000000L / occ)
    }
    assert(out.length == expect.size)
  }
}
