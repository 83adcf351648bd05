package graft

import org.apache.spark.sql.functions._
import graft.dedup.Bloom

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def report(batch: Seq[(String, Long)], hist: Seq[Long],
                     words: Int = 2) =
    Bloom.gateReport(batch.toDF("g", "f"), hist.map(Tuple1(_)).toDF("f"),
        col("f"), col("g"), words)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("no false negatives: every true duplicate is a candidate") {
    val hist = Seq(5L, 70L, 123L)
    val batch = Seq(("a", 5L), ("a", 70L), ("a", 123L), ("a", 6L))
    val out = report(batch, hist)
    val (n, clean, cand, dup, fp) = out("a")
    assert(n == 4L && dup == 3L)
    assert(cand >= dup, "a true dup escaped the candidate set")
    assert(clean + cand == n && fp == cand - dup)
  }

  test("bit collisions surface as false positives, never as misses") {
    // words=1 -> 62 bits; 0 and 62 collide (62 % 62 == 0)
    val out = report(Seq(("a", 62L), ("a", 1L)), Seq(0L), words = 1)
    assert(out("a") == ((2L, 1L, 1L, 0L, 1L)))
  }

  test("clean rows skip the exact check and count as provably new") {
    val out = report(Seq(("a", 10L), ("b", 11L)), Seq(40L))
    assert(out("a") == ((1L, 1L, 0L, 0L, 0L)))
    assert(out("b") == ((1L, 1L, 0L, 0L, 0L)))
  }

  test("bit table packs 62 bits per word with positive masks") {
    val bloom = Bloom.build(Seq(0L, 61L, 62L).map(Tuple1(_)).toDF("f"),
        col("f"), words = 2)
      .as[(Long, Long)].collect().toMap
    assert(bloom(0L) == (1L | (1L << 61)))
    assert(bloom(1L) == 1L)
    assert(bloom.values.forall(_ > 0L))
  }
}
