package graft

import org.apache.spark.sql.functions._
import graft.ops.Abc

class AbcSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]) =
    Abc.classes(rows.toDF("k", "v"), col("k"), col("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("crossing level joins the higher class; shares are floor ppm") {
    // totals per key: 1->60, 2->25, 3->10, 4->5  (total 100)
    val out = run(Seq((1L, 40L), (1L, 20L), (2L, 25L), (3L, 10L), (4L, 5L)))
    // A: key1 (prefix 0 < 70) and key2 (prefix 60 < 70 — crossing);
    // B: key3 (prefix 85 < 90); C: key4
    assert(out("A") == ((2L, 85L, 850000L, 25L, 60L)))
    assert(out("B") == ((1L, 10L, 100000L, 10L, 10L)))
    assert(out("C") == ((1L, 5L, 50000L, 5L, 5L)))
  }

  test("equal-value keys share a level and a class") {
    // three keys of 30 each, one of 10: the 30-level (90 % cumulative,
    // prefix 0 < 70) is entirely A — no row-order tiebreak
    val out = run(Seq((1L, 30L), (2L, 30L), (3L, 30L), (4L, 10L)))
    assert(out("A")._1 == 3L && out("A")._2 == 90L)
    assert(out("C")._1 == 1L)
    assert(!out.contains("B"))
  }

  test("single key takes everything as A with share 1e6") {
    val out = run(Seq((7L, 42L)))
    assert(out == Map("A" -> ((1L, 42L, 1000000L, 42L, 42L))))
  }

  test("bucket-parallel cumsum ≡ global order: boundary, zero and negative levels") {
    // level values straddle bit-length bucket boundaries (1|2,3|4..7|8..)
    // and include 0 and negatives (return-heavy keys) — the r14 bucketed
    // window must reproduce the global (rev desc) running total exactly
    val rows = Seq(1L -> 16L, 2L -> 9L, 3L -> 8L, 4L -> 7L, 5L -> 4L,
      6L -> 3L, 7L -> 2L, 8L -> 1L, 9L -> 1L, 10L -> 0L, 11L -> -1L,
      12L -> -5L)
    val out = run(rows)
    // reference: global cumulative over levels desc (rev desc), exclusive
    // prefix crossing test, thresholds A=700000, B=900000 over total=45
    val levels = rows.groupBy(_._2).map { case (v, ks) => (v, ks.size.toLong) }
      .toSeq.sortBy(-_._1)
    val tot = levels.map { case (v, n) => v * n }.sum
    var cum = 0L
    val expect = levels.map { case (v, n) =>
      val before = cum; cum += v * n
      val cls = if (before * 1000000L < 700000L * tot) "A"
        else if (before * 1000000L < 900000L * tot) "B" else "C"
      (cls, v, n)
    }
    val expMap = expect.groupBy(_._1).map { case (c, ls) =>
      c -> ((ls.map(_._3).sum, ls.map(l => l._2 * l._3).sum,
        ls.map(l => l._2 * l._3).sum * 1000000L / tot,
        ls.map(_._2).min, ls.map(_._2).max))
    }
    assert(out == expMap)
  }
}
