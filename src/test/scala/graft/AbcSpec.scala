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
}
