package graft

import org.apache.spark.sql.functions._
import graft.ops.Sharding

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def assignments(n: Int): Map[Long, Int] = {
    val keys = (0L until 2000L).toDF("k")
    Sharding.rendezvous(keys, col("k"), n)
      .select("k", "shard").as[(Long, Int)].collect().toMap
  }

  test("rendezvous: growing n to n+1 moves keys ONLY to the new shard, ~1/(n+1)") {
    val before = assignments(8)
    val after = assignments(9)
    val moved = before.keys.filter(k => before(k) != after(k)).toSeq
    assert(moved.nonEmpty)
    assert(moved.forall(k => after(k) == 8),
      "a mover landed on a surviving shard — rendezvous stability broken")
    val frac = moved.size.toDouble / before.size
    assert(frac > 0.05 && frac < 0.19, s"moved fraction $frac, expected ~1/9")
  }

  test("rendezvous: assignments balance within 2x of uniform at n = 8") {
    val counts = assignments(8).values.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 8, "every shard must receive keys")
    val (mn, mx) = (counts.values.min, counts.values.max)
    assert(mx < 2 * mn, s"imbalance $counts — the double-mix guard regressed")
  }

  test("rendezvous: shard_hash is the argmax evidence (no candidate beats it)") {
    val keys = (0L until 50L).toDF("k")
    val out = Sharding.rendezvous(keys, col("k"), 5)
      .select("k", "shard", "shard_hash").as[(Long, Int, Long)].collect()
    // recompute all candidates via the same public column functions
    val all = (0 until 5).map { sh =>
      keys.select(col("k"),
        lit(sh).as("s"),
        graft.text.TextAnalysis.mixHash(graft.text.TextAnalysis.mixHash(
          graft.text.TextAnalysis.tokenHash(
            concat(col("k").cast("string"), lit(":" + sh))))).as("h"))
        .as[(Long, Int, Long)].collect()
    }.flatten.groupBy(_._1)
    out.foreach { case (k, shard, h) =>
      val cands = all(k)
      assert(h == cands.map(_._3).max, s"key $k: $h is not the max hash")
      assert(shard == cands.filter(_._3 == h).map(_._2).min)
    }
  }
}
