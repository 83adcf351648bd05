package graft

import org.apache.spark.sql.functions._
import graft.sim.Project

class ProjectSpec extends SparkSpec {
  import spark.implicits._

  test("randomProject: deterministic, seeded, linear in the input") {
    val df = Seq(
      (1L, Seq.fill(4)(1.0f)),
      (2L, Seq.fill(4)(2.0f)),     // 2x the first vector
      (3L, Seq.fill(4)(0.0f)))
      .toDF("vec_id", "embedding")
    val out = Project.randomProject(df, col("vec_id"), col("embedding"),
        dim = 4, outDim = 3, seed = 11L)
      .orderBy("vec_id").collect()
    val y1 = (0 until 3).map(j => out(0).getAs[Double](s"y$j"))
    val y2 = (0 until 3).map(j => out(1).getAs[Double](s"y$j"))
    val y3 = (0 until 3).map(j => out(2).getAs[Double](s"y$j"))
    assert(y3.forall(_ == 0.0))
    // linearity: f(2x) = 2 f(x) up to the rounding applied on each side
    y1.zip(y2).foreach { case (a, b) => assert(math.abs(b - 2 * a) < 2e-6) }
    // same seed → same planes; different seed → different projection
    val again = Project.randomProject(df, col("vec_id"), col("embedding"),
      dim = 4, outDim = 3, seed = 11L).orderBy("vec_id").collect()
    assert((0 until 3).forall(j => again(0).getAs[Double](s"y$j") == y1(j)))
    val other = Project.randomProject(df, col("vec_id"), col("embedding"),
      dim = 4, outDim = 3, seed = 12L).orderBy("vec_id").collect()
    assert((0 until 3).exists(j => other(0).getAs[Double](s"y$j") != y1(j)))
  }

  test("randomProject: JL sketch roughly preserves relative distances at outDim 16") {
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 40).map(i => (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Project.randomProject(df, col("vec_id"), col("embedding"),
        dim = 64, outDim = 16, seed = 3L)
      .collect().map(r => r.getLong(0) ->
        (0 until 16).map(j => r.getAs[Double](s"y$j")).toArray).toMap
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val orig = vecs.map { case (i, v) => i -> v.map(_.toDouble).toArray }.toMap
    // rank correlation proxy: the farthest original pair should not project
    // to the nearest projected pair (and vice versa) — a weak but stable
    // assertion that survives JL variance at outDim 16
    val pairs = for (i <- 0L until 40L; j <- (i + 1) until 40L) yield (i, j)
    val byOrig = pairs.sortBy { case (i, j) => d(orig(i), orig(j)) }
    val projD = pairs.map { case (i, j) => (i, j) -> d(proj(i), proj(j)) }.toMap
    val closestOrigHalf = byOrig.take(pairs.size / 2).toSet
    val byProj = pairs.sortBy(projD)
    // at least 70% of the projected nearest quarter comes from the original
    // nearest half
    val agree = byProj.take(pairs.size / 4).count(closestOrigHalf.contains)
    assert(agree >= pairs.size / 4 * 7 / 10,
      s"projection scrambled distances: $agree of ${pairs.size / 4}")
  }
}
