package graft

import org.apache.spark.sql.functions._
import graft.sim.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8: values land in [-127, 127], max element maps to ±127") {
    val df = Seq(
        (1L, Seq(0.5f, -1.0f, 0.25f)),
        (2L, Seq(0.0f, 0.0f)),        // all-zero vector: q=0, err=0
        (3L, Seq(3.0f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.int8(df, col("vec_id"), col("embedding"))
      .orderBy("vec_id").collect()
    val q1 = out(0).getAs[String]("q_int8").split(",").map(_.toLong)
    assert(q1.toSeq == Seq(64L, -127L, 32L))
    assert(out(1).getAs[String]("q_int8") == "0,0")
    assert(out(1).getAs[Double]("max_abs_err") == 0.0)
    assert(out(2).getAs[String]("q_int8") == "127")
  }

  test("pq: codebook vectors reconstruct exactly; codes stay in range") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 60).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val out = Quantize.productQuantize(df, col("vec_id"), col("embedding"),
      m = 2, k = 3, dim = 8)
    assert(out.count() == 60)
    // every code string is m entries, each in [0, k)
    val badCodes = out.filter(
      size(split(col("codes"), ",")) =!= 2 ||
        exists(split(col("codes"), ","),
          c => c.cast("int") < 0 || c.cast("int") >= 3))
    assert(badCodes.count() == 0)
    // a vector that IS a codebook entry encodes each subspace at distance 0
    val picked = graft.sim.Ivf.centroids(df, 3)
      .select(col("c_emb")).collect().map(_.getSeq[Double](0)).toSet
    val pickedIds = df.collect()
      .filter(r => picked.contains(r.getSeq[Double](1)))
      .map(_.getLong(0)).toSet
    assert(pickedIds.size == 3)
    val exact = out.filter(col("vec_id").isin(pickedIds.toSeq: _*))
      .select(max(col("recon_err"))).collect()(0).getDouble(0)
    assert(exact == 0.0)
  }

  test("pq adc: distance to a codebook vector equals exact L2; ranks dense") {
    val rnd = new scala.util.Random(11)
    val data = (0 until 60).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    val df = data.toDF("vec_id", "embedding")
    val out = Quantize.adcTopK(df.filter(col("vec_id") % 20 === 0), df,
      topK = 60, m = 2, k = 3, dim = 8).collect()
    // full ranking: every query sees all 59 non-self neighbors, ranks dense
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.keySet == Set(0L, 20L, 40L))
    perQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to 59))
    }
    // a neighbor that IS a codebook entry reconstructs exactly, so its ADC
    // distance must equal the true L2 distance (up to the 6-dp rounding
    // and per-subspace vs whole-vector summation order)
    val picked = graft.sim.Ivf.centroids(df, 3)
      .select(col("c_emb")).collect().map(_.getSeq[Double](0)).toSet
    val pickedIds = data.filter(d => picked.contains(d._2)).map(_._1).toSet
    assert(pickedIds.size == 3)
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vec = data.toMap
    for (q <- Seq(0L, 20L, 40L); n <- pickedIds if n != q) {
      val exact = math.sqrt(
        vec(q).zip(vec(n)).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(math.abs(byPair((q, n)) - exact) < 2e-6,
        s"adc($q,$n)=${byPair((q, n))} exact=$exact")
    }
  }

  test("ivf-pq: probing all cells reproduces plain ADC top-k exactly") {
    val rnd = new scala.util.Random(13)
    val df = (0 until 80).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") % 25 === 0)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val full = rows(Quantize.adcTopK(q, df, topK = 5, m = 2, k = 3, dim = 8))
    val ivf = rows(Quantize.ivfPqTopK(q, df, topK = 5, nCells = 4, nProbe = 4,
      m = 2, k = 3, dim = 8))
    assert(ivf == full)
    // restricted probing still ranks densely with non-decreasing distance
    val probed = Quantize.ivfPqTopK(q, df, topK = 5, nCells = 4, nProbe = 2,
      m = 2, k = 3, dim = 8).collect()
    probed.groupBy(_.getLong(0)).values.foreach { rs =>
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to rs.length))
      assert(byRank.map(_.getDouble(2)).toSeq == byRank.map(_.getDouble(2)).sorted.toSeq)
    }
  }

  test("int8: reconstruction error bounded by half a quantization step") {
    val rnd = new scala.util.Random(42)
    val df = (0 until 200).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val bad = Quantize.int8(df, col("vec_id"), col("embedding"))
      // step = maxabs/127; err <= step/2 (+ float32 representation slack)
      .filter(col("max_abs_err") > lit(0.5) / col("scale") + lit(1e-9))
    assert(bad.count() == 0)
  }

  test("exactL2TopK: true Euclidean ranking, self excluded, id ties") {
    val emb = Seq(
      (0L, Array(0f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)),   // dist 1
      (2L, Array(3f, 4f, 0f, 0f)),   // dist 5
      (3L, Array(0f, 1f, 0f, 0f))    // dist 1 — ties with 1, id breaks
    ).toDF("vec_id", "embedding")
    val out = Quantize.exactL2TopK(
        emb.filter(col("vec_id") === 0), emb, topK = 2)
      .orderBy("rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.map(_._2) == Seq(1L, 3L))
    assert(out.map(_._3) == Seq(1.0, 1.0))
  }

  test("distortionSweep: nested codebooks make mean error weakly decreasing") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Quantize.distortionSweep(emb, col("vec_id"),
        col("embedding"), m = 4, ks = Seq(2, 4, 8), dim = 64)
      .orderBy("k_codes")
      .select("k_codes", "n_vectors", "sum_err_micro", "avg_err_micro",
        "max_err_micro")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(2, 4, 8))
    // same corpus every row; mean distortion never rises with more codes
    assert(out.map(_._2).distinct.size == 1)
    assert(out.sliding(2).forall { case Seq(a, b) => b._4 <= a._4 })
    out.foreach { r =>
      assert(r._4 <= r._5, "mean cannot exceed max")
      assert(r._3 == 0L || r._5 > 0L)
    }
  }

  test("binaryHammingTopK: sign-identical vectors rank first at hamming 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // base pattern: alternating signs; vec 2 = scaled copy of vec 1 (same
    // signs, hamming 0, cosine 1); vec 3 flips dims 0 and 63 (hamming 2);
    // vec 4 flips all signs (hamming 64)
    def v(scale: Float, flips: Set[Int]): Array[Float] =
      Array.tabulate(64) { d =>
        val base = if (d % 2 == 0) 0.5f else -0.5f
        (if (flips.contains(d)) -base else base) * scale
      }
    val emb = Seq(
      (1L, v(1.0f, Set())), (2L, v(2.0f, Set())),
      (3L, v(1.0f, Set(0, 63))), (4L, v(1.0f, (0 until 64).toSet))
    ).toDF("vec_id", "embedding")
    val out = Quantize.binaryHammingTopK(emb.filter(col("vec_id") === 1),
        emb, topK = 3, hammingCandidates = 3, dim = 64)
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(out(2L) == ((0L, 1.0, 1L)))       // sign-identical, cosine 1
    assert(out(3L)._1 == 2L && out(3L)._3 == 2L)
    assert(out(4L)._1 == 64L && out(4L)._2 == -1.0 && out(4L)._3 == 3L)
  }
}
