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
}
