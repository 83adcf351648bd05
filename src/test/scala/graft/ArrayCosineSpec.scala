package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

class ArrayCosineSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-12

  test("cosine expression matches HOF computation and hand values") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f), Array(-1.0f, -2.0f), -1.0),
      (Array(3.0f, 4.0f), Array(4.0f, 3.0f), 24.0 / 25.0)
    ).toDF("a", "b", "expected")
    val rows = df.select(
      Similarity.cosine(col("a").cast("array<double>"), col("b").cast("array<double>")).as("c"),
      Similarity.dotUnit(Similarity.unitNorm(col("a")), Similarity.unitNorm(col("b"))).as("h"),
      col("expected")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < eps, s"expr vs expected: $r")
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9, s"expr vs HOF: $r")
    }
  }

  test("null array yields null; interpreted and codegen paths agree") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(2.0, 1.0))),
      (None, Some(Array(1.0, 1.0)))
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
  }

  test("cosine_sim registers for SQL use") {
    org.apache.spark.sql.graftfn.registerGraftFunctions(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < eps)
  }
}
