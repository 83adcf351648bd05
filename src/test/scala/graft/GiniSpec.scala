package graft

import org.apache.spark.sql.functions._
import graft.ops.Gini

class GiniSpec extends SparkSpec {
  import spark.implicits._

  test("perGroup: uniform mass scores 0, single-holder approaches 1") {
    val df = Seq(
      ("even", 5L), ("even", 5L), ("even", 5L), ("even", 5L),
      ("onehot", 0L), ("onehot", 0L), ("onehot", 0L), ("onehot", 100L)
    ).toDF("g", "v")
    val out = Gini.perGroup(df, col("g"), col("v"))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("even") == ((4L, 20L, Some(0L))))
    // one holder of n=4: G = (n−1)/n = 750000 ppm
    assert(out("onehot") == ((4L, 100L, Some(750000L))))
  }

  test("perGroup: hand case matches the rank formula; zero mass is 0") {
    // values 1,2,3,4: Σx=10, 2Σi·x = 2(1+4+9+16)=60,
    // G = (60 − 5·10)/(4·10) = 0.25 → 250000 ppm
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("z", 0L), ("z", 0L)).toDF("g", "v")
    val out = Gini.perGroup(df, col("g"), col("v"))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out == Map("a" -> Some(250000L), "z" -> Some(0L)))
  }

  test("perGroup: negative values yield a typed null (Gini undefined)") {
    val df = Seq(("a", -1L), ("a", 3L)).toDF("g", "v")
    val out = Gini.perGroup(df, col("g"), col("v"))
      .as[(String, Long, Long, Option[Long])].collect().head
    assert(out._4.isEmpty)
  }
}
