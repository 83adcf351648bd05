package graft

import org.apache.spark.sql.functions._
import graft.ops.FuzzyMatch

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  test("selfPairs: substitution, insertion, deletion all match; d=2 not") {
    val df = Seq(
      (1L, "spark"), (2L, "spork"),  // substitution → d1
      (3L, "sparks"),                // insertion vs 1 → d1
      (4L, "spar"),                  // deletion vs 1 → d1
      (5L, "scala")                  // d ≥ 2 from everything
    ).toDF("id", "name")
    val out = FuzzyMatch.selfPairs(df, col("id"), col("name"))
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    // only spark pairs with each neighbor; spork–spar, spork–sparks,
    // sparks–spar are all distance 2 and must be absent even where the
    // candidate stage surfaces them
    assert(out.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(out.forall(_._3 == 1))
  }

  test("selfPairs: identical strings pair at distance 0, emitted once") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "same"))
      .toDF("id", "name")
    val out = FuzzyMatch.selfPairs(df, col("id"), col("name"))
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().toSet
    assert(out == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }
}
