package graft

import org.apache.spark.sql.functions._
import graft.text.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a a a b b c d"),
    (2L, "a b c c e f g h"),
    (3L, "x y z a b q r s")).toDF("id", "text")

  test("sketch state is bounded by Depth x Width regardless of input") {
    val toks = docs.select(explode(split(lower(col("text")), " ")).as("token"))
    val sk = CountMin.sketch(toks, col("token"))
    assert(sk.count() <= CountMin.Depth * CountMin.Width)
    // every token occurrence landed in exactly Depth cells
    val total = sk.groupBy("row").agg(sum("n").as("s")).select("s")
      .as[Long].collect().toSet
    assert(total == Set(24L), "each row must count all 24 occurrences")
  }

  test("estimates never undercount and are exact without collisions") {
    val out = CountMin.heavyHitters(docs, col("text"), topK = 50)
      .select("token", "n_exact", "n_est")
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (t, exact, est) =>
      assert(est >= exact, s"Count-Min must never undercount ($t)")
    }
    // 17 distinct tokens over 4x256 cells: the min-row estimate is exact
    val a = out.find(_._1 == "a").get
    assert(a._2 == 6L && a._3 == 6L)
  }

  test("heavy-hitter boundary is deterministic (count desc, token asc)") {
    val top = CountMin.heavyHitters(docs, col("text"), topK = 3)
      .select("token").as[String].collect().toSet
    assert(top == Set("a", "b", "c"))
  }
}
