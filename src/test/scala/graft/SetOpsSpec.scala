package graft

import graft.ops.SetOps

class SetOpsSpec extends SparkSpec {
  import spark.implicits._

  private def a = Seq(1, 2, 3).toDF("x")
  private def b = Seq(3, 4).toDF("x")

  test("union ALL preserves duplicates") {
    assert(SetOps.union(Seq(a, b), "ALL").as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 3, 3, 4))
  }

  test("union DISTINCT collapses duplicates") {
    assert(SetOps.union(Seq(a, b), "distinct").as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 3, 4))
  }

  test("unionAll aligns by name, not position") {
    val left = Seq((1, "a")).toDF("n", "s")
    val right = Seq(("b", 2)).toDF("s", "n")
    val out = SetOps.unionAll(Seq(left, right)).as[(Int, String)].collect().toSet
    assert(out == Set((1, "a"), (2, "b")))
  }

  test("unknown union type is rejected") {
    assertThrows[IllegalArgumentException](SetOps.union(Seq(a, b), "OUTER"))
  }

  test("unionByNameAligned: drifted schemas align by name, absents null-fill") {
    import org.apache.spark.sql.functions.col
    val x = Seq((1L, "a")).toDF("id", "name")
    val y = Seq((2L, 99L)).toDF("id", "score")
    val out = SetOps.unionByNameAligned(Seq(x, y))
    assert(out.columns.toSeq == Seq("id", "name", "score"))
    val rows = out.orderBy("id")
      .as[(Long, Option[String], Option[Long])].collect().toSeq
    assert(rows == Seq((1L, Some("a"), None), (2L, None, Some(99L))))
    // column ORDER differences alone must not misalign values
    val z = Seq(("b", 3L)).toDF("name", "id")
    val aligned = SetOps.unionByNameAligned(Seq(x, z))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(aligned == Seq((1L, "a"), (3L, "b")))
  }

  test("unionWiden: shared columns promote to the widest type, absent null-fill") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val gen1 = Seq((1, 10)).toDF("id", "v")                  // int, int
    val gen2 = Seq((2L, 2.5, "x")).toDF("id", "v", "tag")    // long, double
    val out = SetOps.unionWiden(Seq(gen1, gen2))
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == LongType && types("v") == DoubleType)
    val rows = out.orderBy("id")
      .as[(Long, Double, Option[String])].collect().toSeq
    assert(rows == Seq((1L, 10.0, None), (2L, 2.5, Some("x"))))
  }

  test("unionWiden: long meeting float widens to double (float would drop bits)") {
    import org.apache.spark.sql.types.DoubleType
    val a = Seq(Tuple1((1L << 40) + 1L)).toDF("v")
    val b = Seq(Tuple1(1.5f)).toDF("v")
    val out = SetOps.unionWiden(Seq(a, b))
    assert(out.schema("v").dataType == DoubleType)
    assert(out.as[Double].collect().toSet ==
      Set(((1L << 40) + 1L).toDouble, 1.5))
  }

  test("unionWiden: a non-numeric type conflict refuses instead of corrupting") {
    val a = Seq(Tuple1(1)).toDF("code")
    val b = Seq(Tuple1("X9")).toDF("code")
    val e = intercept[IllegalArgumentException] {
      SetOps.unionWiden(Seq(a, b))
    }
    assert(e.getMessage.contains("non-numeric type conflict"))
  }
}
