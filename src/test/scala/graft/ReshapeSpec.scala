package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Reshape

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("nestSchema builds structs from _-separated names") {
    val df = Seq((1, "city", 9.9)).toDF("meta_id", "geo_city_name", "geo_lat")
    val nested = Reshape.nestSchema(df)
    assert(nested.columns.toSeq == Seq("meta", "geo"))
    val geo = nested.schema("geo").dataType.asInstanceOf[StructType]
    assert(geo.fieldNames.toSeq == Seq("city", "lat"))
    assert(geo("city").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("name"))
    assert(nested.select($"geo.city.name").as[String].head() == "city")
  }

  test("nestSchema then flattenSchema is identity") {
    val df = Seq((1, "x", 2.0, true))
      .toDF("a_b_c", "a_b_d", "a_e", "f")
    val round = Reshape.flattenSchema(Reshape.nestSchema(df))
    assert(round.columns.toSeq == df.columns.toSeq)
    assert(round.collect().toSeq == df.collect().toSeq)
  }

  test("nestSchema rejects leaf/branch ambiguity") {
    val df = Seq((1, 2)).toDF("a", "a_b")
    assertThrows[IllegalArgumentException](Reshape.nestSchema(df))
  }

  test("stripPrefix renames in one projection, optionally restricted") {
    val df = Seq((1, 2, 3)).toDF("cleaned_x", "cleaned_y", "other")
    assert(Reshape.stripPrefix(df, "cleaned_").columns.toSeq == Seq("x", "y", "other"))
    assert(Reshape.stripPrefix(df, "cleaned_", Some(Set("cleaned_x")))
      .columns.toSeq == Seq("x", "cleaned_y", "other"))
  }

  test("selectByPrefixes keeps configured families only") {
    val df = Seq((1, 2, 3, 4)).toDF("classified_a", "cleaned_b", "cleanupdataproblems", "junk")
    assert(Reshape.selectByPrefixes(df, Seq("classified_", "cleaned_", "cleanup"))
      .columns.toSeq == Seq("classified_a", "cleaned_b", "cleanupdataproblems"))
  }

  test("dropPaths drops flat columns and nested struct fields by dotted path") {
    val df = Seq((1, "x", 2.0, true))
      .toDF("a_b_c", "a_b_d", "a_e", "f")
    val nested = Reshape.nestSchema(df) // a: {b: {c, d}, e}, f
    val out = Reshape.dropPaths(nested, Seq("f", "a.b.d"))
    assert(out.columns.toSeq == Seq("a"))
    val a = out.schema("a").dataType.asInstanceOf[StructType]
    assert(a("b").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("c"))
    assert(a.fieldNames.toSeq == Seq("b", "e"))
    // values survive the rewrite
    assert(out.select($"a.b.c").as[Int].head() == 1)
  }

  test("dropPaths ignores unknown paths (reference drop_fields semantics)") {
    val df = Seq((1, 2)).toDF("x", "y")
    val out = Reshape.dropPaths(df, Seq("nope", "missing.deep", "y"))
    assert(out.columns.toSeq == Seq("x"))
  }

  test("dropPaths ignores bad intermediates and handles case/whole-struct edges") {
    val df = Seq((1, (2, 3))).toDF("a", "s")
      .select(col("a"), col("s").cast("struct<x:int,y:int>"))
    // deep path through a non-struct field (s.x is int) and through a
    // missing field (s.nope.deep): both must no-op, not throw
    val out1 = Reshape.dropPaths(df, Seq("s.x.deep", "s.nope.deep"))
    assert(out1.columns.toSeq == Seq("a", "s"))
    assert(out1.select($"s.x").as[Int].head() == 2)
    // dropping every field — even via different CASING (dropFields
    // resolves case-insensitively) — drops the whole column
    val out2 = Reshape.dropPaths(df, Seq("s.X", "s.y"))
    assert(out2.columns.toSeq == Seq("a"))
  }

  test("dropPrefixedExcept drops prefix families unless whitelisted") {
    val df = Seq((1, 2, 3, 4))
      .toDF("classified_a", "userDefined_keep", "userDefined_drop", "plain")
    val out = Reshape.dropPrefixedExcept(df,
      Seq("classified_", "userDefined_"), Set("userDefined_keep"))
    assert(out.columns.toSeq == Seq("userDefined_keep", "plain"))
  }

  test("whenChain picks mapped column else default") {
    val df = Seq(("HOUSE", "h", "a"), ("APARTMENT", "h", "a"), ("PLOT", "h", "a"))
      .toDF("t", "houseCol", "aptCol")
    val out = df.select(Reshape.whenChain(col("t"),
      Seq("HOUSE" -> col("houseCol"), "APARTMENT" -> col("aptCol")),
      lit("NOT_APPLICABLE")).as("v")).as[String].collect().toSeq
    assert(out == Seq("h", "a", "NOT_APPLICABLE"))
  }

  test("subTypeMap defaults to NOT_APPLICABLE on null value") {
    val df = Seq(("HOUSE", Some("BUNGALOW")), ("PLOT", None))
      .toDF("t", "sub")
    val out = df.select(Reshape.subTypeMap(col("t"), col("sub")).as("m"))
      .as[Map[String, String]].collect().toSeq
    assert(out == Seq(Map("house" -> "BUNGALOW"), Map("plot" -> "NOT_APPLICABLE")))
  }
}
