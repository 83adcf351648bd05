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

  test("all six native expressions register for SQL, bit-identical to the API") {
    import graft.dedup.{MinHashLSH, SimHash}
    org.apache.spark.sql.graftfn.registerGraftFunctions(spark)

    val si = spark.sql(
      "SELECT sorted_intersect_size(array(1L,2L,5L,9L), array(2L,3L,9L)) AS n")
      .collect()(0).getInt(0)
    assert(si == 2)

    // SQL route must reproduce the DataFrame API's signatures exactly
    // (same (count, seed)-derived hash family)
    val docs = Seq((1L, "the quick brown fox"), (2L, "lazy dogs sleep"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sig_docs")
    val apiSig = MinHashLSH.signatures(docs, col("doc_id"), col("text"),
        numHashes = 8, shingleN = 1, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sqlSig = spark.sql(
      s"""SELECT doc_id, minhash_signature(
         |  array_distinct(transform(split(lower(text), ' '),
         |    s -> pmod(xxhash64(s), ${MinHashLSH.P}))), 8, 42) AS sig
         |FROM sig_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sqlSig == apiSig)

    val apiFp = SimHash.fingerprints(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // tokenHash is a Column-level composition, not a registered SQL
    // function — build the token hashes with the DataFrame API and feed
    // the SQL function through a view
    val hashed = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.array_distinct(
          org.apache.spark.sql.functions.split(lower(col("text")), " ")),
        t => graft.text.TextAnalysis.tokenHash(t)).as("hashes"))
    hashed.createOrReplaceTempView("fp_docs")
    val sqlFp2 = spark.sql(
      "SELECT doc_id, simhash_fingerprint(hashes, 64, 7) AS fp FROM fp_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlFp2 == apiFp)

    val apiRabin = docs.select(col("doc_id"),
        graft.text.TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sqlRabin = spark.sql(
      "SELECT doc_id, rabin_fingerprint(text) AS fp FROM sig_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlRabin == apiRabin)

    // nfc_normalize: decomposed é (e + U+0301) composes to one codepoint
    val nfc = spark.sql("SELECT length(nfc_normalize('café')) AS n")
      .collect()(0).getInt(0)
    assert(nfc == 4)
  }
}
