package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleRehearsal

/** Invariants of the sf→N× rehearsal generator (tools/ScaleRehearsal).
  *
  * The generator's whole point is that a replicated directory measures a
  * BIGGER workload, not a DIFFERENT one: every FK stays valid inside its
  * replica (join fan-outs unchanged), replica texts are n-gram-disjoint
  * from the originals (no cross-replica trivial dups), and embeddings
  * keep their norms (cosine geometry intact within a replica). Each of
  * those claims is load-bearing for the SCALE.md ratio table, so each is
  * pinned here at sf0.001 with 2 replicas.
  */
class ScaleRehearsalSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private var generated: Option[java.nio.file.Path] = None
  private lazy val dst: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rehearsal")
    generated = Some(dir)
    ScaleRehearsal.generate(spark, src, dir.toString, replicas = 2)
    dir.toString
  }

  override def afterAll(): Unit = {
    // deleteOnExit would leave the tree behind (it only removes EMPTY
    // dirs, and generate() fills this one with parquet subtrees)
    generated.foreach { dir =>
      import scala.jdk.CollectionConverters._
      // Using: Files.walk holds a directory-stream handle until closed
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
        st.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    super.afterAll()
  }

  private def srcT(t: String) = spark.read.parquet(s"$src/$t.parquet")
  private def dstT(t: String) = spark.read.parquet(s"$dst/$t.parquet")

  test("replicated tables double; dimension leaves stay as-is") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      assert(dstT(t).count() === 2 * srcT(t).count(), s"table $t")
    }
    for (t <- Seq("region", "nation")) {
      assert(dstT(t).count() === srcT(t).count(), s"table $t")
    }
  }

  test("every FK remains closed inside its replica") {
    def dangling(fact: String, fk: String, dim: String, pk: String): Long =
      dstT(fact).select(col(fk).as("k"))
        .join(dstT(dim).select(col(pk).as("k")), Seq("k"), "left_anti")
        .count()
    assert(dangling("orders", "o_custkey", "customer", "c_custkey") === 0)
    assert(dangling("lineitem", "l_orderkey", "orders", "o_orderkey") === 0)
    assert(dangling("lineitem", "l_partkey", "part", "p_partkey") === 0)
    assert(dangling("lineitem", "l_suppkey", "supplier", "s_suppkey") === 0)
    assert(dangling("events", "user_id", "customer", "c_custkey") === 0)
  }

  test("per-key join fan-out is unchanged (not quadratic in replicas)") {
    def maxFanout(df: org.apache.spark.sql.DataFrame, key: String): Long =
      df.groupBy(col(key)).count().agg(max("count")).head.getLong(0)
    assert(maxFanout(dstT("lineitem"), "l_orderkey") ===
      maxFanout(srcT("lineitem"), "l_orderkey"))
    assert(maxFanout(dstT("orders"), "o_custkey") ===
      maxFanout(srcT("orders"), "o_custkey"))
  }

  test("replica 0 documents are byte-identical; replica 1 is a bijective " +
      "character map sharing no letter-bearing text with the originals") {
    val stride = srcT("documents")
      .agg(max(col("doc_id").cast("long"))).head.getLong(0) + 1
    val r0 = dstT("documents").filter(col("doc_id") < stride)
    val r1 = dstT("documents").filter(col("doc_id") >= stride)
      .withColumn("doc_id", col("doc_id") - stride)
    assert(r0.exceptAll(srcT("documents")).count() === 0, "replica 0 drifted")
    // undoing the replica-1 rotation (Caesar key 1) must reproduce the
    // original text exactly — bijectivity + length preservation in one shot
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val rot1 = lower.drop(1) + lower.take(1) + upper.drop(1) + upper.take(1)
    val undone = r1.withColumn("text",
      translate(col("text"), rot1, lower + upper))
    assert(undone.exceptAll(srcT("documents")).count() === 0,
      "replica 1 is not the documented Caesar-1 image")
    // and BEFORE undoing, no letter-bearing replica-1 text equals any
    // original (the cross-replica trivial-dup hazard the map exists for)
    val collisions = r1.filter(col("text").rlike("[A-Za-z]"))
      .select(col("text"))
      .join(srcT("documents").select(col("text")), Seq("text"), "left_semi")
      .count()
    assert(collisions === 0)
  }

  test("embedding sign-flip preserves norms (cosine isometry per replica)") {
    val stride = srcT("embeddings")
      .agg(max(col("vec_id").cast("long"))).head.getLong(0) + 1
    def norms(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("n2"))
    val r1 = norms(dstT("embeddings").filter(col("vec_id") >= stride)
      .withColumn("vec_id", col("vec_id") - stride))
    val drift = norms(srcT("embeddings")).alias("a")
      .join(r1.alias("b"), "vec_id")
      .filter(abs(col("a.n2") - col("b.n2")) > 1e-6)
      .count()
    assert(drift === 0)
  }
}
