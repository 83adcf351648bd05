package graft

import org.apache.spark.sql.functions._
import graft.text.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: windows overlap by chunkSize - stride, tail kept, every token covered") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), chunkSize = 4, stride = 3)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, String, Int)].collect()
    // starts 1,4,7,10 -> 4 chunks, last is the 1-token tail
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out(0)._2 == "w1 w2 w3 w4")
    assert(out(1)._2 == "w4 w5 w6 w7")   // 1-token overlap
    assert(out(3)._2 == "w10" && out(3)._3 == 1)
    // coverage: every token appears in at least one chunk
    val covered = out.flatMap(_._2.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"w$i").toSet)
  }

  test("chunk: stride == chunkSize reconstructs the document exactly") {
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val parts = Chunking.chunk(Seq((7L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), chunkSize = 4, stride = 4)
      .orderBy("chunk_id").select("chunk_text").as[String].collect()
    assert(parts.mkString(" ") == text)
  }

  test("packBins: bins respect capacity for unit docs, big doc gets its own bin") {
    val docs = Seq(
      (1L, "s1", 100), (2L, "s1", 100), (3L, "s1", 100), (4L, "s1", 100),
      (5L, "s1", 999),                      // oversized: own bin
      (6L, "s2", 50)                        // other shard starts at bin 0
    ).toDF("doc_id", "source", "nt")
    val out = Chunking.packBins(docs, col("doc_id"), col("source"), col("nt"),
        capacity = 256)
      .orderBy("doc_id").select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    // cumulative-before: 0,100,200,300,400 -> bins 0,0,0,1,1... doc5 before=400 -> bin 1
    assert(out(1L) == 0 && out(2L) == 0 && out(3L) == 0)
    assert(out(4L) == 1 && out(5L) == 1)
    assert(out(6L) == 0)
    // per-bin totals of docs excluding the oversized one stay <= capacity + one doc slop
    val fill = Chunking.packBins(docs.filter(col("nt") < 256), col("doc_id"),
        col("source"), col("nt"), capacity = 256)
      .groupBy("source", "bin_id").agg(sum("n_tokens").as("fill"))
      .filter(col("fill") > 256 + 100)
    assert(fill.count() == 0)
  }

  test("packBinsGreedy: bins are hard capacity-bounded and greedy-maximal") {
    val docs = Seq(
      (1L, "s1", 100), (2L, "s1", 100), (3L, "s1", 100), (4L, "s1", 100),
      (5L, "s1", 999),                      // oversized: own bin, sole overflow
      (6L, "s1", 10),                       // fits after the oversized doc's bin
      (7L, "s2", 50)                        // other shard starts at bin 0
    ).toDF("doc_id", "source", "nt")
    val out = Chunking.packBinsGreedy(docs, col("doc_id"), col("source"),
        col("nt"), capacity = 256)
      .orderBy("doc_id").select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    // greedy walk in s1: 100+100=200 fits bin 0; +100 would hit 300 -> bin 1
    // holds 100+100=200; 999 overflows -> own bin 2; 10 -> bin 3 (999 filled
    // its bin past capacity, so the next doc opens a fresh one)
    assert(out(1L) == 0 && out(2L) == 0)
    assert(out(3L) == 1 && out(4L) == 1)
    assert(out(5L) == 2)
    assert(out(6L) == 3)
    assert(out(7L) == 0)
    // the hard bound: every bin with >1 doc sums <= capacity (the ONLY
    // overflow a greedy pack permits is a single oversized document)
    val overflow = Chunking.packBinsGreedy(docs, col("doc_id"), col("source"),
        col("nt"), capacity = 256)
      .groupBy("source", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("fill") > 256)
    assert(overflow.count() == 0)
  }

  test("epochShards: reproducible per epoch, distinct across epochs, dense positions") {
    import org.apache.spark.sql.functions._
    val df = (0L until 200L).toDF("doc_id")
    def run(epoch: Int) = Chunking.epochShards(df, col("doc_id"), epoch, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val e3a = run(3); val e3b = run(3); val e4 = run(4)
    assert(e3a.toSeq == e3b.toSeq)                      // deterministic
    assert(e3a.toSeq != e4.toSeq)                       // epoch changes the order
    assert(e3a.forall { case (_, s, _) => s >= 0 && s < 4 })
    // positions are a dense 0..n-1 range within every shard
    e3a.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length))
    }
    // every doc appears exactly once
    assert(e3a.map(_._1).toSeq == (0L until 200L))
  }

  test("chunk plans no shuffle (Generate over the scan)") {
    spark.conf.set("spark.graft.parallelizeInputs", "false")
    try {
      val p = SparkEntry.queries("t8_chunk")(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"chunking shuffled:\n$p")
      assert(p.contains("Generate"), s"expected explode Generate in:\n$p")
    } finally spark.conf.set("spark.graft.parallelizeInputs", "true")
  }

  test("lengthBatches: bins by length, batches full except the tail") {
    // 10 docs of 3 tokens (bin 0 at width 4) + 2 docs of 9 tokens (bin 2)
    val docs = ((1L to 10L).map(i => (i, "a b c")) ++
      Seq((11L, "a b c d e f g h i"), (12L, "a b c d e f g h j")))
      .toDF("doc_id", "text")
    val out = Chunking.lengthBatches(docs, col("doc_id"), col("text"),
        binWidth = 4, batchSize = 4)
      .orderBy("bin", "batch")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 4L, 3L, 12L, 0L),   // full batch, zero padding (equal lens)
      (0L, 1L, 4L, 3L, 12L, 0L),
      (0L, 2L, 2L, 3L, 6L, 0L),    // honest trailing partial batch
      (2L, 0L, 2L, 9L, 18L, 0L)))
  }

  test("lengthBatches: pad_waste_ppm measures padded positions exactly") {
    // one batch: lens 2 and 4 → padded grid 2·4 = 8, content 6 →
    // waste 2/8 = 250000 ppm
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = Chunking.lengthBatches(docs, col("doc_id"), col("text"),
        binWidth = 100, batchSize = 8)
      .select("pad_waste_ppm").as[Long].head()
    assert(out == 250000L)
  }

  test("spanCorruption: one span per full block, inside its block, short docs skip") {
    import graft.sim.Ivf.{PickA, PickB, PickP}
    val docs = Seq(
      (1L, (1 to 45).map(i => s"t$i").mkString(" ")),  // 45 toks → 2 blocks
      (2L, (1 to 19).map(i => s"t$i").mkString(" "))   // < 20 → nothing
    ).toDF("doc_id", "text")
    val out = Chunking.spanCorruption(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long)].collect().toSet
    def off(id: Long, w: Long) = ((id * PickA + w * PickB) % PickP) % 18
    assert(out == Set(
      (1L, 0L, off(1, 0), 3L),
      (1L, 1L, 20L + off(1, 1), 3L)))
    // spans stay inside their block: start + len <= (blockIdx+1) * 20
    out.foreach { case (_, w, start, len) =>
      assert(start >= w * 20 && start + len <= (w + 1) * 20)
    }
  }

  test("curriculum: equal-mass stages, dense per-stage positions") {
    // difficulties 1..8 → quartile boundaries 2,4,6 → stages of 2 each
    val docs = (1L to 8L).map(i => (i, i * 10L)).map { case (id, _) =>
      (id, id) }.toDF("doc_id", "n_chars")
    val out = Chunking.curriculum(docs, col("doc_id"), col("n_chars"),
        nStages = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byStage = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStage == Map(0L -> Set(1L, 2L), 1L -> Set(3L, 4L),
      2L -> Set(5L, 6L), 3L -> Set(7L, 8L)))
    // positions are a dense 0-based permutation within each stage
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted == Seq(0L, 1L))
    }
  }

  test("curriculum: within-stage order is the stage-keyed affine permutation") {
    import graft.sim.Ivf.{PickA, PickB, PickP}
    val docs = (1L to 12L).map(i => (i, 1L)).toDF("doc_id", "n_chars")
    // all difficulties equal → every doc in stage 0 (no boundary below)
    val out = Chunking.curriculum(docs, col("doc_id"), col("n_chars"))
      .orderBy("position").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.forall(_._2 == 0L))
    val expected = (1L to 12L)
      .sortBy(id => ((id % PickP) * PickA + PickB) % PickP)
    assert(out.map(_._1) == expected)
  }
}
