package graft

import org.apache.spark.sql.functions._
import graft.dedup.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("dedupSpans: identity on a duplicate-free corpus") {
    // every span distinct -> every doc reconstructs exactly
    val docs = Seq(
      (1L, (1 to 16).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 11).map(i => s"b$i").mkString(" "))) // partial tail block
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, col("doc_id"), col("text"), spanTokens = 8)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out(0) == ((1L, (1 to 16).map(i => s"a$i").mkString(" "), 2L)))
    assert(out(1) == ((2L, (1 to 11).map(i => s"b$i").mkString(" "), 2L)))
  }

  test("dedupSpans: later occurrences cut, first kept; emptied docs vanish; idempotent") {
    val block = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, block + " " + (1 to 8).map(i => s"x$i").mkString(" ")), // owns both spans
      (2L, block),                                   // exact duplicate block -> emptied
      (3L, (1 to 8).map(i => s"y$i").mkString(" ") + " " + block)) // second span dup
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, col("doc_id"), col("text"), spanTokens = 8)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 3L), "doc 2 must vanish entirely")
    assert(out(0)._2.startsWith(block))
    assert(out(1)._2 == (1 to 8).map(i => s"y$i").mkString(" "), "doc 3 keeps only its own span")
    // idempotence: a deduped corpus has no duplicate spans left
    val again = SpanDedup.dedupSpans(
      out.toSeq.map(r => (r._1, r._2)).toDF("doc_id", "text"),
      col("doc_id"), col("text"), spanTokens = 8)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(again.map(r => (r._1, r._2)).toSeq == out.map(r => (r._1, r._2)).toSeq)
  }

  test("dedupSpans: within-document repeats collapse to the first position") {
    val block = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq((1L, block + " " + block)).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, col("doc_id"), col("text"), spanTokens = 8)
      .as[(Long, String, Long)].collect()
    assert(out.head._2 == block && out.head._3 == 1L)
  }

  test("dedupSpansHashed: result-identical to the text-key path on the test corpus") {
    // the production 8-byte-key plan must be a pure shuffle-size
    // optimization: same rows, same stitched text, same counts — on real
    // documents (cross-doc + within-doc dups) and under carry columns
    val docs = Tables.documents(spark, sf)
    val exact = SpanDedup.dedupSpans(docs, col("doc_id"), col("text"),
      spanTokens = 8, carry = Seq("lang")).orderBy("doc_id")
      .as[(Long, String, String, Long)].collect().toSeq
    val hashed = SpanDedup.dedupSpansHashed(docs, col("doc_id"), col("text"),
      spanTokens = 8, carry = Seq("lang")).orderBy("doc_id")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(exact.nonEmpty && hashed == exact)
  }

  test("dedupSpansLocal: within-doc repeats drop, first occurrence and order survive") {
    val df = Seq(
      (1L, "a b c d a b e f a b"),  // blocks(2): "a b","c d","a b","e f","a b"
      (2L, "p q r s t u")           // no repeats
    ).toDF("id", "text")
    val out = SpanDedup.dedupSpansLocal(df, col("id"), col("text"), spanTokens = 2)
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 5L, 3L, "a b c d e f")))
    assert(out(1) == ((2L, 3L, 3L, "p q r s t u")))
  }

  test("dedupSpansLocal plans a pure projection — zero exchanges") {
    val df = (1L to 50L).map(i => (i, s"w$i x$i w$i x$i")).toDF("id", "text")
    val plan = SpanDedup.dedupSpansLocal(df, col("id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"row-local pass must not shuffle:\n$plan")
  }

  test("removeBoilerplateSpans: heavy spans cut everywhere, rare spans survive") {
    val banner = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, banner + " " + (1 to 8).map(i => s"a$i").mkString(" ")),
      (2L, banner + " " + (1 to 8).map(i => s"b$i").mkString(" ")),
      (3L, banner),                          // all boilerplate -> vanishes
      // a block duplicated TWICE in one doc counts once toward df
      (4L, (1 to 8).map(i => s"d$i").mkString(" ") + " " +
           (1 to 8).map(i => s"d$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeBoilerplateSpans(docs, col("doc_id"),
        col("text"), spanTokens = 8, minDocs = 3)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    // banner hit df=3 -> cut from docs 1,2 and doc 3 vanished; doc 4's
    // intra-doc repeat has df=1 and keeps BOTH copies (not this op's job)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 4L))
    assert(out(0)._2 == (1 to 8).map(i => s"a$i").mkString(" "))
    assert(out(1)._2 == (1 to 8).map(i => s"b$i").mkString(" "))
    assert(out(2)._3 == 2L)
    // below threshold (df=2 < 3): nothing is cut
    val kept = SpanDedup.removeBoilerplateSpans(
        docs.filter(col("doc_id") =!= 3L), col("doc_id"), col("text"),
        spanTokens = 8, minDocs = 3)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(kept(0)._2.startsWith(banner) && kept(1)._2.startsWith(banner))
    intercept[IllegalArgumentException] {
      SpanDedup.removeBoilerplateSpans(docs, col("doc_id"), col("text"),
        minDocs = 1)
    }
  }

  test("removeBoilerplateSpans: span rows take a broadcast anti join — no span-key shuffle on the corpus side") {
    val docs = Tables.documents(spark, sf)
    val plan = SpanDedup.removeBoilerplateSpans(docs, col("doc_id"),
      col("text")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"boilerplate set must broadcast into a left anti hash join:\n$plan")
  }

  test("incremental gate: state blocks cut everywhere, in-batch dups keep first, " +
    "emptied docs vanish") {
    val block = (1 to 8).map(i => s"w$i").mkString(" ")
    val hist = Seq((10L, block)).toDF("doc_id", "text")
    val state = SpanDedup.spanHashState(hist, col("text"), spanTokens = 8)
    val batch = Seq(
      (1L, block + " " + (1 to 8).map(i => s"x$i").mkString(" ")), // state dup + fresh
      (2L, (1 to 8).map(i => s"y$i").mkString(" ")),               // fresh
      (3L, (1 to 8).map(i => s"y$i").mkString(" ")),               // in-batch dup of 2
      (4L, block))                                                 // fully state-dup
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupSpansAgainstState(batch, col("doc_id"),
        col("text"), state, spanTokens = 8)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // 3 lost to 2, 4 emptied
    assert(out(0)._2 == (1 to 8).map(i => s"x$i").mkString(" "))
    assert(out(1)._2 == (1 to 8).map(i => s"y$i").mkString(" "))
  }

  test("incremental gate composed over ordered batches == one-shot dedupSpans") {
    // batch-append ingest on the real corpus: ids < median ship first,
    // the rest arrive as tonight's batch. Composing the gate must equal
    // the one-shot corpus pass restricted to tonight's docs (history ids
    // all precede batch ids, so global first occurrences in the batch are
    // exactly the gate's survivors).
    val docs = Tables.documents(spark, sf)
    val split = 2500L
    val hist = docs.filter(col("doc_id") < split)
    val batch = docs.filter(col("doc_id") >= split)
    val state = SpanDedup.spanHashState(hist, col("text"), spanTokens = 8)
    val gated = SpanDedup.dedupSpansAgainstState(batch, col("doc_id"),
        col("text"), state, spanTokens = 8)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val oneShot = SpanDedup.dedupSpans(docs, col("doc_id"), col("text"),
        spanTokens = 8)
      .filter(col("doc_id") >= split)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(gated == oneShot)
  }

  test("dedupSpansHashed: the window shuffle never carries span text") {
    // grep the optimized plan: the only Exchange whose child is the span
    // Generate must key and carry __h/__pos/id — no string span column
    val docs = Tables.documents(spark, sf)
    val plan = SpanDedup.dedupSpansHashed(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"), "hash key must drive the window")
  }
}
