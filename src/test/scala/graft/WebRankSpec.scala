package graft

import org.apache.spark.sql.functions._
import graft.pipeline.WebRank
import graft.web.UrlOps

class WebRankSpec extends SparkSpec {
  import spark.implicits._

  private val stopwords = Seq("the", "a", "of", "and", "is", "in", "to", "it")

  private def docs = (0L until 200L).map { i =>
    val text = if (i % 10 == 0) "x" // fails the C4 min-token rule
      else ("the quick brown fox jumps over a lazy dog and runs back " +
        "to the start of it all again now " + i)
    (i, text)
  }.toDF("doc_id", "text")

  test("crawlBudget: budget shares sum to ~1e6 and follow rank·quality") {
    val out = WebRank.crawlBudget(docs, stopwords, iterations = 2)
    val rows = out.as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._6).sum
    // floor-division loses < 1 ppm per domain
    assert(total <= 1000000L && total > 1000000L - rows.length,
      s"budget sum $total out of range for ${rows.length} domains")
    // every domain's priority is exactly rank·kept
    rows.foreach { case (_, _, rank, kept, priority, _) =>
      assert(priority == rank * kept)
    }
    // kept_ppm reflects the 1-in-10 short-doc rejection somewhere
    assert(rows.exists(_._4 < 1000000L))
  }

  test("crawlBudget: domain extraction equals the registrable-domain chain") {
    val got = docs.select(
        UrlOps.registrableDomain(WebRank.syntheticUrl(col("doc_id")))
          .as("d"),
        concat(lit("site"), (col("doc_id") % 37).cast("string"), lit("."),
          element_at(typedLit(Seq("com", "org", "net", "co.uk")),
            (col("doc_id") % 4 + 1).cast("int"))).as("e"))
      .filter(col("d") =!= col("e")).count()
    assert(got == 0L)
  }

  test("crawlBudget: total-sum join is a 1-row broadcast, no global resort") {
    val plan = WebRank.crawlBudget(docs, stopwords, iterations = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"expected broadcast total in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unexpected CartesianProduct in:\n$plan")
  }
}
