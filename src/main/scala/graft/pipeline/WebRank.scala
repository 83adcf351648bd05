package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.graph.PageRank
import graft.text.QualityFilters
import graft.web.UrlOps

/** The crawl-curation pipeline composed end-to-end: URL canonicalization
  * → registrable-domain rollup → domain link graph → integer PageRank →
  * C4-style per-domain quality → crawl-budget allocation. This is the
  * front half of a web-scale pretraining corpus build: decide, per
  * domain, how much fetch/refresh budget it earns BEFORE paying to
  * download it.
  *
  * Stage shapes (all engine-exact integer emissions):
  *   - Domain extraction is a pure projection ([[UrlOps]] regex chain —
  *     zero shuffles, scales with input bytes).
  *   - Quality rollup: one shuffle keyed on domain; the C4 rules
  *     ([[QualityFilters.qualityFilter]]) are row-local, `kept_ppm` is
  *     integer floor division.
  *   - PageRank: one shuffle per iteration over the cached normalized
  *     edge frame ([[PageRank.ranks]] — rank mass in micro-units).
  *   - Budget: `priority = rank_micro · kept_ppm` (≤ ~10¹³ at web node
  *     counts — int64-safe), then `budget_ppm = priority·10⁶ DIV Σpriority`
  *     with the product ridden as DECIMAL(38,0) (DuckDB replay: HUGEINT)
  *     because `priority·10⁶` alone can pass 2⁶³. The Σ rides a 1-row
  *     broadcast — no second pass over domains.
  */
object WebRank {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 0))
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** The synthetic URL convention of the t45 fixture: scheme/www/cdn
    * noise varies by residue, the registrable site by `id % 37` and the
    * public suffix by `id % 4` — so the full canonicalization chain has
    * real work to do before domains collapse.
    */
  def syntheticUrl(id: Column): Column = concat(
    when(id % 2 === 0, lit("https")).otherwise(lit("http")), lit("://"),
    when(id % 3 === 0, lit("WWW.")).otherwise(lit("")),
    when(id % 5 === 0, lit("cdn.")).otherwise(lit("")),
    lit("Site"), (id % 37).cast("string"), lit("."),
    element_at(typedLit(Seq("com", "org", "net", "co.uk")),
      (id % 4 + 1).cast("int")),
    lit("/p/"), id.cast("string"),
    lit("?utm_source=feed&id="), (id % 7).cast("string"), lit("&ref=x"))

  /** One row per domain: `n_docs`, `rank_micro`, `kept_ppm`, `priority`,
    * `budget_ppm` (Σ ≈ 10⁶ up to flooring).
    *
    * @param linkTarget maps a doc id to the doc id its page links to —
    *                   the synthetic stand-in for an extracted outlink
    */
  def crawlBudget(docs: DataFrame, stopwords: Seq[String],
                  iterations: Int = 5,
                  linkTarget: Column => Column = id => id * 7 + 3)
      : DataFrame = {
    val dom = (id: Column) => UrlOps.registrableDomain(syntheticUrl(id))
    val withDomain = docs.select(dom(col("doc_id")).as("domain"),
      col("text"))
    val quality = QualityFilters
      .qualityFilter(withDomain, col("domain"), col("text"), stopwords)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("drop_reason").isNull, 1L).otherwise(0L)).as("__kept"))
      .withColumn("kept_ppm", idiv(col("__kept") * 1000000L, col("n_docs")))
    val edges = docs.select(dom(col("doc_id")).as("src"),
      dom(linkTarget(col("doc_id"))).as("dst"))
    val ranks = PageRank.ranks(edges, iterations)
    val scored = ranks.join(quality, col("node") === col("domain"))
      .select(col("domain"), col("n_docs"), col("rank_micro"),
        col("kept_ppm"),
        (col("rank_micro") * col("kept_ppm")).as("priority"))
    val total = scored.agg(sum("priority").as("__tot"))
    scored.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"), col("rank_micro"),
        col("kept_ppm"), col("priority"),
        when(col("__tot") > 0,
          idiv(dec(col("priority")) * lit(1000000L), col("__tot")))
          .otherwise(lit(0L)).as("budget_ppm"))
  }
}
