package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction: the step UPSTREAM of every web-corpus curation
  * chain (CCNet / C4 / RefinedWeb all start here) — tag/script/style
  * strip, block segmentation on block-level tags, per-block link-density
  * boilerplate scoring, cleaned-text emit. Feeds the quality filters
  * (t4), URL ops ([[UrlOps]]), and span dedup that currently assume
  * already-extracted text.
  *
  * Plan shape: a PURE PROJECTION — explicit-class regexes and
  * higher-order functions only, zero shuffles, zero UDFs; 100 TB of crawl
  * HTML extracts embarrassingly parallel. Every regex is RE2-compatible
  * (no backreferences, no lookaround — script and style strip as two
  * separate patterns for exactly this reason), so the same patterns
  * replay verbatim in the DuckDB oracle and would on any RE2-based
  * engine.
  *
  * Scoring (integer-exact cross-engine): a block's `link_ppm` is
  * `floor(anchor_chars · 10⁶ / text_chars)` — the boilerplate signal of
  * Kohlschütter et al.'s boilerpipe, reduced to its strongest single
  * feature. A block is KEPT when its cleaned text has at least `minChars`
  * characters AND `link_ppm ≤ maxLinkPpm`; link-farm navigation blocks
  * (text ≈ anchors) score 10⁶ and die, prose with an inline link scores
  * low and survives. Tag-free whitespace-only blocks don't count as
  * blocks at all.
  */
object HtmlExtract {

  /** Block-level boundary tags → newline (segmentation points). */
  private val BlockTags =
    "(?i)</?(p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|section|article|" +
      "header|footer|blockquote|nav|aside|main|figure|figcaption|pre|hr)" +
      "\\b[^>]*>"

  /** Strip non-content containers WITH their contents, then comments.
    * Two patterns, not one with a backreference — RE2 compatibility.
    */
  private def stripNonContent(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html,
          "(?is)<script\\b[^>]*>.*?</script>", " "),
        "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Remaining (inline) tags → space, whitespace collapsed, trimmed. */
  private def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "(?s)<[^>]*>", " "), "\\s+", " "))

  /** Per-block structs: `txt` (cleaned text) and `link_ppm`
    * (anchor-chars/text-chars in parts-per-million; empty text scores
    * the full 10⁶ so it can never be kept by the density test alone).
    */
  private def blockStructs(html: Column): Column =
    transform(
      split(regexp_replace(stripNonContent(html), BlockTags, "\n"), "\n"),
      b => {
        val txt = cleanText(b)
        val ltxt = cleanText(concat_ws(" ",
          regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1))))
        struct(txt.as("txt"),
          when(length(txt) > 0,
            // floor over an exact double: numerator ≤ 1e6·len < 2^53 and
            // the true quotient is ≥ 1/len away from the next integer, so
            // IEEE rounding can't cross it — DuckDB replays bit-identically
            floor(length(ltxt).cast("double") * 1000000d / length(txt))
              .cast("long"))
            .otherwise(lit(1000000L)).as("link_ppm"))
      })

  /** Per-document extraction: `n_blocks` (non-empty text blocks),
    * `n_kept` (blocks surviving the length + link-density tests),
    * `clean_text` (kept blocks joined, document order), `n_clean_chars`.
    */
  def extract(df: DataFrame, id: Column, html: Column,
              minChars: Int = 20, maxLinkPpm: Long = 500000L): DataFrame = {
    val blks = blockStructs(html)
    def keep(s: Column): Column =
      length(s.getField("txt")) >= minChars &&
        s.getField("link_ppm") <= maxLinkPpm
    df.select(id,
        filter(blks, s => length(s.getField("txt")) > 0).as("__b"))
      .select(id,
        size(col("__b")).as("n_blocks"),
        size(filter(col("__b"), keep(_))).as("n_kept"),
        concat_ws(" ",
          transform(filter(col("__b"), keep(_)), _.getField("txt")))
          .as("clean_text"))
      .withColumn("n_clean_chars", length(col("clean_text")))
  }

  /** MAIN-CONTENT selection (the Readability/boilerpipe "largest content
    * region" heuristic): the longest CONTIGUOUS run of kept blocks, ties
    * to the earliest. Navigation/boilerplate blocks break runs, so a page
    * whose prose is split by one nav strip yields the larger prose side
    * rather than everything — the behavior article extractors want where
    * [[extract]]'s keep-all-matching emit would splice header prose onto
    * body prose.
    *
    * One `aggregate` fold over the block array per row, state = five
    * longs `[idx, runStart, runLen, bestStart, bestLen]` — integer-exact
    * and replayed verbatim by the DuckDB oracle's `list_reduce` over the
    * same encoding. Still a pure zero-shuffle projection.
    *
    * Emits: `n_blocks`, `main_start` (0-based index of the chosen run in
    * the non-empty block sequence), `main_blocks` (run length; 0 = no
    * kept block), `main_text`, `n_main_chars`.
    */
  def mainContent(df: DataFrame, id: Column, html: Column,
                  minChars: Int = 20, maxLinkPpm: Long = 500000L): DataFrame = {
    def keep(s: Column): Column =
      length(s.getField("txt")) >= minChars &&
        s.getField("link_ppm") <= maxLinkPpm
    val st0 = array(lit(0L), lit(0L), lit(0L), lit(0L), lit(0L))
    df.select(id,
        filter(blockStructs(html),
          s => length(s.getField("txt")) > 0).as("__b"))
      .withColumn("__f", aggregate(col("__b"), st0, (s, b) => {
        val idx = element_at(s, 1)
        val cs = element_at(s, 2)
        val cl = element_at(s, 3)
        val bs = element_at(s, 4)
        val bl = element_at(s, 5)
        // a kept block extends (or starts) the current run; the best run
        // updates only on STRICT improvement — ties stay earliest
        val cs2 = when(cl === 0, idx).otherwise(cs)
        val cl2 = cl + 1
        val grew = keep(b) && cl2 > bl
        array(idx + 1,
          when(keep(b), cs2).otherwise(cs),
          when(keep(b), cl2).otherwise(lit(0L)),
          when(grew, cs2).otherwise(bs),
          when(grew, cl2).otherwise(bl))
      }))
      .select(id,
        size(col("__b")).as("n_blocks"),
        element_at(col("__f"), 4).as("main_start"),
        element_at(col("__f"), 5).as("main_blocks"),
        concat_ws(" ", transform(
          slice(col("__b"), (element_at(col("__f"), 4) + 1).cast("int"),
            element_at(col("__f"), 5).cast("int")),
          _.getField("txt"))).as("main_text"))
      .withColumn("n_main_chars", length(col("main_text")))
  }

  /** Per-block view (posexplode — still map-only, zero shuffle):
    * (id, block_idx, text, link_ppm, kept). The debugging/threshold-tuning
    * surface; [[extract]] is the production emit.
    */
  def blocks(df: DataFrame, id: Column, html: Column,
             minChars: Int = 20, maxLinkPpm: Long = 500000L): DataFrame =
    df.select(id,
        posexplode(filter(blockStructs(html),
          s => length(s.getField("txt")) > 0)).as(Seq("block_idx", "__s")))
      .select(id, col("block_idx"),
        col("__s.txt").as("text"),
        col("__s.link_ppm").as("link_ppm"))
      .withColumn("kept",
        length(col("text")) >= minChars && col("link_ppm") <= maxLinkPpm)

  /** All `href` attribute values, document order. One RE2-safe pattern:
    * the `["']` CLASS (not a backreference) accepts either quote — a
    * mismatched pair extracts deterministically on both engines.
    */
  private def hrefs(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*?href\\s*=\\s*[\"']([^\"'>]*)[\"']"), lit(1))

  /** Minimal outlink resolution against the page's own host — the subset
    * every crawl-graph build needs, each case a documented convention:
    * protocol-relative `//host/p` → `host/p`; absolute `scheme://…` kept
    * (normalization strips the scheme anyway); root-relative `/p` →
    * `baseHost/p`. Everything else resolves to NULL and is dropped:
    * fragments, `mailto:`/`javascript:`/`data:` (no `://`, so they fail
    * the scheme test), and PATH-relative links — full RFC 3986
    * dot-segment merging is out of scope, and dropping beats resolving
    * wrong (a crawl frontier built on bad merges poisons the graph).
    */
  private def resolveHref(h: Column, baseHost: Column): Column =
    when(h.rlike("^//"), regexp_replace(h, "^//", ""))
      .when(h.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), h)
      .when(h.rlike("^/"), concat(baseHost, h))
      .otherwise(lit(null))

  /** Kept (href, resolved) pairs, document order. */
  private def resolvedLinks(html: Column, baseUrl: Column): Column =
    filter(
      transform(hrefs(html), h =>
        struct(h.as("href"),
          resolveHref(h, UrlOps.host(baseUrl)).as("res"))),
      s => s.getField("res").isNotNull)

  /** Per-link OUTLINK table (the crawl-frontier feed): one row per
    * resolvable anchor — `link_idx` (0-based over KEPT links, document
    * order), the raw `href`, the [[UrlOps.normalizeUrl]]-canonical `url`,
    * and the eTLD+1 `domain`. Map-only posexplode, zero shuffle; pages
    * with no resolvable link emit nothing (the table is link-scale).
    */
  def links(df: DataFrame, id: Column, html: Column,
            baseUrl: Column): DataFrame =
    df.select(id,
        posexplode(resolvedLinks(html, baseUrl)).as(Seq("link_idx", "__l")))
      .select(id, col("link_idx"),
        col("__l.href").as("href"),
        UrlOps.normalizeUrl(col("__l.res")).as("url"),
        UrlOps.registrableDomain(col("__l.res")).as("domain"))

  /** Registrable-domain edge list from extracted outlinks — the input
    * [[graft.graph.PageRank]] and the crawl-budget pipeline key on:
    * `(src, dst)` distinct, self-loops dropped (intra-site links are
    * navigation, not endorsement). ONE edge-scale shuffle (the distinct);
    * extraction itself stays map-only.
    */
  def hostEdges(df: DataFrame, id: Column, html: Column,
                baseUrl: Column): DataFrame =
    df.select(UrlOps.registrableDomain(baseUrl).as("src"),
        explode(transform(resolvedLinks(html, baseUrl),
          _.getField("res"))).as("__u"))
      .select(col("src"), UrlOps.registrableDomain(col("__u")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
}
