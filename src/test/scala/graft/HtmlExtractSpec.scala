package graft

import org.apache.spark.sql.functions._
import graft.web.HtmlExtract

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String): (Int, Int, String, Int) =
    HtmlExtract.extract(Seq((1L, html)).toDF("doc_id", "html"),
        col("doc_id"), col("html"))
      .select("n_blocks", "n_kept", "clean_text", "n_clean_chars")
      .as[(Int, Int, String, Int)].head()

  test("script/style CONTENTS are excluded, not just the tags") {
    val (_, kept, text, _) = one(
      "<html><head><script>var password = 'hunter2'; alert(1);</script>" +
        "<style>body { display: none; } .x{}</style></head>" +
        "<body><p>The actual prose of the page body lives here.</p>" +
        "</body></html>")
    assert(kept == 1)
    assert(text == "The actual prose of the page body lives here.")
    assert(!text.contains("hunter2") && !text.contains("display"))
  }

  test("link-farm block is flagged (ppm = 1e6) and dropped; prose with an " +
    "inline link survives with a low score") {
    val df = Seq((1L,
      "<body><p>A long enough paragraph of real content with " +
        "<a href=\"/x\">one inline link</a> inside it.</p>" +
        "<div><a href=\"/1\">home</a> <a href=\"/2\">about</a> " +
        "<a href=\"/3\">contact</a> <a href=\"/4\">login page</a></div>" +
        "</body>")).toDF("doc_id", "html")
    val blocks = HtmlExtract.blocks(df, col("doc_id"), col("html"))
      .orderBy("block_idx")
      .select("text", "link_ppm", "kept")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(blocks.size == 2)
    val (prose, nav) = (blocks.head, blocks(1))
    assert(prose._3 && prose._2 < 500000,
      s"prose block must survive: $prose")
    assert(nav._1 == "home about contact login page")
    assert(nav._2 == 1000000L && !nav._3,
      s"link-farm block must score 1e6 ppm and drop: $nav")
    // the per-doc emit keeps only the prose
    val (nb, nk, text, _) = one(df.select("html").as[String].head() match {
      case h => h })
    assert(nb == 2 && nk == 1 && text.startsWith("A long enough paragraph"))
  }

  test("malformed-tag fuzz: unclosed tags, bare angle brackets, nested " +
    "anchors, truncated comments — deterministic output, never a crash") {
    val nasty = Seq(
      "<p>unclosed paragraph with <b>bold text that just stops",
      "<div><a href='/x'>anchor <a>nested anchor</a> trailing</div>",
      "text with a < dangling bracket and 3 > 2 comparisons in prose",
      "<!-- a comment that never closes <p>swallowed</p>",
      "<p attr=\">\">attribute containing a bracket</p>",
      "<<>><p>>>stray brackets<<</p>",
      "")
    val df = nasty.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "html")
    val rows = HtmlExtract.extract(df, col("doc_id"), col("html"),
        minChars = 5)
      .orderBy("doc_id")
      .select("n_blocks", "n_kept", "clean_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(rows.size == nasty.size)
    // unclosed paragraph: text still extracted
    assert(rows.head._3 == "unclosed paragraph with bold text that just stops")
    // unterminated comment swallows the rest (the (?s).*?--> never matches,
    // so the comment STAYS and its tags strip as tags — deterministic)
    assert(rows(3)._3.nonEmpty)
    // stray-bracket line: no crash, text survives between brackets
    assert(rows(5)._3.contains("stray brackets"))
    // empty html: zero blocks
    assert(rows(6) == ((0, 0, "")))
  }

  test("block segmentation: h1/p/div/li boundaries split; inline b/i/a " +
    "do not; whitespace-only blocks are not blocks") {
    val (nb, nk, text, chars) = one(
      "<body><h1>The headline of the page</h1>" +
        "<p>First paragraph with <b>inline bold</b> kept together.</p>" +
        "<ul><li>a list item long enough to keep</li></ul>" +
        "<p>   </p><div>  \t </div></body>")
    assert(nb == 3, s"expected 3 non-empty blocks, got $nb")
    assert(nk == 3)
    assert(text == "The headline of the page " +
      "First paragraph with inline bold kept together. " +
      "a list item long enough to keep")
    assert(chars == text.length)
  }

  test("minChars gate: short blocks drop even with zero links") {
    val (nb, nk, text, _) = one(
      "<p>tiny</p><p>This block is comfortably past the minimum length.</p>")
    assert(nb == 2 && nk == 1)
    assert(text == "This block is comfortably past the minimum length.")
  }

  private def main(html: String): (Int, Long, Long, String, Int) =
    HtmlExtract.mainContent(Seq((1L, html)).toDF("doc_id", "html"),
        col("doc_id"), col("html"))
      .select("n_blocks", "main_start", "main_blocks", "main_text",
        "n_main_chars")
      .as[(Int, Long, Long, String, Int)].head()

  test("mainContent picks the LARGEST contiguous kept run, not all kept " +
    "blocks: a nav strip splits the page and the bigger prose side wins") {
    val (nb, ms, mb, text, chars) = main(
      "<body><p>Header teaser sentence long enough to keep around.</p>" +
        "<div><a href='/1'>home</a> <a href='/2'>about</a></div>" +
        "<p>Body paragraph one carries the real article prose.</p>" +
        "<p>Body paragraph two continues the very same article.</p>" +
        "<p>Body paragraph three closes out the article body.</p></body>")
    assert(nb == 5)
    // runs: [teaser] (len 1), nav breaks, [body1..body3] (len 3)
    assert(ms == 2L && mb == 3L, s"expected run at 2 len 3, got ($ms,$mb)")
    assert(text == "Body paragraph one carries the real article prose. " +
      "Body paragraph two continues the very same article. " +
      "Body paragraph three closes out the article body.")
    assert(chars == text.length)
    // extract() would have spliced the teaser in — mainContent must not
    assert(!text.contains("teaser"))
  }

  test("mainContent ties go to the EARLIEST run; strict improvement only") {
    val (_, ms, mb, text, _) = main(
      "<body><p>First run paragraph alpha is long enough here.</p>" +
        "<p>First run paragraph beta is also long enough here.</p>" +
        "<div><a href='/x'>nav</a></div>" +
        "<p>Second run paragraph gamma is long enough as well.</p>" +
        "<p>Second run paragraph delta is long enough as well.</p></body>")
    assert(ms == 0L && mb == 2L, s"tie must stay earliest: ($ms,$mb)")
    assert(text.startsWith("First run paragraph alpha"))
  }

  test("mainContent on an all-boilerplate page: zero-length run, empty text") {
    val (nb, ms, mb, text, chars) = main(
      "<body><div><a href='/1'>home</a> <a href='/2'>about</a></div>" +
        "<p>tiny</p></body>")
    assert(nb == 2 && ms == 0L && mb == 0L && text == "" && chars == 0)
  }

  test("mainContent with no break: the whole page is one run") {
    val (nb, ms, mb, text, _) = main(
      "<body><h1>A headline long enough to clear the bar</h1>" +
        "<p>And a paragraph that follows it immediately after.</p></body>")
    assert(nb == 2 && ms == 0L && mb == 2L)
    assert(text.startsWith("A headline") && text.endsWith("after."))
  }

  test("mainContent run indices are over NON-EMPTY blocks (whitespace-only " +
    "blocks are invisible to the run structure)") {
    val (nb, ms, mb, text, _) = main(
      "<body><p>   </p><p>short</p><div>  </div>" +
        "<p>The only substantial paragraph on this entire page.</p></body>")
    // non-empty blocks: [short, substantial]; short breaks, run = [1,1]
    assert(nb == 2 && ms == 1L && mb == 1L)
    assert(text == "The only substantial paragraph on this entire page.")
  }

  test("links: resolution conventions — absolute kept, protocol-relative " +
    "de-slashed, root-relative gets the base host; fragment/mailto/" +
    "javascript/path-relative drop; link_idx runs over KEPT links") {
    val df = Seq((1L,
      "<body><a href=\"https://WWW.Ext.CO.UK/a?utm_source=t&x=1\">abs</a>" +
        "<a href='//cdn.other.org/lib.js'>pr</a>" +
        "<a href=\"/p/2#frag\">root</a>" +
        "<a href=\"#top\">frag</a><a href=\"mailto:a@b.c\">m</a>" +
        "<a href=\"javascript:void(0)\">j</a><a href=\"rel/img.png\">r</a>" +
        "<a name=\"no-href\">skip</a></body>",
      "http://www.base.com/page?q=1")).toDF("doc_id", "html", "base")
    val rows = HtmlExtract.links(df, col("doc_id"), col("html"), col("base"))
      .orderBy("link_idx")
      .select("link_idx", "href", "url", "domain")
      .as[(Int, String, String, String)].collect().toSeq
    assert(rows.map(_._1) == Seq(0, 1, 2))
    assert(rows(0) == ((0, "https://WWW.Ext.CO.UK/a?utm_source=t&x=1",
      "ext.co.uk/a?x=1", "ext.co.uk")))
    assert(rows(1) == ((1, "//cdn.other.org/lib.js",
      "cdn.other.org/lib.js", "other.org")))
    // root-relative resolves against the page's own (www-stripped) host;
    // the fragment is dropped by normalization
    assert(rows(2) == ((2, "/p/2#frag", "base.com/p/2", "base.com")))
  }

  test("links: pages with no resolvable anchor emit nothing; malformed " +
    "quotes extract deterministically") {
    val df = Seq(
      (1L, "<p>No anchors at all, just prose.</p>", "http://a.com"),
      (2L, "<a href=\"rel.html\">only relative</a>", "http://a.com"),
      (3L, "<a href=\"http://x.org/p'>mismatched</a>", "http://a.com"))
      .toDF("doc_id", "html", "base")
    val rows = HtmlExtract.links(df, col("doc_id"), col("html"), col("base"))
      .select("doc_id", "url").as[(Long, String)].collect().toSeq
    // doc 3: the ["'] class closes the value at the single quote —
    // deterministic, same on both engines
    assert(rows == Seq((3L, "x.org/p")))
  }

  test("hostEdges: distinct registrable-domain pairs, self-loops dropped") {
    val df = Seq(
      (1L, "<a href=\"http://b.com/1\">x</a><a href=\"http://b.com/2\">y</a>" +
        "<a href=\"/self\">s</a><a href=\"http://c.co.uk/\">z</a>",
        "http://a.com/p"),
      (2L, "<a href=\"http://b.com/3\">x</a>", "http://a.com/q"))
      .toDF("doc_id", "html", "base")
    val edges = HtmlExtract.hostEdges(df, col("doc_id"), col("html"),
        col("base"))
      .as[(String, String)].collect().toSeq.sorted
    // two pages of a.com both link b.com (deduped); /self is a self-loop
    assert(edges == Seq(("a.com", "b.com"), ("a.com", "c.co.uk")))
  }
}
