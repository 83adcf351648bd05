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
}
