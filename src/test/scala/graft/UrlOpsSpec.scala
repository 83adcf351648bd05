package graft

import org.apache.spark.sql.functions._
import graft.web.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[(String, String)] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("id", "url")
    df.select(col("id"), UrlOps.normalizeUrl(col("url")).as("n"),
        UrlOps.registrableDomain(col("url")).as("d"))
      .orderBy("id").collect()
      .map(r => (r.getAs[String]("n"), r.getAs[String]("d"))).toSeq
  }

  test("normalizeUrl: scheme/www/tracking stripped, real params + order kept") {
    assert(norm("https://WWW.Example.COM/a/b?utm_source=x&q=1&ref=y&z=2") ==
      Seq(("example.com/a/b?q=1&z=2", "example.com")))
    // scheme variants and bare http dedup to the same canonical form
    assert(norm("http://example.com/a", "https://www.example.com/a")
      .map(_._1).distinct == Seq("example.com/a"))
    // all params tracking -> no '?' at all; fragment dropped with the query
    assert(norm("https://site.org/p?utm_a=1&utm_b=2&fbclid=z") ==
      Seq(("site.org/p", "site.org")))
    // param order is preserved, not sorted (genuinely different URLs stay distinct)
    assert(norm("https://site.org/p?b=2&a=1").head._1 == "site.org/p?b=2&a=1")
    // no query, no path
    assert(norm("https://www.site.org").head._1 == "site.org")
  }

  test("registrableDomain: eTLD+1 with two-level suffix branch") {
    assert(norm("https://a.b.site.co.uk/x").head._2 == "site.co.uk")
    assert(norm("https://deep.sub.example.net/x").head._2 == "example.net")
    // exactly a two-label host is its own registrable domain
    assert(norm("http://co.uk/x").head._2 == "co.uk")
    // www is not part of the domain
    assert(norm("https://www.site.co.jp/x").head._2 == "site.co.jp")
    // custom suffix set
    val df = Seq((1, "https://x.y.custom.tld/p")).toDF("id", "url")
    val d = df.select(UrlOps.registrableDomain(col("url"),
      twoLevelSuffixes = Seq("custom.tld")).as("d")).collect().head.getString(0)
    assert(d == "y.custom.tld")
  }
}
