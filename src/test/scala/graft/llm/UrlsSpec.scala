package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the URL curation family (llm/Urls.scala): host
  * extraction across authority shapes, registered-domain suffix logic,
  * every canonicalization pass, blocklist anti-join, and dedup collapse. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def host1(url: String): String =
    Seq(url).toDF("u").select(Urls.hostOf(col("u"))).as[String].head()

  private def reg1(host: String): String =
    Seq(host).toDF("h").select(Urls.registeredDomain(col("h"))).as[String].head()

  private def canon1(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalizeUrl(col("u"))).as[String].head()

  test("hostOf: case folds, strips userinfo and port, no-authority gives ''") {
    assert(host1("https://WWW.Example.COM/x") === "www.example.com")
    assert(host1("http://user:pw@host.org:8080/p?q#f") === "host.org")
    assert(host1("HTTPS://a.b.c:443") === "a.b.c")
    assert(host1("mailto:someone@example.com") === "") // no scheme://
    assert(host1("/relative/path") === "")
  }

  test("registeredDomain: 2-label default, 3-label under two-level suffix") {
    assert(reg1("news.bbc.co.uk") === "bbc.co.uk")
    assert(reg1("www.example.com") === "example.com")
    assert(reg1("a.b.c.d.example.co.jp") === "example.co.jp")
    assert(reg1("localhost") === "localhost")   // single label passes through
    assert(reg1("co.uk") === "co.uk")           // bare suffix: no 3rd label
    assert(reg1("") === "")
  }

  test("canonicalizeUrl: each pass and their composition") {
    // fragment
    assert(canon1("https://a.com/p#sec") === "https://a.com/p")
    // case-fold scheme+authority only; path/query case preserved
    assert(canon1("HTTPS://A.COM/PaTh?Q=V") === "https://a.com/PaTh?Q=V")
    // default ports drop, explicit ports stay
    assert(canon1("https://a.com:443/p") === "https://a.com/p")
    assert(canon1("http://a.com:80/p") === "http://a.com/p")
    assert(canon1("https://a.com:8080/p") === "https://a.com:8080/p")
    // utm: leading-with-follower, mid, and lone-trailing
    assert(canon1("https://a.com/p?utm_source=x&id=1") === "https://a.com/p?id=1")
    assert(canon1("https://a.com/p?id=1&utm_medium=m") === "https://a.com/p?id=1")
    assert(canon1("https://a.com/p?utm_campaign=c") === "https://a.com/p")
    // one trailing slash
    assert(canon1("https://a.com/p/") === "https://a.com/p")
    // composition: every variant of "the same page" meets at one form
    val variants = Seq(
      "https://a.com/p",
      "HTTPS://A.com/p#frag",
      "https://a.com:443/p",
      "https://a.com/p?utm_source=feed",
      "https://a.com/p/")
    assert(variants.map(canon1).distinct === Seq("https://a.com/p"))
  }

  test("blocklistFilter drops by registered domain, not suffix") {
    val docs = Seq(
      (1L, "https://spam.badsite.net/x"),
      (2L, "https://news.bbc.co.uk/y"),   // co.uk suffix but NOT blocked
      (3L, "https://ok.example.com/z")
    ).toDF("doc_id", "url")
    val kept = Urls.blocklistFilter(docs, col("doc_id"), col("url"),
      Seq("badsite.net")).select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L))
  }

  test("urlDedup collapses canonical variants and keeps lowest id") {
    val docs = Seq(
      (5L, "https://a.com/p?utm_source=x"),
      (2L, "HTTPS://a.com:443/p"),
      (9L, "https://a.com/p#sec"),
      (7L, "https://b.com/q")
    ).toDF("doc_id", "url")
    val out = Urls.urlDedup(docs, col("doc_id"), col("url"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(("https://a.com/p", 2L, 3L), ("https://b.com/q", 7L, 1L)))
  }
}
