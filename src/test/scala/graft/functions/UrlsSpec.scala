package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL canonicalization rules and the htmlToText strip chain. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalize(col("u"))).head().getString(0)

  test("host case, default port, fragment, tracking params, param sort, trailing slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/One/?utm_source=x&b=2&a=1#frag")
      == "https://www.example.com/Path/One?a=1&b=2")
  }

  test("non-default port and path case survive") {
    assert(canon("http://Api.Example.com:8080/API/v1") ==
      "http://api.example.com:8080/API/v1")
  }

  test(":80 stripped for http; bare root path collapses") {
    assert(canon("http://example.com:80/") == "http://example.com")
    assert(canon("http://example.com/") == "http://example.com")
  }

  test("all params tracking -> no query at all; fbclid/gclid dropped") {
    assert(canon("https://a.com/p?utm_a=1&utm_b=2") == "https://a.com/p")
    assert(canon("https://a.com/p?fbclid=F&gclid=G&keep=1") == "https://a.com/p?keep=1")
  }

  test("idempotent: canonicalizing a canonical url is a no-op") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&b=2&a=1#f",
      "http://Api.Example.com:8080/API/v1?z=1&y=2",
      "https://a.com/p?fbclid=F&keep=1")
    val once = urls.map(canon)
    assert(once.map(canon) == once)
  }

  test("htmlToText: scripts with bare '<' inside, styles, comments, entities") {
    val html = """<html><head><script>if (1 < 2) { x(); }</script>
      |<style>p { color: red }</style><!-- note --></head>
      |<body><h1>Title</h1><p>a &amp;lt; b &amp; c&nbsp;d</p></body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(TextFunctions.htmlToText(col("h"))).head().getString(0)
    // &amp;lt; decodes to the LITERAL "&lt;" (amp decoded last)
    assert(out == "Title a &lt; b & c d")
  }

  test("isoDates: extraction order, no validation, empty case") {
    val out = Seq("from 2021-05-17 to 2023-01-02 (and bogus 9999-99-99, not 21-05-17)")
      .toDF("t").select(TextFunctions.isoDates(col("t"))).head().getSeq[String](0)
    assert(out == Seq("2021-05-17", "2023-01-02", "9999-99-99"))
    val none = Seq("no dates here 123-45").toDF("t")
      .select(TextFunctions.isoDates(col("t"))).head().getSeq[String](0)
    assert(none.isEmpty)
  }

  test("htmlToText: plain text passes through collapsed") {
    val out = Seq("no  markup\n at all").toDF("h")
      .select(TextFunctions.htmlToText(col("h"))).head().getString(0)
    assert(out == "no markup at all")
  }
}
