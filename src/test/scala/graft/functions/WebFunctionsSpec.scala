package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins every rule of the [[WebFunctions.canonicalizeUrl]] contract
  * and the [[WebFunctions.htmlToText]] stripping order on handcrafted
  * edge cases (the corpus-facing oracles in TrainingOps re-derive the
  * bulk behavior; this suite holds the corners fixtures can't reach).
  */
class WebFunctionsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(WebFunctions.canonicalizeUrl(col("u"))).as[String]
      .collect().toSeq
  }

  private def text(htmls: String*): Seq[String] = {
    import spark.implicits._
    htmls.toDF("h").select(WebFunctions.htmlToText(col("h"))).as[String]
      .collect().toSeq
  }

  test("scheme/host lowercase, www strip, path case preserved") {
    assert(canon("HTTPS://WWW.ExAmple.COM/Path/File") ==
      Seq("https://example.com/Path/File"))
  }

  test("default ports drop per scheme; non-default and cross-scheme ports keep") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:443/x", "https://a.com:8443/x", "ftp://a.com:21/x") ==
      Seq("http://a.com/x", "https://a.com/x",
        "http://a.com:443/x", "https://a.com:8443/x", "ftp://a.com:21/x"))
  }

  test("fragment drops, empty path roots, trailing slashes strip (root survives)") {
    assert(canon(
      "http://a.com#frag", "http://a.com/", "http://a.com/a/b/",
      "http://a.com/a//", "http://a.com///", "http://a.com/x?q=1#frag") ==
      Seq("http://a.com/", "http://a.com/", "http://a.com/a/b",
        "http://a.com/a", "http://a.com/", "http://a.com/x?q=1"))
  }

  test("query: tracking params drop, survivors sort, emptied query loses its ?") {
    assert(canon(
      "http://a.com/x?b=2&a=1",
      "http://a.com/x?utm_source=f&b=2&utm_campaign=c&a=1",
      "http://a.com/x?utm_source=f&fbclid=z&gclid=g",
      "http://a.com/x?",
      "http://a.com/x?a=1&&b=2",
      "http://a.com/x?ref=h&refresh=1&ref_src=twsrc") ==
      Seq("http://a.com/x?a=1&b=2", "http://a.com/x?a=1&b=2",
        "http://a.com/x", "http://a.com/x", "http://a.com/x?a=1&b=2",
        // `ref` is a CONTENT param on real sites (branch/listing
        // refs) and survives; `ref_src` is unambiguous tracking
        "http://a.com/x?ref=h&refresh=1"))
  }

  test("authority: userinfo drops, IPv6 brackets stay whole, bracket-port splits correctly") {
    assert(canon(
      "http://admin:pw@Site1.com/login", "http://user@a.com:80/x",
      "http://[2001:db8::1]:8080/x", "https://[::1]:443/x", "http://[::1]/x") ==
      Seq("http://site1.com/login", "http://a.com/x",
        "http://[2001:db8::1]:8080/x", "https://[::1]/x", "http://[::1]/x"))
  }

  test("percent-normalization: unreserved decode, reserved uppercase, malformed untouched") {
    assert(canon(
      "http://a.com/%7Euser",            // %7E is unreserved '~' -> decodes
      "http://a.com/%41%62c%2D%2e%5F",   // A b c - . _ all decode
      "http://a.com/a%2fb%3dc?x=%3a%2F", // reserved: bytes kept, hex uppercased
      "http://a.com/p%zz/q%4",           // malformed escapes untouched
      "http://a.com/%64oc?b=%7E2&a=1",   // escapes normalize BEFORE param sort
      "HTTP://%41.com/x") ==             // escapes in host decode then lowercase
      Seq("http://a.com/~user",
        "http://a.com/Abc-._",
        "http://a.com/a%2Fb%3Dc?x=%3A%2F",
        "http://a.com/p%zz/q%4",
        "http://a.com/doc?a=1&b=~2",
        "http://a.com/x"))
  }

  test("IDN hosts fold to punycode; punycode spellings pass through lowercased") {
    assert(canon(
      "http://XN--BCHER-KVA.example/p", // already punycode: lowercase only
      "http://Bücher.example/p",        // unicode folds to the SAME key
      "http://héllo-wörld.test/x",      // multi-label unicode
      "https://bücher.example:8443/x",  // fold composes with port rules
      "http://www.bücher.example/x") == // fold composes with www strip
      Seq("http://xn--bcher-kva.example/p",
        "http://xn--bcher-kva.example/p",
        "http://xn--hllo-wrld-b4a2m.test/x",
        "https://xn--bcher-kva.example:8443/x",
        "http://xn--bcher-kva.example/x"))
  }

  test("IDN: a host the IDNA mapping rejects passes through untouched") {
    // 60 'ü's encode past the 63-octet label bound → IDN.toASCII
    // throws → the malformed-escape discipline: keep the spelling
    val big = "ü" * 60
    assert(canon(s"http://$big.example/p") == Seq(s"http://$big.example/p"))
  }

  test("surtKey: canonicalizes then reverses host labels; ports keep, IPv6 stays whole") {
    import spark.implicits._
    def surt(urls: String*): Seq[String] =
      urls.toDF("u").select(WebFunctions.surtKey(col("u"))).as[String].collect().toSeq
    assert(surt(
      "http://news.site3.com/p/5?b=2&a=1",    // reversal + canonical query sort
      "HTTP://WWW.Site3.COM:80/p/5/?utm_source=x", // canon first: www/port/slash/tracking
      "https://a.example.org:8443/x",          // non-default port keeps, after the host
      "http://[2001:db8::1]:8080/x",           // IPv6: positional, never reversed
      "http://bücher.example/p",               // IDN folds, THEN reverses
      "/relative/path", "just text ://x") ==   // non-absolute passthrough
      Seq("com,site3,news)/p/5?a=1&b=2",
        "com,site3)/p/5",
        "org,example,a:8443)/x",
        "[2001:db8::1]:8080)/x",
        "example,xn--bcher-kva)/p",
        "/relative/path", "just text ://x"))
  }

  test("hostOf: lowercases raw hosts, drops port/userinfo, keeps IPv6 brackets") {
    import spark.implicits._
    val hosts = Seq("http://Host.COM:8080/x", "https://u:p@Site.example/y",
      "http://[2001:DB8::1]:80/z", "not a url")
      .toDF("u").select(WebFunctions.hostOf(col("u"))).as[String].collect().toSeq
    assert(hosts == Seq("host.com", "site.example", "[2001:db8::1]", ""))
  }

  test("non-absolute inputs pass through trimmed") {
    assert(canon("  /relative/path?a=1  ", "mailto:x@y.z", "just text") ==
      Seq("/relative/path?a=1", "mailto:x@y.z", "just text"))
  }

  test("RFC-invalid multi-colon authority passes through WHOLE, never splices") {
    assert(canon(
      "http://h:1:2/p?b=2&a=1",      // >1 colon outside brackets: invalid authority
      "http://2001:db8::1/x",        // unbracketed IPv6 is the same malformation
      "http://u:p@h:1:2/x",          // userinfo colons drop FIRST; authority still invalid
      "http://u:p@h:8080/x") ==      // userinfo colon alone is fine — normal split
      Seq("http://h:1:2/p?b=2&a=1",
        "http://2001:db8::1/x",
        "http://u:p@h:1:2/x",
        "http://h:8080/x"))
  }

  test("html: script/style elements drop whole, tags become spaces, text never fuses") {
    assert(text(
      "<p>a</p><p>b</p>",
      "x<script type=\"a\">var s='<p>keep out</p>';</script>y",
      "x<style media=\"s\">p{color:red}</style>y",
      "a<!-- <b>gone</b> -->c") ==
      Seq("a b", "x y", "x y", "a c"))
  }

  test("html: fixed entity set decodes after tags; &amp; last keeps double-escapes literal") {
    assert(text(
      "Fish &amp; Chips &lt;deal&gt;&nbsp;now &#39;hot&#39; &quot;q&quot; &apos;s&apos;",
      "&amp;lt;not-a-tag&amp;gt;",
      "&lt;b&gt;not bold&lt;/b&gt;") ==
      Seq("Fish & Chips <deal> now 'hot' \"q\" 's'",
        "&lt;not-a-tag&gt;",
        "<b>not bold</b>"))
  }

  test("html: whitespace (incl newlines/tabs) collapses; case-insensitive script close") {
    assert(text("  a \n\t b  <SCRIPT>x</ScRiPt>  c ") == Seq("a b c"))
  }

  private def main(htmls: String*): Seq[String] = {
    import spark.implicits._
    htmls.toDF("h").select(WebFunctions.mainContent(col("h"))).as[String]
      .collect().toSeq
  }

  test("mainContent: link-dense nav blocks drop, prose blocks survive") {
    val page = "<html><body>" +
      "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About us</a> " +
      "<a href=\"/c\">Contact sales team</a></div>" +
      "<p>this paragraph has plenty of ordinary prose words to keep</p>" +
      "<div class=\"footer\"><a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a> " +
      "<a href=\"/s\">Sitemap links here</a></div>" +
      "</body></html>"
    assert(main(page) ==
      Seq("this paragraph has plenty of ordinary prose words to keep"))
  }

  test("mainContent: short blocks (titles, buttons) drop on minWords") {
    val page = "<html><head><title>Site</title></head><body>" +
      "<h1>Short header</h1>" +
      "<p>one two three four five six</p></body></html>"
    assert(main(page) == Seq("one two three four five six"))
  }

  test("mainContent: density boundary is an exact integer rule (<=50%)") {
    // 3 of 6 words inside the anchor = exactly 50% → kept
    val ok = "<p>alpha beta gamma <a href=\"/\">one two three</a></p>"
    // 4 of 7 words inside anchors = 57% → dropped
    val over = "<p>alpha beta gamma <a href=\"/\">one two three four</a></p>"
    assert(main(ok) == Seq("alpha beta gamma one two three"))
    assert(main(over) == Seq(""))
  }

  test("mainContent: kept blocks join in order; inline markup and entities resolve") {
    val page = "<body><p>first block with <b>bold</b> prose inside it</p>" +
      "<p>second block talks about Fish &amp; Chips all day</p></body>"
    assert(main(page) == Seq(
      "first block with bold prose inside it second block talks about Fish & Chips all day"))
  }

  test("extractLinks: double-quoted hrefs in order, any attr case/spacing") {
    import spark.implicits._
    val links = Seq(
      "<a HREF=\"http://a.com/1\">x</a><area href = \"/rel\" /><a href=\"/2\">e</a>")
      .toDF("h").select(WebFunctions.extractLinks(col("h"))).as[Seq[String]]
      .collect().head
    assert(links == Seq("http://a.com/1", "/rel", "/2"))
  }

  test("extractAnchors: href + anchor text pairs; inner markup strips, entities decode") {
    import spark.implicits._
    val anchors = Seq(
      "<a href=\"/1\"><b>Bold</b> link</a> filler " +
        "<a class=\"x\" href=\"/2\">Fish &amp; Chips</a>" +
        "<area href=\"/not-an-anchor\"/>" +          // area: extractLinks-only
        "<a href=\"/3\"></a>")                        // empty anchor text
      .toDF("h").select(WebFunctions.extractAnchors(col("h")))
      .as[Seq[(String, String)]].collect().head
    assert(anchors == Seq("/1" -> "Bold link", "/2" -> "Fish & Chips", "/3" -> ""))
  }

  test("extractSitemap: urlset entries with escaped locs; loc-less blocks drop; boundary skips <urlset") {
    import spark.implicits._
    val xml = """<?xml version="1.0"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      | <url><loc> http://a.com/p?x=1&amp;y=2 </loc>
      |   <lastmod>2024-03-01</lastmod><priority>0.8</priority></url>
      | <URL><LOC>http://a.com/q</LOC></URL>
      | <url><lastmod>2024-01-01</lastmod></url>
      |</urlset>""".stripMargin
    val got = Seq(xml).toDF("x").select(WebFunctions.extractSitemap(col("x")))
      .as[Seq[(String, String, String, Boolean)]].collect().head
    assert(got == Seq(
      ("http://a.com/p?x=1&y=2", "2024-03-01", "0.8", false), // loc trimmed + & decoded
      ("http://a.com/q", "", "", false)))                     // tag case-insensitive; absentees ""
  }

  test("extractSitemap: sitemapindex entries surface is_index; both kinds in one call") {
    import spark.implicits._
    val xml = """<sitemapindex>
      | <sitemap><loc>http://a.com/s1.xml.gz</loc><lastmod>2024-02-01</lastmod></sitemap>
      | <sitemap><loc>http://a.com/s2.xml.gz</loc></sitemap>
      |</sitemapindex>""".stripMargin
    val got = Seq(xml).toDF("x").select(WebFunctions.extractSitemap(col("x")))
      .as[Seq[(String, String, String, Boolean)]].collect().head
    assert(got == Seq(
      ("http://a.com/s1.xml.gz", "2024-02-01", "", true),
      ("http://a.com/s2.xml.gz", "", "", true)))
    // non-sitemap XML (or prose) yields an empty array, never a row
    val none = Seq("<html><body>not a sitemap</body></html>").toDF("x")
      .select(WebFunctions.extractSitemap(col("x")))
      .as[Seq[(String, String, String, Boolean)]].collect().head
    assert(none.isEmpty)
  }
}
