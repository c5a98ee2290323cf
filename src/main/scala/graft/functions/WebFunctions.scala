package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus text plumbing: URL canonicalization (the key for
  * crawl-level dedup) and HTML boilerplate stripping / link
  * extraction (WET-style text extraction). Everything here is a
  * chain of built-in codegen expressions (lower / regexp / array
  * ops) — a narrow map-only projection, no UDF, no shuffle — so at
  * 100 TB each costs exactly one whole-stage-codegen pass over the
  * scan. The reference's pipelines move opaque strings (its nodes
  * parse syslog, not HTML); these cover the crawl-ingest surface a
  * training-data pipeline needs in front of the dedup family.
  */
object WebFunctions {

  /** query parameters dropped by [[canonicalizeUrl]]: pure tracking
    * noise that makes otherwise-identical pages look distinct. Only
    * UNAMBIGUOUS tracking keys belong here — a bare `ref` is
    * deliberately NOT listed (on real sites `?ref=<name>` routinely
    * selects content, e.g. VCS branch refs or listing referrers, so
    * dropping it would merge genuinely distinct pages in
    * `dd_url_dedup`); `ref_src` stays (the Twitter-injected referrer
    * tag, never a content selector). */
  val TrackingParamRe: String =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)="

  /** Canonicalize an absolute URL for dedup keying. Contract (each
    * rule is bound by a fixture in `ta_url_canon`/`dd_url_dedup`):
    *
    *  - scheme and host lowercase; path/query case PRESERVED
    *  - userinfo (`user:pass@`) dropped — never a page identity
    *  - IPv6 bracket literals stay whole (`[::1]:8080` splits at the
    *    bracket-closing colon, never inside the address)
    *  - one leading `www.` stripped from the host
    *  - default ports dropped (`:80` for http, `:443` for https);
    *    any other port kept
    *  - fragment (`#...`) dropped
    *  - query split on `&`; empty and [[TrackingParamRe]] params
    *    dropped; the rest sorted bytewise and rejoined (param order
    *    never distinguishes pages); an emptied query drops its `?`
    *  - empty path becomes `/`; trailing slashes stripped from any
    *    non-root path (`/a/b/` keys with `/a/b`)
    *  - percent-escapes normalized per RFC 3986 §6.2.2 BEFORE any
    *    splitting ([[Kernels.percentNormEval]]): unreserved escapes
    *    decode (`%7E`→`~`, `%41`→`A`), all other escapes uppercase
    *    their hex (`%3a`→`%3A`), malformed escapes pass untouched —
    *    decoding only unreserved bytes can never manufacture a
    *    delimiter, so the split rules above see the same structure
    *  - IDN hosts fold to punycode (`java.net.IDN.toASCII`, the
    *    JDK's IDNA tables), so the unicode and punycode spellings of
    *    the same host key IDENTICALLY; already-punycode (`xn--…`)
    *    hosts pass through lowercased unchanged, and a host the
    *    mapping rejects (overlong label, empty label) passes through
    *    untouched — the malformed-escape discipline
    *  - anything without a `scheme://` prefix passes through trimmed
    *    (relative links are not crawl keys), percent-escapes
    *    untouched — a relative fragment is not a key to normalize
    *
    * Implemented as ONE codegen kernel ([[Kernels.canonUrlEval]],
    * `graft_canon_url`) rather than a regex-chain Column: the chain
    * duplicated the url subtree ~25× across `when` branches, which
    * cost ~30 regex evaluations per row AND made any plan nesting it
    * (link-rank's cached iteration frames) pay seconds of driver-side
    * tree canonicalization. The kernel is one expression node and one
    * pass per row; every rule above stays bound by the same fixtures.
    */
  def canonicalizeUrl(url: Column): Column = Kernels.canonUrl(url)

  /** SURT key (Sort-friendly URI Reordering Transform) — the CDX
    * archive-index `urlkey`: [[canonicalizeUrl]] then scheme dropped
    * and host labels reversed comma-joined
    * (`http://news.site3.com/p/5?b=2&a=1` →
    * `com,site3,news)/p/5?a=1&b=2`), so one domain family's pages
    * sort CONTIGUOUSLY — the right range-partition/dedup key for
    * archive indexes ([[graft.operators.Multimodal.warcCdx]]). One
    * codegen kernel ([[Kernels.surtKeyEval]], `graft_surt_key`);
    * contract corners (ports, IPv6, non-absolute passthrough) on the
    * kernel scaladoc, bound by `ta_warc_cdx` + WebFunctionsSpec. */
  def surtKey(url: Column): Column = Kernels.surtKey(url)

  /** host of an absolute URL — no port, no userinfo, IPv6 brackets
    * kept whole, LOWERCASED (hosts are case-insensitive per RFC 3986
    * §3.2.2, so raw uncanonicalized inputs can't case-split graph
    * nodes); "" for non-absolute inputs. The node key for
    * host-graph work ([[graft.operators.LinkRank]]): link edges
    * aggregate at host granularity, never page granularity. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?(\\[[^\\]]*\\]|[^:/?#]*)", 1))

  /** script/style ELEMENTS (tag + content) and comments → spaces. */
  private def dropNonContent(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** the fixed entity set, `&amp;` LAST so double-escapes stay
    * literal (`&amp;lt;` yields the text `&lt;`, never `<`). */
  private def decodeEntities(c: Column): Column = {
    val ents = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&")
    ents.foldLeft(c) { case (acc, (e, r)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(e),
        java.util.regex.Matcher.quoteReplacement(r))
    }
  }

  /** tags → spaces (adjacent text never fuses), entities, collapse. */
  private def tagsToText(c: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(c, "<[^>]*>", " ")), "\\s+", " "))

  /** words of an already-collapsed text fragment. */
  private def wordCount(t: Column): Column =
    size(filter(split(t, " "), w => w =!= ""))

  /** HTML → text, the WET-extraction step before quality/dedup.
    * Deliberately regular (no DOM): drops `<script>`/`<style>`
    * elements and comments, then every remaining tag (each becomes a
    * space), decodes the fixed entity set, and collapses whitespace.
    * Entities are decoded AFTER tag stripping, so decoded angle
    * brackets are text, never markup. */
  def htmlToText(html: Column): Column = tagsToText(dropNonContent(html))

  /** block-level boundary tags for [[mainContent]] — a regular
    * approximation of "rendered block": inline markup (`<a>`,
    * `<span>`, `<b>`, …) stays inside its block. */
  private val BlockTagRe: String =
    "(?i)</?(?:p|div|section|article|main|aside|header|footer|nav|table|thead|tbody" +
      "|tr|td|th|ul|ol|li|h[1-6]|blockquote|br|hr|body|html|head|title)\\b[^>]*>"

  /** MAIN-CONTENT extraction — boilerplate removal, the curation
    * step between WET extraction and quality scoring. Splits the
    * cleaned document into blocks at [[BlockTagRe]] boundaries and
    * keeps a block only when it reads like prose rather than chrome:
    *
    *  - at least `minWords` words (drops titles, buttons, crumbs)
    *  - anchor-text words at most `maxLinkDensityPct`% of the
    *    block's words (drops nav bars, link farms, footers — the
    *    signal behind jusText/boilerpipe-style extractors), as an
    *    integer cross-multiplication
    *
    * Kept blocks' text joins with single spaces. Still one codegen
    * projection: split + higher-order array ops over built-ins, no
    * UDF, no shuffle — at 100 TB it rides the same fused pass as
    * [[htmlToText]]. */
  def mainContent(html: Column, minWords: Int = 5,
                  maxLinkDensityPct: Int = 50): Column = {
    val blocks = split(dropNonContent(html), BlockTagRe)
    val anchorRe = lit("(?is)<a\\b[^>]*>(.*?)</a>")
    // two transforms so the tag-strip/entity regex chain runs ONCE
    // per block (HOF lambdas get no subexpression elimination)
    val texts = transform(blocks, b => struct(
      tagsToText(b).as("t"),
      aggregate(regexp_extract_all(b, anchorRe, lit(1)), lit(0),
        (acc, a) => acc + wordCount(tagsToText(a))).as("lw")))
    val scored = transform(texts, s => struct(
      s.getField("t").as("t"),
      wordCount(s.getField("t")).as("w"),
      s.getField("lw").as("lw")))
    val kept = filter(scored, s =>
      s.getField("w") >= minWords &&
        s.getField("lw") * 100 <= s.getField("w") * maxLinkDensityPct)
    trim(array_join(transform(kept, s => s.getField("t")), " "))
  }

  /** All double-quoted `href` targets, in document order — feed
    * through [[canonicalizeUrl]] + the dedup family for link-graph
    * work. One codegen regexp scan, no UDF. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1))

  /** `<a>` anchors WITH their link text, in document order — the
    * WAT-style link-metadata surface: anchor text is the
    * ranking/topic signal the bare href list loses (what a page's
    * INBOUND links call it describes it better than its own title).
    * Each element is a struct (url, text): the href target and the
    * anchor's inner text after the same tag-strip/entity-decode/
    * whitespace-collapse as [[htmlToText]]. Deliberately regular
    * like the rest of this file (non-greedy to the nearest `</a>`,
    * nested anchors out of scope); href-less or single-quoted
    * anchors don't match. One codegen regexp scan + array
    * transforms, no UDF, no shuffle. */
  def extractAnchors(html: Column): Column = {
    val re = lit("(?is)<a\\b[^>]*href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>")
    val urls = regexp_extract_all(html, re, lit(1))
    val texts = transform(regexp_extract_all(html, re, lit(2)), t => tagsToText(t))
    arrays_zip(urls.as("url"), texts.as("text"))
  }

  /** Sitemap (sitemaps.org XML) entries — the crawl frontier's seed
    * surface: array of structs `(loc, lastmod, priority, is_index)`.
    * Both document kinds parse from one call: a `urlset`'s `<url>`
    * entries carry page URLs; a `sitemapindex`'s `<sitemap>` entries
    * (marked `is_index`) carry FURTHER sitemaps to fetch — the
    * frontier fan-out. `loc` is entity-decoded (the spec REQUIRES
    * escaping `&` in URLs, so `&amp;` must come back as `&` before
    * canonicalization); `lastmod`/`priority` are "" when absent.
    * Entries without a `<loc>` drop (malformed blocks, never empty
    * seeds). Deliberately regular like the rest of this file
    * (non-greedy to the nearest close tag; `<url\b` does NOT match
    * `<urlset` — word boundary); one codegen regexp scan per kind +
    * array transforms, no UDF, no shuffle. */
  def extractSitemap(xml: Column): Column = {
    def entries(tag: String, isIndex: Boolean): Column = {
      val blocks = regexp_extract_all(xml,
        lit(s"(?is)<$tag\\b[^>]*>(.*?)</$tag>"), lit(1))
      val made = transform(blocks, b => struct(
        decodeEntities(trim(regexp_extract(b, "(?is)<loc\\s*>(.*?)</loc>", 1))).as("loc"),
        trim(regexp_extract(b, "(?is)<lastmod\\s*>(.*?)</lastmod>", 1)).as("lastmod"),
        trim(regexp_extract(b, "(?is)<priority\\s*>(.*?)</priority>", 1)).as("priority"),
        lit(isIndex).as("is_index")))
      filter(made, s => s.getField("loc") =!= "")
    }
    concat(entries("url", isIndex = false), entries("sitemap", isIndex = true))
  }
}
