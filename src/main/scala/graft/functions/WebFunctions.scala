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
    * noise that makes otherwise-identical pages look distinct. */
  val TrackingParamRe: String =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)="

  /** Canonicalize an absolute URL for dedup keying. Contract (each
    * rule is bound by a fixture in `ta_url_canon`/`dd_url_dedup`):
    *
    *  - scheme and host lowercase; path/query case PRESERVED
    *  - one leading `www.` stripped from the host
    *  - default ports dropped (`:80` for http, `:443` for https);
    *    any other port kept
    *  - fragment (`#...`) dropped
    *  - query split on `&`; empty and [[TrackingParamRe]] params
    *    dropped; the rest sorted bytewise and rejoined (param order
    *    never distinguishes pages); an emptied query drops its `?`
    *  - empty path becomes `/`; trailing slashes stripped from any
    *    non-root path (`/a/b/` keys with `/a/b`)
    *  - anything without a `scheme://` prefix passes through trimmed
    *    (relative links are not crawl keys)
    */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // everything after scheme://, fragment dropped
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)", 1)
    val hostPort = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = regexp_replace(regexp_extract(hostPort, "^([^:]*)", 1), "^www\\.", "")
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(rest, "^[^/?]*(/[^?]*)?", 1)
    val noTrail = regexp_replace(rawPath, "/+$", "")
    val path = when(noTrail === "", lit("/")).otherwise(noTrail)
    val rawQuery = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val query = array_join(kept, "&")
    val queryPart = when(query === "", lit("")).otherwise(concat(lit("?"), query))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** HTML → text, the WET-extraction step before quality/dedup.
    * Deliberately regular (no DOM): drops `<script>`/`<style>`
    * ELEMENTS (tag + content), comments, then every remaining tag
    * (each becomes a space so adjacent text never fuses), decodes
    * the fixed entity set `&lt; &gt; &quot; &apos; &#39; &nbsp;`
    * then `&amp;` LAST — so `&amp;lt;` correctly yields the literal
    * text `&lt;`, never `<` — and collapses whitespace. Entities are
    * decoded AFTER tag stripping, so decoded angle brackets are
    * text, never markup. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ents = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&") // amp LAST: double-escapes stay literal
    val decoded = ents.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(e),
        java.util.regex.Matcher.quoteReplacement(r))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** All double-quoted `href` targets, in document order — feed
    * through [[canonicalizeUrl]] + the dedup family for link-graph
    * work. One codegen regexp scan, no UDF. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1))
}
