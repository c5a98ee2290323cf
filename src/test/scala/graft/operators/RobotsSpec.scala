package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the RFC 9309 contract: group assembly, agent selection
  * (longest prefix wins, `*` only as fallback, same-winner merge),
  * pattern semantics (`*` runs, final `$` anchor, prefix octets),
  * and the longest-match / tie-goes-to-allow decision.
  */
class RobotsSpec extends AnyFunSuite {

  private val body =
    """# global policy
      |User-agent: evilbot
      |Disallow: /
      |
      |User-agent: graftbot
      |Allow: /p/ok
      |Disallow: /p/
      |Disallow: /*.json$
      |Sitemap: https://a.com/sitemap.xml
      |Disallow: /tmp/
      |
      |User-agent: *
      |Disallow: /private/
      |""".stripMargin

  test("agent selection: named prefix beats *, * is the fallback, unknown agent uses *") {
    assert(!Robots.isAllowed(body, "evilbot", "/anything"))
    assert(Robots.isAllowed(body, "graftbot", "/private/x")) // * group NOT merged in
    assert(!Robots.isAllowed(body, "otherbot", "/private/x")) // falls back to *
    assert(Robots.isAllowed(body, "otherbot", "/p/x")) // * group has no /p/ rule
    // product-token prefix match is case-insensitive
    assert(!Robots.isAllowed(body, "GraftBot/1.2", "/p/x"))
  }

  test("longest-match decides; Allow wins the exact tie") {
    assert(!Robots.isAllowed(body, "graftbot", "/p/x")) // /p/ disallow
    assert(Robots.isAllowed(body, "graftbot", "/p/okfile")) // longer allow
    val tie = "User-agent: a\nAllow: /dir\nDisallow: /dir\n"
    assert(Robots.isAllowed(tie, "a", "/dir/x")) // equal length → allow
  }

  test("wildcards: * spans runs, final $ anchors, prefix semantics hold") {
    assert(!Robots.isAllowed(body, "graftbot", "/data/file.json")) // /*.json$
    assert(Robots.isAllowed(body, "graftbot", "/data/file.jsonx")) // $ fails
    assert(!Robots.isAllowed(body, "graftbot", "/a/b/c.json"))
    assert(!Robots.isAllowed(body, "graftbot", "/tmp/session")) // rule AFTER Sitemap still in group
    val pat = "User-agent: a\nDisallow: /a/*/c\n"
    assert(!Robots.isAllowed(pat, "a", "/a/b/c"))
    assert(!Robots.isAllowed(pat, "a", "/a/x/y/cde")) // prefix match past the pattern
    assert(Robots.isAllowed(pat, "a", "/a/bc"))
  }

  test("group assembly: consecutive User-agent lines share rules; merge on same winner") {
    val multi =
      "User-agent: one\nUser-agent: two\nDisallow: /x/\n" +
        "User-agent: two\nDisallow: /y/\n"
    assert(!Robots.isAllowed(multi, "one", "/x/1"))
    assert(Robots.isAllowed(multi, "one", "/y/1"))
    assert(!Robots.isAllowed(multi, "two", "/x/1")) // both 'two' groups merge
    assert(!Robots.isAllowed(multi, "two", "/y/1"))
  }

  test("a non-rule field between User-agent lines neither splits the run nor drops rules") {
    // RFC 9309 §2.2.4: other records are ignored-as-absent — 'a' and
    // 'b' still share the group and its Disallow
    val split = "User-agent: a\nSitemap: https://x/s.xml\nUser-agent: b\nDisallow: /\n"
    assert(!Robots.isAllowed(split, "a", "/anything"))
    assert(!Robots.isAllowed(split, "b", "/anything"))
  }

  test("an empty User-agent value is not a token and cannot shadow the * group") {
    val b2 = "User-agent:\nAllow: /x\n\nUser-agent: *\nDisallow: /\n"
    assert(!Robots.isAllowed(b2, "anybot", "/x/1")) // * group governs
  }

  test("empty values, comments, and junk lines are inert; no rules → allowed") {
    val b2 = "User-agent: a # trailing comment\nDisallow:\nDisallow: /real/\nnot a field line\n"
    assert(Robots.isAllowed(b2, "a", "/anything")) // empty Disallow = no rule
    assert(!Robots.isAllowed(b2, "a", "/real/x"))
    assert(Robots.isAllowed("", "a", "/x"))
    assert(Robots.isAllowed("Disallow: /orphan/", "a", "/orphan/x")) // rule outside any group
  }

  test("caps bound adversarial bodies") {
    val many = "User-agent: a\n" + (0 until 3000).map(i => s"Disallow: /p$i/").mkString("\n")
    val rules = Robots.rulesFor(many, "a")
    assert(rules.length == Robots.MaxRules)
    val huge = "User-agent: a\nDisallow: /x/\n" + ("#" + "y" * 1000 + "\n") * 1000
    assert(!Robots.isAllowed(huge, "a", "/x/1")) // truncation keeps the parsed head
  }

  test("body cap drops the trailing partial line — a cut rule never parses broadened") {
    // arrange the cap to land mid-rule, right after 'Disallow: /x':
    // a raw substring cut would parse the broader pattern '/x'
    val head = "User-agent: a\nDisallow: /y/\n"
    val fill = "#" + "f" * (Robots.MaxBodyChars - head.length - 2 - 12) + "\n"
    val body = head + fill + "Disallow: /x-longer-path\n"
    assert(body.substring(0, Robots.MaxBodyChars).endsWith("Disallow: /x"))
    assert(Robots.isAllowed(body, "a", "/x/anything")) // partial rule dropped
    assert(!Robots.isAllowed(body, "a", "/y/1")) // complete rules before the cap survive
  }

  test("memoized kernel path equals the direct path") {
    for (p <- Seq("/p/x", "/p/okz", "/data/a.json", "/private/q", "/free"))
      assert(Robots.isAllowedCached(body, "graftbot", p) ==
        Robots.isAllowed(body, "graftbot", p))
  }
}
