package graft

import org.apache.spark.sql.functions._

import graft.operators.Robots

/** RFC 9309 group selection, longest-match precedence, and the gate's
  * default-allow arm.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val txt =
    """# policy
      |User-agent: *
      |Disallow: /a
      |Allow: /a/b
      |
      |User-agent: botA
      |User-agent: botB
      |Disallow: /only-bots
      |Disallow:
      |
      |User-agent: botA
      |Allow: /second-group
      |""".stripMargin

  test("parseRules selects the specific groups, '*' only as fallback") {
    // botA appears in TWO groups — both contribute (and the '*' group
    // does NOT: specific replaces wildcard); empty Disallow is no rule
    assert(Robots.parseRules(txt, "botA").toSet ==
      Set((false, "/only-bots"), (true, "/second-group")))
    assert(Robots.parseRules(txt, "BOTB") == Seq((false, "/only-bots")))
    // unlisted agent falls back to the wildcard group
    assert(Robots.parseRules(txt, "nobody").toSet ==
      Set((false, "/a"), (true, "/a/b")))
    // degenerate inputs
    assert(Robots.parseRules(null, "x").isEmpty)
    assert(Robots.parseRules("", "x").isEmpty)
    assert(Robots.parseRules("Disallow: /orphan-rule\n", "x").isEmpty)
    assert(Robots.parseRules("no colons here\njust text\n", "x").isEmpty)
  }

  test("matches implements RFC 9309 wildcards: mid-path *, trailing $, prefix") {
    // the canonical wildcard shapes (§2.2.3)
    assert(Robots.matches("/index.php", "/*.php$"))
    assert(Robots.matches("/a/b/c.php", "/*.php$"))
    assert(!Robots.matches("/index.php?x=1", "/*.php$")) // $ anchors
    assert(!Robots.matches("/index.phpx", "/*.php$"))
    assert(Robots.matches("/index.php?x=1", "/*.php"))   // unanchored
    // mid-path star spans '/' and can match empty
    assert(Robots.matches("/a/x/y/b", "/a/*b"))
    assert(Robots.matches("/a/b", "/a/*b"))
    assert(!Robots.matches("/a/c", "/a/*b"))
    // plain prefixes are the wildcard-free case
    assert(Robots.matches("/foo/bar", "/foo"))
    assert(!Robots.matches("/fo", "/foo"))
    // $ vs prefix: anchored matches ONLY the exact path
    assert(Robots.matches("/foo", "/foo$"))
    assert(!Robots.matches("/foo/bar", "/foo$"))
    // non-trailing $ is a literal octet; bare * matches everything
    assert(Robots.matches("/a$b/c", "/a$b"))
    assert(Robots.matches("/anything", "*"))
    assert(Robots.matches("", "*$"))
    // backtracking: the matcher must find the LAST viable 'b'
    assert(Robots.matches("/aXbYb", "/a*b$"))
    assert(!Robots.matches("/aXbYc", "/a*b$"))
    // query strings are ordinary octets
    assert(Robots.matches("/page?sid=1", "/*?sid="))
    assert(!Robots.matches("/page?x=1", "/*?sid="))
    // degenerate inputs never throw
    assert(!Robots.matches(null, "/a") && !Robots.matches("/a", null))
  }

  test("gate decides wildcard rules with most-octets precedence") {
    val rules = Seq(
      ("h1", false, "/*.php$"),
      ("h1", true, "/pub*.php$"),   // 10 octets beats 7 → Allow wins
      ("h1", false, "/se*ion"),
      // tie on octet count between a wildcard Disallow and a literal
      // Allow: Allow must win the tie
      ("h1", false, "/t*e"), ("h1", true, "/tie")
    ).toDF("host", "rule_allow", "rule_prefix")
    val urls = Seq(
      (1L, "h1", "/x.php"),        // wildcard disallow
      (2L, "h1", "/pub/a.php"),    // longer wildcard allow wins
      (3L, "h1", "/session/9"),    // mid-path star disallow
      (4L, "h1", "/x.php?q=1"),    // $ saves it: no match → allowed
      (5L, "h1", "/tie")           // octet tie → Allow
    ).toDF("doc_id", "host", "path")
    val out = Robots.gate(urls, rules, "host", "path")
      .orderBy("doc_id")
      .select("doc_id", "allowed", "matched_prefix")
      .as[(Long, Boolean, String)].collect().toSeq
    assert(out == Seq(
      (1L, false, "/*.php$"), (2L, true, "/pub*.php$"),
      (3L, false, "/se*ion"), (4L, true, ""), (5L, true, "/tie")))
  }

  test("gate applies longest match, Allow wins ties, no rule means allowed") {
    val rules = Seq(
      ("h1", false, "/a"), ("h1", true, "/a/b"),
      // exact tie on length: Allow must win
      ("h1", false, "/tie"), ("h1", true, "/tie"),
      ("h2", false, "/")
    ).toDF("host", "rule_allow", "rule_prefix")
    val urls = Seq(
      (1L, "h1", "/a/x"),     // disallowed by /a
      (2L, "h1", "/a/b/x"),   // allowed by longer /a/b
      (3L, "h1", "/tie/x"),   // tie → Allow
      (4L, "h1", "/free"),    // no matching rule → allowed
      (5L, "h2", "/anything"),// blanket disallow
      (6L, "h3", "/x"),       // host with no robots at all → allowed
      (6L, "h3", "/x")        // DUPLICATE row: multiplicity preserved
    ).toDF("doc_id", "host", "path")
    val out = Robots.gate(urls, rules, "host", "path")
      .orderBy("doc_id")
      .select("doc_id", "allowed", "matched_prefix")
      .as[(Long, Boolean, String)].collect().toSeq
    assert(out == Seq(
      (1L, false, "/a"), (2L, true, "/a/b"), (3L, true, "/tie"),
      (4L, true, ""), (5L, false, "/"), (6L, true, ""), (6L, true, "")))
  }

  test("rules seam emits a hosts-sized table and skips null hosts") {
    val robots = Seq(
      (Option("h1"), Option(txt)),
      (Option.empty[String], Option(txt)), // null host skipped
      (Option("h2"), Option.empty[String]) // null txt → no rules
    ).toDF("host", "txt")
    val out = Robots.rules(robots, "host", "txt", "nobody")
      .collect().toSeq
    assert(out.map(_.host).distinct == Seq("h1") && out.size == 2)
  }
}
