package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and host derivation — the identity layer of a
  * web-scrape pipeline (RefinedWeb §3.1 filters and dedups by URL
  * before any byte of text is read; CCNet buckets by domain). Two
  * scrapes of one page differ in scheme case, host case, a `www.`
  * prefix, a default port, tracking parameters, a fragment, or a
  * trailing slash — canonicalizing first makes URL-exact dedup and
  * per-host statistics see one key per page.
  *
  * Everything here is a pure `Column` expression chain (codegen'd
  * regexp/array built-ins — no UDF, no parser object per row), so it
  * runs scan-bound inside whole-stage codegen and is streaming-legal.
  * Patterns are RE2-compatible (explicit classes, no lookaround) so a
  * DuckDB oracle replays them verbatim — the q148 convention.
  *
  * Deliberately NOT a full RFC 3986 resolver: no percent-decoding
  * (decoding changes equivalence classes and can merge distinct
  * resources), no param re-ordering (order is semantic for some
  * sites), no IDN/punycode. Those are policy choices a caller layers
  * on top; this is the safe common core.
  */
object Urls {

  /** Query parameters stripped by [[normalize]]: cross-site click and
    * campaign trackers that never change the resource — the standard
    * strip set (utm_* per Google's own docs, plus the big ad-click
    * ids). Matched against the full `name=value` pair, anchored.
    * Deliberately NOT in the set: `ref` — despite appearing in many
    * strip lists it is a semantic selector on major sites (a VCS
    * branch in `?ref=main`, a pagination anchor), and merging those
    * keys would dedup genuinely different pages.
    */
  val TrackingParams = "(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid)(=[^&]*)?"

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val AuthorityRe = SchemeRe + "([^/?#]*)"
  private val PathRe = AuthorityRe + "([^?#]*)"

  /** Lowercased scheme, or '' for scheme-less strings (which
    * [[normalize]] passes through unchanged — protocol-relative and
    * relative references have no canonical absolute form without a
    * base URL).
    */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Canonical host: lowercased authority minus userinfo, port, one
    * leading `www.`, and a trailing root dot (`example.com.` is valid
    * DNS but would otherwise split its labels as ['example','com','']
    * and collapse [[registrableDomain]] to the bare suffix). ('' when
    * the URL has no `://` authority.)
    */
  def host(url: Column): Column = {
    val auth = lower(regexp_extract(url, AuthorityRe, 2))
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    val noPort = regexp_replace(noUser, ":[0-9]*$", "")
    regexp_replace(regexp_replace(noPort, "\\.$", ""), "^www\\.", "")
  }

  /** Registrable domain of a canonical host: the last two labels, or
    * three when the second-level label is a well-known country-code
    * registry suffix (`co.uk`, `com.au`, …). A full public-suffix-list
    * resolution swaps in at the same seam; the short list covers the
    * overwhelming share of a web corpus and keeps the expression
    * closed-form. IPs and single-label hosts pass through whole.
    */
  def registrableDomain(hostCol: Column): Column = {
    val ls = split(hostCol, "\\.")
    val n = size(ls)
    val last2 = concat_ws(".", element_at(ls, -2), element_at(ls, -1))
    val last3 = concat_ws(".", element_at(ls, -3), element_at(ls, -2),
      element_at(ls, -1))
    val ccSld = element_at(ls, -2).isin("co", "com", "org", "net", "ac",
      "gov", "edu") &&
      length(element_at(ls, -1)) === 2
    when(hostCol.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"), hostCol)
      .when(n <= 2, hostCol)
      .when(ccSld, last3)
      .otherwise(last2)
  }

  /** All double-quoted `<a href="…">` targets in document order — the
    * web-graph edge extractor ([[Graph.pageRank]] consumes hosts of
    * these; [[graft.operators.Scrub.htmlToText]] deliberately DROPS
    * them, so link structure must be pulled before text extraction).
    * One codegen `regexp_extract_all` — RE2-portable, no parser.
    * Single-quoted and unquoted href values are NOT matched — a
    * documented subset (the fixture convention), not an oversight.
    */
  def extractHrefs(html: Column): Column =
    // the tag name must END at `a` (optional attribute run, then
    // whitespace immediately before href): `<area>`/`<audio>`/custom
    // `<a-*>` elements and `data-href` attributes must not match
    regexp_extract_all(html,
      lit("(?i)<a(?:\\s[^>]*)?\\shref=\"([^\"]*)\""), lit(1))

  /** All `<loc>` entries of a sitemap (or sitemap-index) XML document,
    * in order — the URL-discovery counterpart of [[extractHrefs]]
    * (robots.txt points crawlers at sitemaps; sitemaps enumerate the
    * URLs). Sitemap files are machine-generated flat XML, so one
    * `regexp_extract_all` with whitespace-tolerant tags suffices; the
    * five XML entities the protocol REQUIRES escaping in URLs are
    * decoded, `&amp;` last (the q148 single-decode discipline).
    */
  def extractSitemapLocs(xml: Column): Column =
    transform(
      regexp_extract_all(xml,
        lit("(?is)<loc\\s*>\\s*(.*?)\\s*</loc\\s*>"), lit(1)),
      u => Scrub.decodeEntities(u, Seq("&apos;" -> "'")))

  /** Canonical URL: lowercased scheme and host, `www.` and default
    * port stripped, tracking parameters removed (order of the
    * survivors preserved), fragment dropped, trailing path slash
    * trimmed. Scheme-less inputs pass through unchanged. Userinfo is
    * REMOVED (it is never part of page identity and frequently a
    * credential — carrying it into a dedup key would persist it).
    */
  def normalize(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val rawPath = regexp_extract(url, PathRe, 3)
    val path = regexp_replace(rawPath, "/+$", "")
    // the FIRST '?' before any '#' starts the query (RFC 3986): the
    // prefix class excludes '?' itself, or a greedy run would backtrack
    // to the LAST '?' and silently drop the params before it; a '?'
    // first appearing inside the fragment is fragment text, not a query
    val rawQuery = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val keptParams = filter(split(rawQuery, "&"),
      p => !p.rlike("^" + TrackingParams + "$") && p =!= "")
    val query = array_join(keptParams, "&")
    // port comes off the authority AFTER userinfo removal — a ':' in
    // userinfo must not hide (or fake) a port
    val auth = regexp_extract(url, AuthorityRe, 2)
    val port = regexp_extract(
      regexp_replace(auth, "^[^@]*@", ""), ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(sch === "http" && port === "80") &&
      !(sch === "https" && port === "443")
    when(sch === "", url).otherwise(concat(
      sch, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit(""))))
  }
}
