package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.functions.{GraftFunctions, HashFunctions, TextAnalysis, TextFunctions}
import graft.operators.{Bpe, CountMin, Decontaminate, Dedup, Jaccard, Kmv, Knn, Pca, Pq, QualityLr, Scrub, TemporalJoins}
import graft.QShared._

/** Web ingestion: html-to-text, url canonicalization, link/host graph, warc (plain + gzip), http split, charset decode, robots gating, sitemaps, page metadata, and the end-to-end crawl-to-corpus chain — one registry slice of [[SparkEntry]]
  * (queries and their DuckDB oracles; see SparkEntry for the
  * hash-parity conventions every entry follows).
  */
private[graft] object WebQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the crawl-to-corpus chain END TO END in its PRODUCTION landing
    // shape, every stage count and text digest predicted by the
    // oracle: gzipped WARC → HTTP 200 → declared-charset decode (é
    // only survives the latin-1 slice through the declaration) →
    // robots gate (/private slice blocked) → LANDING WRITE with markup
    // extraction (CurationPipeline.landExtracted — html is gone before
    // the landing table materializes, so the cascade's several
    // consumers never re-run the extractor; the r12 in-cascade
    // `html = true` shape re-projected it per consumer) → html=false
    // curation cascade with template-line dedup + quality gate + exact
    // and LSH near-dedup. Counts are the cascade's own stageCounts;
    // digests are mod-p md5 sums of the stage's exact text (fetched/
    // allowed hash the markup, landed/curated hash the extracted
    // text), so a drift at ANY layer (framing, charset, extraction,
    // line-df, keeper rule) breaks a row
    "q165_crawl_to_corpus" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, tx) =>
          (id, graft.corpus.Warc.syntheticCrawlWarc(id, tx)) }
        .toDF("id", "content")
      val fetched = graft.corpus.Warc.records(segs).toDF()
        .filter(col("warc_type") === "response" &&
          graft.corpus.Warc.httpStatus(col("payload").cast("string"))
            === 200)
        .select(col("id"), col("target_uri"), col("payload"))
        .as[(Long, String, Array[Byte])]
        .map { case (id, uri, p) =>
          (id, uri, graft.corpus.Warc.decodeHttpBody(p)) }
        .toDF("id", "uri", "html")
        // landing table: the digests + the cascade's several consumers
        // must not each re-run the gunzip/decode front end (at cluster
        // scale this is the landed-corpus parquet write)
        .localCheckpoint()
      val robotsTxt = "User-agent: *\nDisallow: /private\n"
      val robots = (0 until 7)
        .map(i => (s"site$i.example.com", robotsTxt))
        .toDF("host", "txt")
      val allowed = graft.operators.Robots.gate(
        fetched
          .withColumn("host", graft.operators.Urls.host(col("uri")))
          .withColumn("path",
            regexp_extract(col("uri"), "://[^/]*(/.*)$", 1)),
        graft.operators.Robots.rules(robots, "host", "txt", "graftbot")
          .toDF(),
        "host", "path")
        .filter(col("allowed"))
        .select(col("id"), col("html").as("text"))
      // the landing table: extraction happens ONCE, in the landing
      // write (localCheckpoint locally; the landed parquet at cluster
      // scale) — the cascade then runs html = false over clean text
      val landed = graft.pipeline.CurationPipeline
        .landExtracted(allowed, "id", "text")
      val res = graft.pipeline.CurationPipeline.run(landed, "id", "text",
        languages = Set.empty, spanDedup = Some((4, 2L)),
        spanMode = graft.pipeline.CurationPipeline.SpanLines,
        html = false, stageCounts = true)
      val P = 1000000007L
      def digestAgg(name: String, df: DataFrame, textC: Column) =
        df.agg(count(lit(1)).cast("long").as("n"),
          sum(pmod(HashFunctions.md5Long(textC), lit(P))).as("digest"))
          .select(lit(name).as("stage"), col("n"), col("digest"))
      val countRows = Seq(
        "04_cascade_input" -> res.counts("input"),
        "05_after_quality" -> res.counts("after_quality"),
        "06_after_line_dedup" -> res.counts("after_span_dedup"),
        "07_after_exact_dedup" -> res.counts("after_exact_dedup"),
        "08_after_near_dedup" -> res.counts("after_near_dedup"))
        .map { case (k, n) => (k, n, None: Option[Long]) }
        .toDF("stage", "n", "digest")
      digestAgg("01_fetched", fetched, col("html"))
        .unionAll(digestAgg("02_allowed", allowed, col("text")))
        .unionAll(digestAgg("03_landed", landed, col("text")))
        .unionAll(countRows)
        .unionAll(digestAgg("09_curated", res.curated, col("text")))
        .orderBy("stage")
    }),

    // HTML → text extraction (the step BEFORE every text operator in a
    // web-scrape pipeline): each doc's text is wrapped in a fixed
    // markup shell (script/style subtrees, block tags, all six common
    // entities), extracted by the RE2-compatible regexp_replace chain,
    // and hash-gated — the oracle replays the identical chain on the
    // identical wrapper
    "q148_html_to_text" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>t</title><style>p { color: red; }" +
          "</style></head><body><h1>Doc &amp; title</h1><p>"),
        col("text"),
        lit("</p><script type=\"text/javascript\">var x = 1 < 2;" +
          "</script><div>tail &lt;b&gt; &quot;q&#39;s&quot;" +
          " &nbsp;end</div></body></html>"))
      t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"),
          graft.operators.Scrub.htmlToText(html).as("__t"))
        .select(col("doc_id"), md5(col("__t")).as("text_md5"),
          length(col("__t")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    // URL canonicalization (RefinedWeb's identity layer — the key URL
    // dedup and per-host stats hash): every hazard at once via the
    // messyUrl fixture; the oracle predicts the canonical URL, host,
    // and registrable domain in CLOSED FORM — a normalizer that
    // mis-handles any one hazard (case, www, default port, tracking
    // params, fragment, trailing slash, cc-SLD) can't match
    "q150_url_normalize" -> ((s, dir) => {
      val d = col("doc_id")
      val u = messyUrl(d)
      t(s, dir, "documents").where(d.isNotNull)
        .select(d, graft.operators.Urls.normalize(u).as("url_norm"),
          graft.operators.Urls.host(u).as("host"),
          graft.operators.Urls.registrableDomain(
            graft.operators.Urls.host(u)).as("domain"))
        .orderBy("doc_id")
    }),

    // per-domain document cap (the anti-domination sampler every web
    // corpus runs: one site must not swamp the mix): registrable
    // domain off the canonical host feeds the deterministic
    // hash-ordered groupCap — at sf0.01 example.com holds 4/5 of the
    // corpus and gets cut to 5 docs like every small .co.uk site
    "q151_domain_cap" -> ((s, dir) => {
      val d = col("doc_id")
      val base = t(s, dir, "documents").where(d.isNotNull)
        .select(d, graft.operators.Urls.registrableDomain(
          graft.operators.Urls.host(messyUrl(d))).as("domain"))
      graft.operators.Sampling.groupCap(base, Seq("domain"), "doc_id",
        n = 5)
        .orderBy("domain", "doc_id")
    }),

    // link extraction + canonicalization (the web-graph edge source;
    // htmlToText deliberately DROPS anchors, so links must be pulled
    // first): both messy hrefs per doc come out normalized, with their
    // registrable target domain — all oracle-predicted in closed form
    "q152_link_extract" -> ((s, dir) => {
      val d = col("doc_id")
      t(s, dir, "documents").where(d.isNotNull)
        .select(d,
          posexplode(graft.operators.Urls.extractHrefs(linkHtml(d))))
        .select(d, col("pos").cast("long").as("link_idx"),
          graft.operators.Urls.normalize(col("col")).as("url_norm"),
          graft.operators.Urls.registrableDomain(
            graft.operators.Urls.host(col("col"))).as("dst_domain"))
        .orderBy("doc_id", "link_idx")
    }),

    // host-graph PageRank (the structural quality signal — Common
    // Crawl publishes exactly this host ranking): src domain from each
    // doc's own canonical URL, dst domains from its extracted links,
    // distinct edges, 3 damped power-iteration rounds with dangling
    // redistribution; the oracle unrolls all three rounds over the
    // same closed-form edge list (the q104 convention)
    "q153_host_pagerank" -> ((s, dir) => {
      val d = col("doc_id")
      val src = graft.operators.Urls.registrableDomain(
        graft.operators.Urls.host(messyUrl(d)))
      val edges = t(s, dir, "documents").where(d.isNotNull)
        .select(src.as("src"), explode(
          graft.operators.Urls.extractHrefs(linkHtml(d))).as("__l"))
        .select(col("src"), graft.operators.Urls.registrableDomain(
          graft.operators.Urls.host(col("__l"))).as("dst"))
      graft.operators.Graph.pageRank(edges, "src", "dst",
        iterations = 3, damping = 0.85)
        .select(col("id").as("domain"), col("pr"))
        .orderBy("domain")
    }),

    // writing-system profile (the script gate a multilingual cascade
    // runs BEFORE stopword langid): closed-form Cyrillic/CJK/Greek
    // tails of varying mass on top of the Latin base text, so the
    // dominant-script argmax flips with document length — the oracle
    // replays the same explicit codepoint-range counts
    "q154_script_profile" -> ((s, dir) => {
      val d = col("doc_id")
      val mixed = concat(col("text"),
        when(d % 4 === 0, repeat(lit(" привет мир"), 12))
          .when(d % 4 === 1, repeat(lit(" 你好世界"), 30))
          .when(d % 4 === 2, lit(" γειά σου"))
          .otherwise(lit("")))
      graft.functions.TextAnalysis.scriptProfile(
        t(s, dir, "documents").where(d.isNotNull)
          .select(d, mixed.as("text")),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // WARC record parse (ISO 28500 — Common Crawl's distribution
    // format, the TRUE first input of a web pipeline): closed-form
    // segments (one warcinfo + id%3+1 responses) walked by the real
    // byte-level Content-Length-framed parser; the oracle re-derives
    // every record's type, URI, length, and payload md5 from the id —
    // a boundary-scanning shortcut could not survive payloads
    // containing boundary-like bytes, and a stub could never hash-match
    "q155_warc_records" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id")).as[Long]
        .map(id => (id, graft.corpus.Warc.syntheticWarc(id)))
        .toDF("id", "content")
      graft.corpus.Warc.records(segs).toDF()
        .select(col("id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("id", "rec_idx")
    }),

    // the SAME record walk over Common Crawl's real wire format: every
    // record gzip-compressed as its own member (.warc.gz layout),
    // members concatenated per segment. The oracle is q155's — the
    // reader must inflate member-by-member and recover byte-identical
    // framing, or every length and payload md5 mismatches
    "q161_warc_gz_records" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id")).as[Long]
        .map(id => (id, graft.corpus.Warc.syntheticWarcGz(id)))
        .toDF("id", "content")
      graft.corpus.Warc.records(segs).toDF()
        .select(col("id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("id", "rec_idx")
    }),

    // the FULL crawl ingestion chain, end to end: WARC framing → HTTP
    // response (status line, headers, blank line) → HTML body → text
    // extraction. Every hop is gated at once — the oracle predicts the
    // status, headers, body length, AND the final extracted-text hash
    // in closed form; a shortcut at any layer (boundary-scan WARC,
    // body-leaking header split, markup in the text) breaks the hash
    "q156_warc_http_text" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, graft.corpus.Warc.syntheticHttpWarc(id,
            s"<html><body><div>Nav | Bar</div><p>$text</p>" +
              "</body></html>"))
        }.toDF("id", "content")
      graft.corpus.Warc.records(segs).toDF()
        .filter(col("warc_type") === "response")
        .select(col("id"), col("payload").cast("string").as("__p"))
        .select(col("id"),
          graft.corpus.Warc.httpStatus(col("__p")).as("status"),
          graft.corpus.Warc.httpHeader(col("__p"), "Content-Type")
            .as("content_type"),
          graft.corpus.Warc.httpHeader(col("__p"), "X-Doc").as("x_doc"),
          graft.corpus.Warc.httpHeader(col("__p"), "Content-Length")
            .cast("long").as("body_len"),
          md5(graft.operators.Scrub.htmlToText(
            graft.corpus.Warc.httpBody(col("__p")))).as("text_md5"))
        .orderBy("id")
    }),

    // robots.txt gating (RFC 9309): one policy file across all seven
    // fixture hosts — wildcard group with a longest-match Allow
    // carve-out under a Disallow, plus a bot-specific group that
    // REPLACES (not merges with) the wildcard for its agents. Gated
    // for both an unlisted agent (falls to '*') and graftbot; every
    // decision and deciding prefix predicted in closed form
    "q157_robots_gate" -> ((s, dir) => {
      import s.implicits._
      val robotsTxt =
        """# crawl policy
          |User-agent: *
          |Disallow: /private
          |Allow: /private/ok
          |Disallow: /*.tmp$
          |Allow: /p*ok
          |Crawl-delay: 5
          |
          |User-agent: graftbot
          |User-agent: otherbot
          |Disallow: /bot-only
          |Disallow: /*?sid=
          |""".stripMargin
      val robots = (0 until 7)
        .map(h => (s"site$h.example.com", robotsTxt)).toDF("host", "txt")
      val d = col("doc_id")
      val urls = t(s, dir, "documents").where(d.isNotNull)
        .select(d,
          concat(lit("site"), (d % 7).cast("string"),
            lit(".example.com")).as("host"),
          // seven path shapes exercising every §2.2.3 rule form:
          // prefix allow-override (0/1), wildcard query disallow for
          // the bot group only (2), $-anchored wildcard disallow (3),
          // mid-path-star allow (4), $-discrimination non-match (5),
          // bot-only literal prefix (6)
          when(d % 7 === 0, concat(lit("/private/ok/"), d.cast("string")))
            .when(d % 7 === 1, concat(lit("/private/"), d.cast("string")))
            .when(d % 7 === 2, concat(lit("/public/"), d.cast("string"),
              lit("?sid="), (d % 3).cast("string")))
            .when(d % 7 === 3, concat(lit("/tmp/"), d.cast("string"),
              lit(".tmp")))
            .when(d % 7 === 4, concat(lit("/p/"), d.cast("string"),
              lit("/ok")))
            .when(d % 7 === 5, concat(lit("/t/"), d.cast("string"),
              lit(".tmpx")))
            .otherwise(concat(lit("/bot-only/"), d.cast("string")))
            .as("path"))
      val star = graft.operators.Robots.gate(urls,
        graft.operators.Robots.rules(robots, "host", "txt", "crawler")
          .toDF(),
        "host", "path")
        .withColumnRenamed("allowed", "allowed_star")
        .withColumnRenamed("matched_prefix", "prefix_star")
      graft.operators.Robots.gate(star,
        graft.operators.Robots.rules(robots, "host", "txt", "graftbot")
          .toDF(),
        "host", "path")
        .withColumnRenamed("allowed", "allowed_bot")
        .withColumnRenamed("matched_prefix", "prefix_bot")
        .orderBy("doc_id")
    }),

    // sitemap URL discovery: two <loc> entries per doc (one carrying
    // the protocol-mandated &amp; escape and sloppy whitespace),
    // extracted, entity-decoded, and canonicalized — the oracle
    // predicts both final URLs in closed form
    "q158_sitemap_locs" -> ((s, dir) => {
      val d = col("doc_id")
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc> HTTP://Site"),
        (d % 7).cast("string"),
        lit(".Example.com/sm/"), d.cast("string"),
        lit(" </loc></url><url><loc>https://site"),
        ((d + 1) % 7).cast("string"),
        lit(".example.com/q?a=1&amp;b="), (d % 5).cast("string"),
        lit("</loc></url></urlset>"))
      t(s, dir, "documents").where(d.isNotNull)
        .select(d, posexplode(
          graft.operators.Urls.extractSitemapLocs(xml)))
        .select(d, col("pos").cast("long").as("loc_idx"),
          graft.operators.Urls.normalize(col("col")).as("url_norm"))
        .orderBy("doc_id", "loc_idx")
    }),

    // charset-aware body decode: the fixture bodies are REAL
    // ISO-8859-1 (accented chars as single high bytes — invalid
    // UTF-8), declared in their Content-Type; the decoder must honor
    // the declaration to round-trip the text, and a UTF-8-assuming
    // cast would hash-mismatch on every row
    "q159_warc_charset" -> ((s, dir) => {
      import s.implicits._
      val segs = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id")).as[Long]
        .map(id => (id, graft.corpus.Warc.syntheticLatin1Warc(id)))
        .toDF("id", "content")
      graft.corpus.Warc.records(segs).toDF()
        .select(col("id"), col("payload")).as[(Long, Array[Byte])]
        .map { case (id, p) =>
          (id, graft.corpus.Warc.decodeHttpBody(p)) }
        .toDF("id", "body")
        .select(col("id"),
          graft.operators.Scrub.htmlToText(col("body")).as("__t"))
        .select(col("id"), col("__t").as("text"),
          length(col("__t")).cast("long").as("n_chars"),
          md5(col("__t")).as("text_md5"))
        .orderBy("id")
    }),

    // page metadata extraction (the curation signals a page carries
    // about ITSELF): entity-decoded title, meta description in BOTH
    // attribute orders (alternating by parity), the page's own
    // canonical URL fed through the normalizer, the html lang claim,
    // and the robots-noindex flag — all closed-form
    "q160_html_meta" -> ((s, dir) => {
      val d = col("doc_id")
      val desc = concat(lit("Desc &quot;"), (d % 9).cast("string"),
        lit("&quot;"))
      val metaDesc = when(d % 2 === 0,
        concat(lit("<meta name=\"description\" content=\""), desc,
          lit("\">")))
        .otherwise(concat(lit("<meta content=\""), desc,
          lit("\" name=\"description\">")))
      val html = concat(
        lit("<!DOCTYPE html><html lang=\"en-US\"><head><title> Doc " +
          "&amp; Title "),
        d.cast("string"),
        lit(" </title>"), metaDesc,
        lit("<link rel=\"canonical\" href=\"HTTP://Site"),
        (d % 7).cast("string"),
        lit(".Example.com/c/"), d.cast("string"), lit("\">"),
        when(d % 5 === 0,
          lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
          .otherwise(lit("")),
        lit("</head><body><p>x</p></body></html>"))
      t(s, dir, "documents").where(d.isNotNull)
        .select(d,
          graft.operators.Scrub.htmlTitle(html).as("title"),
          graft.operators.Scrub.htmlMetaContent(html, "description")
            .as("description"),
          graft.operators.Urls.normalize(
            graft.operators.Scrub.htmlCanonical(html))
            .as("canonical_norm"),
          graft.operators.Scrub.htmlLang(html).as("lang"),
          graft.operators.Scrub.htmlNoindex(html).as("noindex"))
        .orderBy("doc_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // the identical wrapper + the identical RE2 chain (DuckDB string
    // literals pass backslashes through to RE2, so the whitespace
    // class reads the same; the newline replacement is chr(10)
    // because RE2 rewrite strings don't interpret \n)
    "q148_html_to_text" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>t</title><style>p { color: red; }' ||
        |    '</style></head><body><h1>Doc &amp; title</h1><p>' || text ||
        |    '</p><script type="text/javascript">var x = 1 < 2;' ||
        |    '</script><div>tail &lt;b&gt; &quot;q&#39;s&quot;' ||
        |    ' &nbsp;end</div></body></html>' AS t
        |  FROM documents WHERE doc_id IS NOT NULL),
        |s1 AS (SELECT doc_id, regexp_replace(t,
        |  '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |  '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
        |s2b AS (SELECT doc_id, regexp_replace(t,
        |  '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
        |s3 AS (SELECT doc_id, regexp_replace(t,
        |  '(?i)<br(?:/?|\s[^>]*)>|</p>|</div>|</li>|</tr>|</h[1-6]>', chr(10), 'g')
        |  AS t FROM s2b),
        |s4 AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g')
        |  AS t FROM s3),
        |s5 AS (SELECT doc_id, regexp_replace(t, '&nbsp;', ' ', 'g')
        |  AS t FROM s4),
        |s6 AS (SELECT doc_id, regexp_replace(t, '&lt;', '<', 'g')
        |  AS t FROM s5),
        |s7 AS (SELECT doc_id, regexp_replace(t, '&gt;', '>', 'g')
        |  AS t FROM s6),
        |s8 AS (SELECT doc_id, regexp_replace(t, '&quot;', '"', 'g')
        |  AS t FROM s7),
        |s9 AS (SELECT doc_id, regexp_replace(t, '&#39;', '''', 'g')
        |  AS t FROM s8),
        |s10 AS (SELECT doc_id, regexp_replace(t, '&amp;', '&', 'g')
        |  AS t FROM s9),
        |x1 AS (SELECT doc_id, regexp_replace(t,
        |  '[ \t\x0B\f\r]*\n[ \t\n\x0B\f\r]*', chr(10), 'g') AS t FROM s10),
        |x2 AS (SELECT doc_id, regexp_replace(t,
        |  '[ \t\x0B\f\r]+', ' ', 'g') AS t FROM x1),
        |x AS (SELECT doc_id, regexp_replace(t,
        |  '^[ \n]+|[ \n]+$', '', 'g') AS t FROM x2)
        |SELECT doc_id, md5(t) AS text_md5,
        |  CAST(length(t) AS BIGINT) AS n_chars
        |FROM x ORDER BY doc_id""".stripMargin,

    // the canonical URL predicted in CLOSED FORM from the fixture's
    // construction: scheme/host lowercased, www and the default :80
    // gone, the vanity :8080 kept, path case PRESERVED with the
    // trailing slash trimmed, only the id param surviving, fragment
    // dropped; domain takes three labels under the co.uk cc-SLD rule
    "q150_url_normalize" ->
      """SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) ||
        |    '://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '.co.uk'
        |          ELSE '.example.com' END) ||
        |    (CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END) ||
        |    '/Articles/' || CAST(doc_id AS VARCHAR) ||
        |    '?id=' || CAST(doc_id AS VARCHAR) AS url_norm,
        |  'site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '.co.uk'
        |          ELSE '.example.com' END) AS host,
        |  CASE WHEN doc_id % 5 = 0
        |    THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
        |    ELSE 'example.com' END AS domain
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    "q151_domain_cap" ->
      s"""WITH dmn AS (
         |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
         |    THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
         |    ELSE 'example.com' END AS domain
         |  FROM documents WHERE doc_id IS NOT NULL),
         |r AS (
         |  SELECT domain, doc_id,
         |    row_number() OVER (PARTITION BY domain
         |      ORDER BY ${h60("'graft:'||doc_id")} % 1000000, doc_id) AS rn
         |  FROM dmn)
         |SELECT doc_id, domain FROM r WHERE rn <= 5
         |ORDER BY domain, doc_id""".stripMargin,

    // both links' canonical forms predicted in closed form from the
    // linkHtml construction (tracking param and fragment gone, case
    // folded, www/:443 stripped, trailing slash trimmed, path case
    // preserved)
    "q152_link_extract" ->
      """SELECT doc_id, link_idx, url_norm, dst_domain FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS link_idx,
        |    'http://site' || CAST((doc_id + 3) % 7 AS VARCHAR) ||
        |      '.example.com/From/' || CAST(doc_id AS VARCHAR) ||
        |      '?x=' || CAST(doc_id % 3 AS VARCHAR) AS url_norm,
        |    'example.com' AS dst_domain
        |  FROM documents WHERE doc_id IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, CAST(1 AS BIGINT),
        |    'https://site' || CAST((2 * doc_id + 1) % 7 AS VARCHAR) ||
        |      '.co.uk/Page',
        |    'site' || CAST((2 * doc_id + 1) % 7 AS VARCHAR) || '.co.uk'
        |  FROM documents WHERE doc_id IS NOT NULL)
        |ORDER BY doc_id, link_idx""".stripMargin,

    // three unrolled damped power-iteration rounds over the closed-form
    // domain edge list; every arithmetic step in DOUBLE (CAST(0.85 AS
    // DOUBLE), 1.0 - that) so both engines fold the same ulps; the
    // dangling term is identically zero here (every fixture node has
    // outlinks) but stays in the formula the operator implements
    "q153_host_pagerank" -> {
      val dampD = "CAST(0.85 AS DOUBLE)"
      def round(k: Int): String =
        s"""d$k AS (
           |  SELECT coalesce(sum(pr), 0) AS dm FROM p$k
           |  WHERE nd NOT IN (SELECT s FROM deg)),
           |p${k + 1} AS (
           |  SELECT nodes.nd,
           |    (1.0 - $dampD) / (SELECT n FROM nn) + $dampD * (
           |      coalesce((SELECT sum(p.pr / deg.od)
           |        FROM e JOIN deg USING (s) JOIN p$k p ON p.nd = e.s
           |        WHERE e.t = nodes.nd), 0)
           |      + (SELECT dm FROM d$k) / (SELECT n FROM nn)) AS pr
           |  FROM nodes)""".stripMargin
      s"""WITH base AS (
         |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
         |    THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
         |    ELSE 'example.com' END AS s
         |  FROM documents WHERE doc_id IS NOT NULL),
         |e AS (
         |  SELECT DISTINCT s, 'example.com' AS t FROM base
         |  UNION
         |  SELECT s, 'site' || CAST((2 * doc_id + 1) % 7 AS VARCHAR) ||
         |    '.co.uk' FROM base),
         |nodes AS (
         |  SELECT DISTINCT nd FROM (
         |    SELECT s AS nd FROM e UNION ALL SELECT t AS nd FROM e) u),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |deg AS (
         |  SELECT s, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY s),
         |p0 AS (SELECT nd, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
         |${round(0)},
         |${round(1)},
         |${round(2)}
         |SELECT nd AS domain, pr FROM p3 ORDER BY domain""".stripMargin
    },

    // the identical mixed-script construction; counts via the same
    // \x{...} codepoint classes (hex class syntax reads identically to
    // Java regex and RE2); tie-break CASE order = the precedence order
    // of TextAnalysis.ScriptRanges
    "q154_script_profile" ->
      """WITH m AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN repeat(' привет мир', 12)
        |         WHEN doc_id % 4 = 1 THEN repeat(' 你好世界', 30)
        |         WHEN doc_id % 4 = 2 THEN ' γειά σου'
        |         ELSE '' END AS t
        |  FROM documents WHERE doc_id IS NOT NULL),
        |c AS (
        |  SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{024F}]',
        |      '', 'g')) AS BIGINT) AS n_latin,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS n_greek,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]', '', 'g'))
        |      AS BIGINT) AS n_cjk,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{AC00}-\x{D7AF}]', '', 'g')) AS BIGINT) AS n_hangul,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[\x{0900}-\x{097F}]', '', 'g')) AS BIGINT) AS n_devanagari
        |  FROM m),
        |g AS (SELECT *, greatest(n_latin, n_cyrillic, n_greek, n_cjk,
        |  n_arabic, n_hangul, n_devanagari) AS gm FROM c)
        |SELECT doc_id, n_chars, n_latin, n_cyrillic, n_greek, n_cjk,
        |  n_arabic, n_hangul, n_devanagari,
        |  CASE WHEN gm = 0 THEN 'none'
        |       WHEN n_latin = gm THEN 'latin'
        |       WHEN n_cyrillic = gm THEN 'cyrillic'
        |       WHEN n_greek = gm THEN 'greek'
        |       WHEN n_cjk = gm THEN 'cjk'
        |       WHEN n_arabic = gm THEN 'arabic'
        |       WHEN n_hangul = gm THEN 'hangul'
        |       ELSE 'devanagari' END AS dominant_script,
        |  CASE WHEN n_chars = 0 THEN 0.0
        |       ELSE CAST(gm AS DOUBLE) / n_chars END AS dominant_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    // every record field re-derived from the id: the warcinfo row plus
    // id%3+1 response rows with the synthetic URI and payload rebuilt
    // verbatim (length and md5 over the same ASCII bytes)
    "q155_warc_records" ->
      """WITH info AS (
        |  SELECT doc_id AS id, CAST(0 AS BIGINT) AS rec_idx,
        |    'warcinfo' AS warc_type, '' AS target_uri,
        |    'software: graft/1.0' AS payload
        |  FROM documents WHERE doc_id IS NOT NULL),
        |resp AS (
        |  SELECT doc_id AS id, CAST(r + 1 AS BIGINT) AS rec_idx,
        |    'response' AS warc_type,
        |    'http://site' || CAST((doc_id + r) % 7 AS VARCHAR) ||
        |      '.example.com/page/' || CAST(doc_id AS VARCHAR) || '-' ||
        |      CAST(r AS VARCHAR) AS target_uri,
        |    'payload ' || CAST(doc_id AS VARCHAR) || ' ' ||
        |      CAST(r AS VARCHAR) || ' ' ||
        |      repeat('a', CAST((doc_id + r) % 23 AS INT)) AS payload
        |  FROM documents, unnest(generate_series(0, doc_id % 3)) AS u(r)
        |  WHERE doc_id IS NOT NULL),
        |allr AS (SELECT * FROM info UNION ALL SELECT * FROM resp)
        |SELECT id, rec_idx, warc_type, target_uri,
        |  CAST(length(payload) AS BIGINT) AS content_length,
        |  md5(payload) AS payload_md5
        |FROM allr ORDER BY id, rec_idx""".stripMargin,

    // gzip is framing, not content: after member-per-record inflation
    // the record stream is byte-identical to q155's, so the oracle is
    // the same id-derived rebuild
    "q161_warc_gz_records" ->
      """WITH info AS (
        |  SELECT doc_id AS id, CAST(0 AS BIGINT) AS rec_idx,
        |    'warcinfo' AS warc_type, '' AS target_uri,
        |    'software: graft/1.0' AS payload
        |  FROM documents WHERE doc_id IS NOT NULL),
        |resp AS (
        |  SELECT doc_id AS id, CAST(r + 1 AS BIGINT) AS rec_idx,
        |    'response' AS warc_type,
        |    'http://site' || CAST((doc_id + r) % 7 AS VARCHAR) ||
        |      '.example.com/page/' || CAST(doc_id AS VARCHAR) || '-' ||
        |      CAST(r AS VARCHAR) AS target_uri,
        |    'payload ' || CAST(doc_id AS VARCHAR) || ' ' ||
        |      CAST(r AS VARCHAR) || ' ' ||
        |      repeat('a', CAST((doc_id + r) % 23 AS INT)) AS payload
        |  FROM documents, unnest(generate_series(0, doc_id % 3)) AS u(r)
        |  WHERE doc_id IS NOT NULL),
        |allr AS (SELECT * FROM info UNION ALL SELECT * FROM resp)
        |SELECT id, rec_idx, warc_type, target_uri,
        |  CAST(length(payload) AS BIGINT) AS content_length,
        |  md5(payload) AS payload_md5
        |FROM allr ORDER BY id, rec_idx""".stripMargin,

    // the whole chain predicted in CLOSED FORM: the fixture corpus is
    // single-spaced ASCII, so extraction of the known wrapper is
    // exactly 'Nav | Bar' + newline + the original text
    "q156_warc_http_text" ->
      """SELECT doc_id AS id, CAST(200 AS BIGINT) AS status,
        |  'text/html; charset=utf-8' AS content_type,
        |  CAST(doc_id AS VARCHAR) AS x_doc,
        |  CAST(length('<html><body><div>Nav | Bar</div><p>' || text ||
        |    '</p></body></html>') AS BIGINT) AS body_len,
        |  md5('Nav | Bar' || chr(10) || text) AS text_md5
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY id""".stripMargin,

    // decisions in closed form: '*' group disallows /private except
    // the longer /private/ok allow; the graftbot group sees ONLY its
    // own /bot-only rule (specific group replaces the wildcard)
    // every decision predicted in closed form from doc_id % 7: the '*'
    // group disallows case 1 (prefix) and case 3 ($-anchored wildcard,
    // which must NOT catch case 5's '.tmpx'); the bot group — which
    // REPLACES '*', so cases 1/3 come back allowed — disallows case 2
    // (wildcard query rule) and case 6 (literal prefix)
    "q157_robots_gate" ->
      """SELECT doc_id,
        |  'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
        |  CASE doc_id % 7
        |    WHEN 0 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR)
        |    WHEN 2 THEN '/public/' || CAST(doc_id AS VARCHAR) ||
        |      '?sid=' || CAST(doc_id % 3 AS VARCHAR)
        |    WHEN 3 THEN '/tmp/' || CAST(doc_id AS VARCHAR) || '.tmp'
        |    WHEN 4 THEN '/p/' || CAST(doc_id AS VARCHAR) || '/ok'
        |    WHEN 5 THEN '/t/' || CAST(doc_id AS VARCHAR) || '.tmpx'
        |    ELSE '/bot-only/' || CAST(doc_id AS VARCHAR) END AS path,
        |  doc_id % 7 NOT IN (1, 3) AS allowed_star,
        |  CASE doc_id % 7 WHEN 0 THEN '/private/ok'
        |    WHEN 1 THEN '/private' WHEN 3 THEN '/*.tmp$'
        |    WHEN 4 THEN '/p*ok' ELSE '' END AS prefix_star,
        |  doc_id % 7 NOT IN (2, 6) AS allowed_bot,
        |  CASE doc_id % 7 WHEN 2 THEN '/*?sid='
        |    WHEN 6 THEN '/bot-only' ELSE '' END AS prefix_bot
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // both discovered URLs in closed form: trimmed, entity-decoded
    // (&amp; → &), then canonicalized like any crawl frontier entry
    "q158_sitemap_locs" ->
      """SELECT doc_id, loc_idx, url_norm FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS loc_idx,
        |    'http://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |      '.example.com/sm/' || CAST(doc_id AS VARCHAR) AS url_norm
        |  FROM documents WHERE doc_id IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, CAST(1 AS BIGINT),
        |    'https://site' || CAST((doc_id + 1) % 7 AS VARCHAR) ||
        |      '.example.com/q?a=1&b=' || CAST(doc_id % 5 AS VARCHAR)
        |  FROM documents WHERE doc_id IS NOT NULL)
        |ORDER BY doc_id, loc_idx""".stripMargin,

    // the decoded latin-1 text predicted verbatim (both engines count
    // codepoints and hash UTF-8 bytes)
    "q159_warc_charset" ->
      """SELECT doc_id AS id,
        |  'Café naïve ' || CAST(doc_id AS VARCHAR) AS text,
        |  CAST(length('Café naïve ' || CAST(doc_id AS VARCHAR))
        |    AS BIGINT) AS n_chars,
        |  md5('Café naïve ' || CAST(doc_id AS VARCHAR)) AS text_md5
        |FROM documents WHERE doc_id IS NOT NULL ORDER BY id""".stripMargin,

    // every metadata field in closed form; description is identical
    // for both attribute orders, so the parity split gates both match
    // branches
    "q160_html_meta" ->
      """SELECT doc_id,
        |  'Doc & Title ' || CAST(doc_id AS VARCHAR) AS title,
        |  'Desc "' || CAST(doc_id % 9 AS VARCHAR) || '"' AS description,
        |  'http://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example.com/c/' || CAST(doc_id AS VARCHAR)
        |    AS canonical_norm,
        |  'en-us' AS lang,
        |  doc_id % 5 = 0 AS noindex
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // the whole chain replayed: decoded html + extracted LANDED text
    // in closed form (the fixture wrapper is fixed and the corpus is
    // single-line ASCII — xtext IS the landing table's content),
    // robots = the id % 5 slice, then the cascade's own semantics
    // stage by stage — q51's quality formulas, q149's line-df dedup,
    // min-id exact keepers, and the q105-family MinHash/banding/
    // verified-jaccard near-dedup, all over the REWRITTEN text.
    // Digests are mod-p md5 sums of the stage texts
    "q165_crawl_to_corpus" ->
      s"""WITH base AS (
         |  SELECT doc_id AS id, text,
         |    '<html><body><div>Home | About | Contact</div><p>Resume ' ||
         |      CAST(doc_id AS VARCHAR) || ' é</p><p>' || text ||
         |      '</p><div>(c) 2026 Example Corp.</div></body></html>'
         |      AS html,
         |    'Home | About | Contact' || chr(10) || 'Resume ' ||
         |      CAST(doc_id AS VARCHAR) || ' é' || chr(10) || text ||
         |      chr(10) || '(c) 2026 Example Corp.' AS xtext
         |  FROM documents WHERE doc_id IS NOT NULL),
         |allowed AS (SELECT * FROM base WHERE id % 5 <> 0),
         |xw AS (
         |  SELECT id, xtext, list_filter(string_split_regex(
         |      regexp_replace(lower(xtext), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'), x -> x != '') AS ws
         |  FROM allowed),
         |quality AS (
         |  SELECT id, xtext FROM xw
         |  WHERE len(ws) >= 5
         |    AND round(CAST(length(xtext) - length(regexp_replace(xtext,
         |      '[a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(xtext), 1), 4) >= 0.5
         |    AND round(CAST(len(list_distinct(ws)) AS DOUBLE)
         |      / greatest(len(ws), 1), 4) <= 1.01),
         |l AS (
         |  SELECT id, i - 1 AS idx, ls[i] AS line
         |  FROM (SELECT id, string_split(xtext, chr(10)) AS ls
         |        FROM quality),
         |    unnest(generate_series(1, len(ls))) AS u(i)),
         |hot AS (
         |  SELECT line FROM (
         |    SELECT line, count(DISTINCT id) AS df FROM l GROUP BY line)
         |  WHERE df > 2),
         |rew AS (
         |  SELECT id,
         |    array_to_string(list(line ORDER BY idx)
         |      FILTER (line NOT IN (SELECT line FROM hot)), chr(10))
         |      AS rtext,
         |    count(*) FILTER (line NOT IN (SELECT line FROM hot))
         |      AS n_kept
         |  FROM l GROUP BY id),
         |live AS (SELECT id, rtext FROM rew WHERE n_kept > 0),
         |exact AS (SELECT min(id) AS id FROM live GROUP BY rtext),
         |ek AS (SELECT v.id, v.rtext FROM live v
         |       JOIN exact e ON e.id = v.id),
         |rw AS (
         |  SELECT id, list_filter(string_split_regex(
         |      regexp_replace(lower(rtext), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'), x -> x != '') AS ws
         |  FROM ek),
         |rsh AS (
         |  SELECT id, list_distinct(list_transform(
         |    generate_series(1, greatest(1, len(ws) - 2)),
         |    i -> array_to_string(ws[i:i+2], ' '))) AS shingles
         |  FROM rw WHERE len(ws) > 0),
         |rposts AS (SELECT id, unnest(shingles) AS word FROM rsh
         |           WHERE len(shingles) > 0),
         |rsig AS (
         |  SELECT id, perm,
         |    min((((perm+1)*1299721 % 2147483629)
         |         * (${h60("word")} % 2147483629)
         |         + (perm*7919+104729) % 2147483629) % 2147483629)
         |      AS min_hash
         |  FROM rposts
         |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS perm) perms
         |  GROUP BY id, perm),
         |rband AS (
         |  SELECT id, CAST(perm // 2 AS INT) AS band,
         |    list(min_hash ORDER BY perm) AS band_key
         |  FROM rsig GROUP BY id, band),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM rband a JOIN rband b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |    AND a.id < b.id),
         |sz AS (SELECT id, len(shingles) AS sz FROM rsh),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n
         |  FROM rposts a JOIN rposts b
         |    ON a.word = b.word AND a.id < b.id
         |  GROUP BY a.id, b.id),
         |ver AS (
         |  SELECT c.id_a, c.id_b
         |  FROM cand c
         |  JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
         |  JOIN sz sa ON sa.id = c.id_a
         |  JOIN sz sb ON sb.id = c.id_b
         |  WHERE (sa.sz + sb.sz - i.n) > 0
         |    AND CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n)
         |      >= CAST(0.8 AS DOUBLE)),
         |losers AS (SELECT DISTINCT id_b AS id FROM ver),
         |keep AS (SELECT e.id FROM exact e
         |         WHERE e.id NOT IN (SELECT id FROM losers))
         |SELECT '01_fetched' AS stage, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${h60("html")} % 1000000007) AS BIGINT) AS digest
         |FROM base
         |UNION ALL SELECT '02_allowed', CAST(count(*) AS BIGINT),
         |  CAST(sum(${h60("html")} % 1000000007) AS BIGINT) FROM allowed
         |UNION ALL SELECT '03_landed', CAST(count(*) AS BIGINT),
         |  CAST(sum(${h60("xtext")} % 1000000007) AS BIGINT) FROM allowed
         |UNION ALL SELECT '04_cascade_input', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM allowed
         |UNION ALL SELECT '05_after_quality', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM quality
         |UNION ALL SELECT '06_after_line_dedup', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM live
         |UNION ALL SELECT '07_after_exact_dedup', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM exact
         |UNION ALL SELECT '08_after_near_dedup', CAST(count(*) AS BIGINT),
         |  CAST(NULL AS BIGINT) FROM keep
         |UNION ALL SELECT '09_curated', CAST(count(*) AS BIGINT),
         |  CAST(sum(${h60("rtext")} % 1000000007) AS BIGINT)
         |FROM live JOIN keep USING (id)
         |ORDER BY stage""".stripMargin,
  )
}
