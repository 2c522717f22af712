package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.functions.{GraftFunctions, HashFunctions, TextAnalysis, TextFunctions}
import graft.operators.{Bpe, CountMin, Decontaminate, Dedup, Jaccard, Kmv, Knn, Pca, Pq, QualityLr, Scrub, TemporalJoins}

/** Fixture builders and DuckDB oracle fragments shared by every
  * registry slice of [[SparkEntry]] — one definition per tokenizer/
  * signature/oracle convention so the slices cannot drift apart.
  */
private[graft] object QShared {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as a proper timestamp. The fixture writes
    * TIMESTAMP(NANOS) which Spark only reads as a nanos BIGINT (under
    * `spark.sql.legacy.parquet.nanosAsLong`) — convert with integer
    * division (a double roundtrip would lose precision past 2^53).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

  /** Closed-form messy URL from doc_id — the q150/q151 fixture: every
    * canonicalization hazard at once (mixed-case scheme and host, www
    * on id%3==0, a default :80 port on id%4==0 and a real :8080 on
    * id%4==1, a trailing path slash on evens, tracking params around a
    * real one, a fragment). The oracle predicts the CANONICAL form in
    * closed form rather than replaying the chain.
    */
  def messyUrl(d: Column): Column = concat(
    when(d % 2 === 0, lit("HTTP")).otherwise(lit("https")),
    lit("://"),
    when(d % 3 === 0, lit("WWW.")).otherwise(lit("")),
    lit("Site"), (d % 7).cast("string"),
    when(d % 5 === 0, lit(".co.uk")).otherwise(lit(".Example.com")),
    when(d % 4 === 0, lit(":80"))
      .when(d % 4 === 1, lit(":8080")).otherwise(lit("")),
    lit("/Articles/"), d.cast("string"),
    when(d % 2 === 0, lit("/")).otherwise(lit("")),
    lit("?utm_source=feed&id="), d.cast("string"),
    lit("&utm_campaign=x&fbclid=abc#Section-"), (d % 3).cast("string"))

  /** Closed-form anchor markup from doc_id — the q152/q153 fixture:
    * two messy double-quoted hrefs (case, www, default port, tracking
    * param, fragment, trailing slash) whose canonical targets the
    * oracle predicts in closed form. Link A lands on
    * site{(d+3)%7}.example.com, link B on site{(2d+1)%7}.co.uk.
    */
  def linkHtml(d: Column): Column = concat(
    lit("<html><body><p>intro</p><a class=\"m\" href=\"HTTP://Site"),
    ((d + 3) % 7).cast("string"),
    lit(".Example.com/From/"), d.cast("string"),
    lit("?utm_source=a&x="), (d % 3).cast("string"),
    lit("#f\">one</a><div><a href=\"https://WWW.Site"),
    ((d * 2 + 1) % 7).cast("string"),
    lit(".co.uk:443/Page/\">two</a></div></body></html>"))

  /** documents with the column names the Jaccard operators expect. */
  def docsAsCorpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id").as("docId"), col("text"))

  /** documents globally sorted by doc_id BEFORE the caller's expensive
    * per-doc projections. A global sort samples its child to compute
    * range bounds, re-executing everything below the exchange — with a
    * trailing `orderBy` that means every kernel runs twice. Sorting the
    * bare scan first and applying the (order-preserving, narrow)
    * projections above it keeps the output sorted while the sampling
    * pass re-reads only the scan: measured 5.8 s → 3.2 s on
    * q54_char_shingles at sf0.1.
    */
  def docsSorted(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").orderBy("doc_id")

  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */

  /** One hash table's SRP hyperplanes as a SQL array-of-arrays literal
    * (q131's SQL-text path). String-cast literals, not bare decimals:
    * Spark parses `0.123456` as DECIMAL, while `CAST('<toString>' AS
    * DOUBLE)` is the exact `Double.parseDouble` round-trip of the
    * driver-computed plane component.
    */
  def srpPlanesSql(table: Int, planes: Int, dim: Int): String =
    graft.operators.Knn.srpPlanes(table, planes, dim)
      .map(_.map(v => s"CAST('$v' AS DOUBLE)").mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")

  /** q119/q128's shared IVFADC index fixture (centroid seeds, seed
    * codebooks, probe query set) — ONE definition so the recall readout
    * can never measure a different index than the top-k it evaluates
    * (the oracle side shares `IvfAdcCtes` the same way).
    */
  def ivfAdcIndex(embs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val cents = embs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // codebooks trained on RESIDUALS (Jégou §III-A), seeded from
    // NON-centroid rows: the centroid vectors' own residuals are
    // exactly zero and would collapse all 16 seeds into one point
    val cb = Pq.pqSeedCodebooks(
      Pq.residuals(embs, "vec_id", "embedding", cents)
        .filter(col("vec_id") >= 16),
      "vec_id", "rvec", m = 8, ksub = 16)
    (cents, cb, embs.filter(col("vec_id") < 20))
  }

  /** q168's corpus-independent unigram piece table (q106's
    * fixed-vocabulary convention): every `[a-z0-9]` character plus
    * common English multigrams with hand-fixed log-probs — Viterbi
    * dynamics become value-checkable in SQL; the LEARNED table is
    * UnigramSpec's job (EM is not SQL-expressible).
    */
  val UnigramFixedPieces: Seq[(String, Double)] =
    (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> -4.5) ++ Seq(
      "th" -> -2.5, "he" -> -2.6, "in" -> -2.4, "er" -> -2.5,
      "an" -> -2.6, "re" -> -2.7, "on" -> -2.6, "en" -> -2.7,
      "at" -> -2.7, "es" -> -2.7, "or" -> -2.8, "ti" -> -2.8,
      "st" -> -2.8, "ar" -> -2.9, "nd" -> -2.9, "al" -> -2.9,
      "ing" -> -3.0, "ion" -> -3.1, "ent" -> -3.2, "ter" -> -3.1,
      "the" -> -2.8, "and" -> -2.9, "tion" -> -3.4, "men" -> -3.3)

  /** DuckDB literals for [[UnigramFixedPieces]] — generated from the
    * same Seq so the Spark query and the oracle cannot drift.
    */
  val UnigramPiecesSql: String =
    UnigramFixedPieces.map(p => s"'${p._1}'").mkString("[", ", ", "]")
  val UnigramLpsSql: String =
    "CAST(" + UnigramFixedPieces.map(_._2).mkString("[", ", ", "]") +
      " AS DOUBLE[])"
  val UnigramMaxLen: Int = UnigramFixedPieces.map(_._1.length).max

  /** q170's fixed substring blocklist: nested/overlapping terms
    * ("ar" ⊂ "art"/"park" ⊂ spark/part) exercise the Aho–Corasick
    * suffix links, a spaced phrase exercises cross-word matching.
    */
  val MultiMatchTerms: Seq[String] = Seq(
    "a", "ar", "art", "park", "or", "order", "low", "able", "row",
    "fast sort")
  val MultiMatchTermsSql: String =
    MultiMatchTerms.map(t => s"'$t'").mkString("[", ", ", "]")

  /** q106's corpus-independent merge table (see the query comment). */
  val BpeFixedMerges: Seq[(String, String)] =
    Seq(("a", "n"), ("s", "c"), ("sc", "an"), ("e", "r"))

  // (q104's learned-merge literal table lived here through round 14;
  // round 15 de-pinned the oracle — it now derives every argmax from
  // the data, so the gate holds at ANY scale factor and the literals
  // are gone. BPE-training perf context, still true: after the one
  // corpus-scale wordCounts pass, each merge round is a
  // vocabulary-sized argmax + rewrite — warm ~0.15 s/round at sf0.1;
  // ScaleBench bpe_learn_8merges_10x records the 10× walls.)

  /** q111's fixture component table: 4 pseudo-components over d=64 with
    * EXACT binary-representable entries (n/32, |n| ≤ 16) and offsets
    * (n/16), emitted verbatim into both the Spark frame and the oracle's
    * VALUES literal — so the centered-projection folds are bit-identical
    * in both engines and the hash gate needs no tolerance.
    */
  val PcaFixtureBases: Seq[(Int, Seq[Double], Double)] =
    (0 until 4).map { k =>
      (k, (0 until 64).map(i => (((i * 7 + k * 13) % 33) - 16) / 32.0),
        (k - 2) / 16.0)
    }

  /** Shared Zipf-text fixture for retrieval-shaped queries (round-14
    * finding: the documents fixture's 31-word flat vocabulary is
    * DEGENERATE for retrieval — every term has df ≈ 0.77·N, so there
    * is no rare/hot structure for df-driven operators to exercise).
    * Token j of doc d is `w⌊scale/(u+1)⌋` with `u = md5_60("salt:d:j")
    * mod mod` — a closed-form Zipf draw both engines compute
    * IDENTICALLY: the md5-60 hash is the [[h60]] convention, the
    * division is one IEEE double op, and `floor` agrees because both
    * sides floor the same double. `mod = scale` is the natural
    * corpus/head draw (`w1` takes half of all tokens); `mod < scale`
    * restricts u to the RARE TAIL (the ScaleBench zipfTok shape —
    * token values stay exactly the achievable corpus tokens, same
    * formula with a restricted u). Do NOT fake a tail by shrinking
    * `scale` itself: `w⌊14/(u+1)⌋` lands on w14/w7/w4… — mid-band
    * tokens with df far ABOVE a corpus-fraction hot cut (caught by
    * q187's decision-table gate: every query showed 0 rare terms).
    * [[zipfTextSql]] is generated from the same shape so the Spark
    * column and the oracle literal cannot drift.
    */
  def zipfText(d: Column, nTokens: Int, mod: Int, salt: String,
               scale: Int): Column =
    concat_ws(" ", transform(sequence(lit(0), lit(nTokens - 1)),
      j => concat(lit("w"),
        floor(lit(scale).cast("double") /
          (pmod(graft.functions.HashFunctions.md5Long(
            concat_ws(":", lit(salt), d.cast("string"), j.cast("string"))),
            lit(mod)) + lit(1L)).cast("double")).cast("string"))))

  /** DuckDB replay of [[zipfText]] over column expression `d`. ONE
    * line on purpose: the fragment nests inside consumers' own
    * `stripMargin` strings, where a continuation line starting with
    * `||` loses a pipe per enclosing strip.
    */
  def zipfTextSql(d: String, nTokens: Int, mod: Int, salt: String,
                  scale: Int): String =
    s"array_to_string(['w' || CAST(CAST(floor(CAST($scale AS DOUBLE) / " +
      s"CAST((('0x' || substr(md5('$salt:' || CAST($d AS VARCHAR) || " +
      s"':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT % $mod) + 1 " +
      s"AS DOUBLE)) AS BIGINT) AS VARCHAR) " +
      s"FOR j IN generate_series(0, ${nTokens - 1})], ' ')"

  // ------------------------------------------------------------ oracle SQL

  /** Java's `\s` is `[ \t\n\x0B\f\r]` but RE2's (DuckDB's) `\s` omits
    * vertical tab — spell the Java class out explicitly so the engines
    * can never diverge on control characters.
    */
  val WsClass = """ \t\n\x0b\f\r"""

  /** DuckDB tokenizer matching TextFunctions.normalizeTokens. */
  val ToksCte =
    s"""toks AS (
      |  SELECT doc_id, list_distinct(list_filter(
      |    string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
      |      '[$WsClass]+'),
      |    x -> x != '')) AS tokens
      |  FROM documents
      |)""".stripMargin

  /** DuckDB non-deduped normalized words (TextFunctions.normalizedWords). */
  val WordsCte =
    s"""words AS (
      |  SELECT doc_id, source, text, list_filter(
      |    string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
      |      '[$WsClass]+'),
      |    x -> x != '') AS ws
      |  FROM documents
      |)""".stripMargin

  /** DuckDB 60-bit md5 hash matching HashFunctions.md5Long. */
  def h60(x: String): String =
    s"('0x'||substr(md5($x),1,15))::BIGINT"

  /** DuckDB live-doc words (id present + ≥1 alnum char) matching the
    * filter in TextAnalysis.repetitionStats / Dedup.chunkStats.
    */
  val LiveWordsCte =
    s"""ws AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
      |      '[$WsClass]+'),
      |    x -> x != '') AS w
      |  FROM documents
      |  WHERE doc_id IS NOT NULL
      |    AND regexp_matches(lower(text), '[a-z0-9]')
      |)""".stripMargin

  /** DuckDB token OCCURRENCE stream (multiset, no doc key) matching the
    * q77/q78 postings projection.
    */
  val TokStreamCte =
    s"""tokstream AS (
      |  SELECT unnest(list_filter(
      |    string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
      |      '[$WsClass]+'),
      |    x -> x != '')) AS tok
      |  FROM documents
      |  WHERE regexp_matches(lower(text), '[a-z0-9]')
      |)""".stripMargin

  /** DuckDB replica of the [[graft.operators.QualityLr]] training chain:
    * hashed L1-normalized tf features, then per GD iteration — per-doc
    * bucket-ordered score folds, sigmoid, per-bucket doc-ordered
    * gradient folds, `w ← w − lr·g/n` — exactly the accumulation tree
    * the Spark side fixes by value. Emits CTEs `feats`, `nn`, and
    * `p1, g1, gb1, w1, b1, …, p{iters+1}` (scores under the final
    * weights); the caller appends the final SELECT.
    */
  /** The q112/q113 corpus head: curated-vs-crawl label over normalized
    * WORD tokens. `lrChainSql` swaps it out for other feature streams
    * (q166 feeds char n-grams through the same training replay).
    */
  lazy val LrWordsLwCte =
    s"""lw AS (
       |  SELECT doc_id,
       |    CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y,
       |    list_filter(
       |      string_split_regex(
       |        regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
       |        '[$WsClass]+'),
       |      x -> x != '') AS ws
       |  FROM documents
       |  WHERE doc_id IS NOT NULL
       |    AND regexp_matches(lower(text), '[a-z0-9]'))""".stripMargin

  def lrChainSql(dim: Int, iters: Int, lr: Double,
                         lwCte: String = LrWordsLwCte): String = {
    val fold = "(u, v) -> u + v"
    def pCte(tIt: Int): String = {
      val (from, term, bias) =
        if (tIt == 1) ("feats f", "f.x * 0.0", "0.0")
        else (s"feats f LEFT JOIN w${tIt - 1} wp ON f.j = wp.j",
          "f.x * coalesce(wp.w, 0.0)", s"(SELECT b FROM b${tIt - 1})")
      s"""p$tIt AS (
         |  SELECT doc_id, y, 1.0 / (1.0 + exp(-(z))) AS p
         |  FROM (SELECT f.doc_id, f.y,
         |          list_reduce(list($term ORDER BY f.j), $fold)
         |            + $bias AS z
         |        FROM $from GROUP BY f.doc_id, f.y))""".stripMargin
    }
    def gradCtes(tIt: Int): String = {
      val wPrev =
        if (tIt == 1) "0.0" else "coalesce(wp.w, 0.0)"
      val wFrom =
        if (tIt == 1) s"g$tIt g CROSS JOIN nn"
        else s"g$tIt g LEFT JOIN w${tIt - 1} wp ON g.j = wp.j CROSS JOIN nn"
      val bPrev = if (tIt == 1) "0.0" else s"(SELECT b FROM b${tIt - 1})"
      s"""g$tIt AS (
         |  SELECT f.j,
         |    list_reduce(list(f.x * r.r ORDER BY f.doc_id), $fold) AS g
         |  FROM feats f JOIN (SELECT doc_id, p - y AS r FROM p$tIt) r
         |    ON f.doc_id = r.doc_id
         |  GROUP BY f.j),
         |gb$tIt AS (
         |  SELECT list_reduce(list(p - y ORDER BY doc_id), $fold) AS g
         |  FROM p$tIt),
         |w$tIt AS (
         |  SELECT g.j, $wPrev - $lr * g.g / n AS w FROM $wFrom),
         |b$tIt AS (
         |  SELECT $bPrev - $lr * g / n AS b FROM gb$tIt CROSS JOIN nn)"""
        .stripMargin
    }
    val iterCtes = (1 to iters).map(tc => pCte(tc) + ",\n" + gradCtes(tc))
    (Seq(
      s"""$lwCte,
         |feats AS (
         |  SELECT doc_id, y, j, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS x
         |  FROM (
         |    SELECT doc_id, y, n,
         |      CAST(${h60("w")} % $dim AS INT) AS j, count(*) AS c
         |    FROM (SELECT doc_id, y, len(ws) AS n, unnest(ws) AS w FROM lw)
         |    GROUP BY 1, 2, 3, 4)),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lw)"""
        .stripMargin) ++ iterCtes ++ Seq(pCte(iters + 1))).mkString(",\n")
  }

  /** DuckDB replica of [[graft.operators.Pq]]: seed codebooks (`cb`),
    * and — parameterized by codebook CTE name and suffix — the
    * per-(vector, subspace, entry) squared-L2 table (`dist\$sfx`,
    * position-ordered fold seeded 0.0, Spark's exact tree) and the
    * per-subspace argmin (`best\$sfx`, ties → lowest cid). m=8 × 8-wide
    * subspaces, ksub=16.
    */
  def pqDistSql(cbName: String, sfx: String): String =
    s"""dist$sfx AS (
       |  SELECT e.vec_id, c.sub, c.cid,
       |    list_reduce(list_prepend(0.0,
       |      [(CAST(e.embedding[c.sub*8+p] AS DOUBLE) - c.cvec[p])
       |        * (CAST(e.embedding[c.sub*8+p] AS DOUBLE) - c.cvec[p])
       |       FOR p IN generate_series(1, 8)]),
       |      (u, v) -> u + v) AS d2
       |  FROM emb e CROSS JOIN $cbName c),
       |best$sfx AS (
       |  SELECT vec_id, sub, cid, d2,
       |    row_number() OVER (PARTITION BY vec_id, sub
       |                       ORDER BY d2, cid) AS rn
       |  FROM dist$sfx)""".stripMargin

  val PqBaseSql: String =
    s"""emb AS (SELECT vec_id, embedding FROM embeddings
       |        WHERE vec_id IS NOT NULL),
       |seeds AS (SELECT vec_id AS cid, embedding FROM emb
       |          ORDER BY vec_id LIMIT 16),
       |cb AS (
       |  SELECT s.sub, se.cid,
       |    list_transform(se.embedding[(s.sub*8+1):(s.sub*8+8)],
       |      x -> CAST(x AS DOUBLE)) AS cvec
       |  FROM seeds se
       |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sub) s),
       |${pqDistSql("cb", "")}""".stripMargin

  /** DuckDB MinHash signature CTE (k=8) matching
    * Dedup.minHashSignatures over 3-word shingles — same md5-derived
    * hashes, same permutation constants mod HashFunctions.MinHashPrime.
    * Requires `words` + `sh` (WordsCte, ShinglesCte) upstream.
    */
  val SigCte =
    s"""shposts AS (SELECT doc_id, unnest(shingles) AS word FROM sh
       |            WHERE len(shingles) > 0),
       |sig AS (
       |  SELECT doc_id, perm,
       |    min((((perm+1)*1299721 % 2147483629)
       |         * (${h60("word")} % 2147483629)
       |         + (perm*7919+104729) % 2147483629) % 2147483629) AS min_hash
       |  FROM shposts
       |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS perm) perms
       |  GROUP BY doc_id, perm)""".stripMargin

  /** DuckDB 32-bit SimHash CTE matching Dedup.simHashes. */
  val SimHashCte =
    s"""hashed AS (
       |  SELECT doc_id, list_transform(tokens, t -> ${h60("t")}) AS hashes
       |  FROM toks WHERE len(tokens) > 0),
       |votes AS (
       |  SELECT doc_id, b, sum(((h >> b) & 1)*2 - 1) AS v
       |  FROM (SELECT doc_id, unnest(hashes) AS h FROM hashed) eh
       |  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) bits
       |  GROUP BY doc_id, b),
       |simhash AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)
       |      AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id)""".stripMargin

  /** DuckDB left-fold double dot product matching Knn.cosine's
    * `aggregate` (list_reduce starts from the first element, which equals
    * a 0.0-seeded fold for IEEE addition).
    */
  def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), " +
      s"ii -> CAST($a[ii] AS DOUBLE) * CAST($b[ii] AS DOUBLE)), " +
      "(acc, el) -> acc + el)"

  def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  /** Closed-form replay of the q72/q142 REAL-embedding fixture: BMP
    * pixel (x, y) of doc `id` is `(id·2654435761 + 7x + 131y) mod 2²⁴`
    * (what `Multimodal.syntheticBmp` paints and the JDK decoder reads
    * back losslessly), gray = integer mean of the sRGB channels, 16
    * equal bins, embedding = per-bin pixel mass as FLOAT (the same
    * double-divide-then-float-cast as `histEmbedBytes`). Provides
    * `bfull` (id, npx, bin, cnt) and `emb` (id, embedding).
    */
  val HistEmbCte =
    """px AS (
      |  SELECT d.doc_id AS id,
      |    CAST((d.doc_id % 13 + 1) * (d.doc_id % 7 + 1) AS BIGINT) AS npx,
      |    (d.doc_id * 2654435761 + x.x * 7 + y.y * 131) % 16777216 AS v
      |  FROM documents d,
      |    unnest(generate_series(0, d.doc_id % 13)) AS x(x),
      |    unnest(generate_series(0, d.doc_id % 7)) AS y(y)
      |  WHERE d.doc_id IS NOT NULL),
      |hist AS (
      |  SELECT id, npx,
      |    (((v // 65536) + ((v // 256) % 256) + (v % 256)) // 3) // 16 AS bin,
      |    count(*) AS cnt
      |  FROM px GROUP BY id, npx, bin),
      |bfull AS (
      |  SELECT ids.id, ids.npx, CAST(b.bin AS BIGINT) AS bin,
      |    coalesce(h.cnt, 0) AS cnt
      |  FROM (SELECT DISTINCT id, npx FROM px) ids
      |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bin) b
      |  LEFT JOIN hist h ON h.id = ids.id AND h.bin = b.bin),
      |emb AS (
      |  SELECT id, list(CAST(CAST(cnt AS DOUBLE) / npx AS FLOAT)
      |    ORDER BY bin) AS embedding
      |  FROM bfull GROUP BY id)""".stripMargin

  /** DuckDB sign-random-projection bucket matching Knn.lshBucket. */
  def duckProj(t: Int, p: Int, vec: String): String =
    s"list_reduce(list_transform(generate_series(1, len($vec)), " +
      s"ii -> CAST($vec[ii] AS DOUBLE) * " +
      s"((('0x'||substr(md5('plane:$t:$p:'||(ii-1)),1,15))::BIGINT " +
      s"% 1000000 - 500000)::DOUBLE / 1000000.0)), (acc, el) -> acc + el)"

  def duckBucket(t: Int, planes: Int, vec: String): String =
    (0 until planes)
      .map(p => s"(CASE WHEN ${duckProj(t, p, vec)} > 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("CAST((", " + ", ") AS BIGINT)")

  /** DuckDB 3-word shingles matching TextFunctions.wordShingles(_, 3). */
  val ShinglesCte =
    """sh AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(1, len(ws) - 2)),
      |      i -> array_to_string(ws[i:i+2], ' '))) AS shingles
      |  FROM words WHERE len(ws) > 0
      |)""".stripMargin

  /** Shared by q162 (streamingLshGate broadcast shape) and q163 (lshGate
    * shuffle shape): the q105 banded-collision hit set, anti-joined —
    * a src0 doc survives the ingest gate iff it shares no LSH band with
    * any indexed (non-src0) document.
    */
  lazy val LshGateOracle =
    s"""WITH $WordsCte,
       |$ShinglesCte,
       |$SigCte,
       |banded AS (
       |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
       |    list(min_hash ORDER BY perm) AS band_key
       |  FROM sig GROUP BY doc_id, band),
       |src AS (SELECT doc_id, source FROM documents),
       |hit AS (
       |  SELECT DISTINCT a.doc_id
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |  JOIN src sa ON sa.doc_id = a.doc_id
       |  JOIN src sb ON sb.doc_id = b.doc_id
       |  WHERE sa.source = 'src0' AND sb.source <> 'src0')
       |SELECT d.doc_id FROM documents d
       |WHERE d.source = 'src0'
       |  AND d.doc_id NOT IN (SELECT doc_id FROM hit)
       |ORDER BY doc_id""".stripMargin

  /** Shared by q31 (array formulation) and q38 (postings/UDAF
    * formulation) — both must reproduce the identical signature table.
    */
  /** Shared by q70 (columnar stub decode) and q95 (mapPartitions seam):
    * the two Spark paths are value-identical by construction.
    */
  val MmMetaOracle =
    """WITH h AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(hex(encode(text))), 1, 15))::BIGINT AS hv,
      |    encode(text) AS blob
      |  FROM documents)
      |SELECT doc_id AS id, 'image' AS modality,
      |  CAST(octet_length(blob) AS BIGINT) AS n_bytes,
      |  CAST(hv % 512 + 64 AS BIGINT) AS width,
      |  CAST((hv >> 9) % 512 + 64 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(0 AS BIGINT) AS duration_ms
      |FROM h ORDER BY id""".stripMargin

  val MinHashSigOracle =
    s"""WITH $WordsCte,
       |$ShinglesCte,
       |$SigCte
       |SELECT doc_id, CAST(perm AS BIGINT) AS perm, min_hash
       |FROM sig ORDER BY doc_id, perm""".stripMargin

  /** Shared by q40 (Column API) and q132 (SQL-text registry path). */
  lazy val KnnBruteOracle =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id, ${duckCos("qv", "cv")} AS cosine
       |  FROM c CROSS JOIN q WHERE query_id != neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Shared by q41 (Column API) and q131 (SQL-text registry path). */
  lazy val SrpBucketsOracle =
    s"""WITH b AS (
       |  SELECT vec_id, 0 AS htable, ${duckBucket(0, 4, "embedding")} AS bucket
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id, 1 AS htable, ${duckBucket(1, 4, "embedding")} AS bucket
       |  FROM embeddings)
       |SELECT vec_id, CAST(htable AS BIGINT) AS htable, bucket
       |FROM b ORDER BY vec_id, htable""".stripMargin

  /** Shared by q33 (DataFrame formulation) and q55 (SQL-text entry path
    * through the registered native kernels) — identical SimHash table.
    */
  /** Shared by q101 (Column API) and q123 (SQL-text registry path). */
  lazy val WinnowingOracle =
    s"""WITH $WordsCte,
       |canon AS (
       |  SELECT doc_id, array_to_string(ws, ' ') AS c FROM words
       |  WHERE doc_id IS NOT NULL),
       |grams AS (
       |  SELECT doc_id,
       |    CASE WHEN length(c) >= 5 THEN
       |      list_transform(range(0, length(c) - 5 + 1),
       |        p -> ('0x'||substr(md5(substr(c, p + 1, 5)),1,15))::BIGINT)
       |    ELSE CAST([] AS BIGINT[]) END AS h
       |  FROM canon),
       |fps AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(h) > 0 THEN
       |      list_transform(range(0, greatest(len(h) - 4, 0) + 1),
       |        i -> list_min(h[(i+1):(i+4)]))
       |    ELSE CAST([] AS BIGINT[]) END)) AS fingerprint
       |  FROM grams)
       |SELECT doc_id, fingerprint FROM fps
       |ORDER BY doc_id, fingerprint""".stripMargin

  /** Shared by q99 (Column API) and q125 (SQL-text registry path). */
  lazy val CleanTextOracle =
    s"""SELECT doc_id,
       |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
       |    '[\\x00-\\x08\\x0e-\\x1f\\x7f]', '', 'g'),
       |    '[$WsClass]+', ' ', 'g')) AS clean_text,
       |  CAST(length(trim(regexp_replace(regexp_replace(nfc_normalize(text),
       |    '[\\x00-\\x08\\x0e-\\x1f\\x7f]', '', 'g'),
       |    '[$WsClass]+', ' ', 'g'))) AS BIGINT) AS clean_len
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Shared by q54 (Column API) and q124 (SQL-text registry path). */
  lazy val CharShinglesOracle =
    s"""WITH $WordsCte,
       |canon AS (SELECT doc_id, array_to_string(ws, ' ') AS c
       |          FROM words WHERE len(ws) > 0),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(1, length(c) - 4)),
       |    i -> substr(c, i, 5))) AS shl
       |  FROM canon)
       |SELECT doc_id, CAST(len(shl) AS BIGINT) AS n_shingles,
       |  md5(array_to_string(list_sort(shl), '|')) AS shingle_md5
       |FROM sh ORDER BY doc_id""".stripMargin

  /** The residual front half shared by q119/q128 (via [[IvfAdcCtes]])
    * and q135's sweep: coarse assign → residuals → residual-seeded
    * codebooks → codes, plus the probe-rank-carrying `probedr`.
    * Residual seeds skip vec_id < 16 — the centroid rows' residuals
    * are exactly zero (see `ivfAdcIndex`).
    */
  lazy val IvfAdcResidualBase =
    s"""cents AS (SELECT vec_id AS ccid, embedding AS ccvec
         |          FROM embeddings WHERE vec_id < 16),
         |ascored AS (
         |  SELECT e.vec_id, c.ccid,
         |    ${duckCos("e.embedding", "c.ccvec")} AS cos
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, ccid FROM (
         |    SELECT vec_id, ccid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, ccid) AS arn
         |    FROM ascored) x WHERE arn = 1),
         |resid AS (
         |  SELECT e.vec_id, a.ccid,
         |    [CAST(e.embedding[i] AS DOUBLE) - CAST(c.ccvec[i] AS DOUBLE)
         |     FOR i IN generate_series(1, len(e.embedding))] AS rv
         |  FROM embeddings e JOIN assigned a USING (vec_id)
         |  JOIN cents c USING (ccid)),
         |rseeds AS (SELECT vec_id AS cid, rv FROM resid
         |           WHERE vec_id >= 16 ORDER BY vec_id LIMIT 16),
         |cbr AS (
         |  SELECT s.sub, se.cid, se.rv[(s.sub*8+1):(s.sub*8+8)] AS cvec
         |  FROM rseeds se
         |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sub) s),
         |rdist AS (
         |  SELECT r.vec_id, c.sub, c.cid,
         |    list_reduce(list_prepend(0.0,
         |      [(r.rv[c.sub*8+p] - c.cvec[p])
         |        * (r.rv[c.sub*8+p] - c.cvec[p])
         |       FOR p IN generate_series(1, 8)]),
         |      (u, v) -> u + v) AS d2
         |  FROM resid r CROSS JOIN cbr c),
         |best AS (
         |  SELECT vec_id, sub, cid,
         |    row_number() OVER (PARTITION BY vec_id, sub
         |                       ORDER BY d2, cid) AS rn
         |  FROM rdist),
         |codes AS (SELECT vec_id, sub, cid FROM best WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 20),
         |probedr AS (
         |  SELECT query_id, ccid, pr FROM (
         |    SELECT query_id, c.ccid,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY ${duckCos("qv", "c.ccvec")} DESC, c.ccid) AS pr
         |    FROM q CROSS JOIN cents c) y),
         |qresid AS (
         |  SELECT p.query_id, p.ccid, p.pr,
         |    [CAST(qq.qv[i] AS DOUBLE) - CAST(c.ccvec[i] AS DOUBLE)
         |     FOR i IN generate_series(1, len(qq.qv))] AS qrv
         |  FROM probedr p JOIN q qq USING (query_id)
         |  JOIN cents c USING (ccid)),
         |qdist AS (
         |  SELECT qr.query_id, qr.ccid, qr.pr, c.sub, c.cid,
         |    list_reduce(list_prepend(0.0,
         |      [(qr.qrv[c.sub*8+p] - c.cvec[p])
         |        * (qr.qrv[c.sub*8+p] - c.cvec[p])
         |       FOR p IN generate_series(1, 8)]),
         |      (u, v) -> u + v) AS d2
         |  FROM qresid qr CROSS JOIN cbr c)""".stripMargin

  /** q119's full CTE chain over the RESIDUAL form (Jégou §III-A):
    * [[IvfAdcResidualBase]] + nprobe=2 candidates, per-cell residual
    * ADC, rank — shared with q128's recall readout.
    */
  lazy val IvfAdcCtes =
    s"""$IvfAdcResidualBase,
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id, a.ccid
         |  FROM probedr p JOIN assigned a ON p.ccid = a.ccid
         |  WHERE p.pr <= 2 AND query_id != a.vec_id),
         |adc AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    list_reduce(list_prepend(0.0, list(qd.d2 ORDER BY co.sub)),
         |      (u, v) -> u + v) AS adc
         |  FROM cand
         |  JOIN codes co ON co.vec_id = cand.neighbor_id
         |  JOIN qdist qd ON qd.query_id = cand.query_id
         |    AND qd.ccid = cand.ccid
         |    AND qd.sub = co.sub AND qd.cid = co.cid
         |  GROUP BY cand.query_id, cand.neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc, neighbor_id) AS BIGINT) AS rank
         |  FROM adc)""".stripMargin

  val SimHashOracle =
    s"""WITH $ToksCte,
       |$SimHashCte
       |SELECT doc_id, simhash FROM simhash ORDER BY doc_id""".stripMargin

  /** Shared by q34 (all-pairs-within-block verifier) and q65 (pigeonhole
    * banding) — the two formulations must emit the identical pair set,
    * which is exactly what gating both on one oracle proves.
    */
  val SimHashNearDupOracle =
    s"""WITH $ToksCte,
       |$SimHashCte,
       |sims AS (
       |  SELECT s.doc_id, s.simhash, d.source
       |  FROM simhash s JOIN documents d ON s.doc_id = d.doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sims a JOIN sims b
       |  ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
       |ORDER BY id_a, id_b""".stripMargin

  /** Component = min reachable id over the symmetric q32 candidate
    * edges: the recursive closure, grouped to the per-node minimum.
    * Shared by q45 (hash-min propagation) and q69 (large-star/small-star
    * contraction) — both must produce the identical labeling.
    */
  /** Shared by q45/q69 (the labeling itself) and q87 (the keeper corpus
    * derived from it): everything up to the transitive closure `reach`.
    */
  lazy val ComponentsCtes =
    s"""$WordsCte,
       |$ShinglesCte,
       |$SigCte,
       |banded AS (
       |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
       |    list(min_hash ORDER BY perm) AS band_key
       |  FROM sig GROUP BY doc_id, band),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |edges2 AS (SELECT id_a AS s, id_b AS t FROM cand
       |           UNION ALL SELECT id_b, id_a FROM cand),
       |reach AS (
       |  SELECT s AS id, s AS comp FROM edges2
       |  UNION
       |  SELECT e.t AS id, r.comp FROM reach r JOIN edges2 e ON e.s = r.id)""".stripMargin

  lazy val NearDupComponentsOracle =
    s"""WITH RECURSIVE $ComponentsCtes
       |SELECT id AS doc_id, min(comp) AS component
       |FROM reach GROUP BY id
       |ORDER BY doc_id""".stripMargin

  lazy val CentroidClassifyOracle =
      s"""WITH x AS (
         |  SELECT vec_id, label, vec_id % 32 AS blk, CAST(i AS INT) - 1 AS i,
         |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS xi
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
         |  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
         |    AND label IS NOT NULL),
         |c1 AS (
         |  SELECT label, blk, i,
         |    list_reduce(list(xi ORDER BY vec_id), (u, w) -> u + w) AS s
         |  FROM x GROUP BY 1, 2, 3),
         |csum AS (
         |  SELECT label, i,
         |    list_reduce(list(s ORDER BY blk), (u, w) -> u + w) AS s
         |  FROM c1 GROUP BY 1, 2),
         |cn AS (
         |  SELECT label, count(DISTINCT vec_id) AS n FROM x GROUP BY 1),
         |cent AS (
         |  SELECT label, list(s / n ORDER BY i) AS cvec
         |  FROM csum JOIN cn USING (label) GROUP BY label),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 20),
         |scored AS (
         |  SELECT query_id, label, ${duckCos("qv", "cvec")} AS cos
         |  FROM q CROSS JOIN cent),
         |best AS (
         |  SELECT query_id, label, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, label) AS rn
         |  FROM scored)
         |SELECT query_id, CAST(label AS BIGINT) AS pred_label,
         |  round(cos, 6) + 0 AS cos
         |FROM best WHERE rn = 1 ORDER BY query_id""".stripMargin

  /** DuckDB replica of [[graft.operators.Bpe.encodeSymbols]]: nested
    * left-to-right merge folds over the `syms` column, innermost fold =
    * rank-1 merge.
    */
  def duckBpeFolds(merges: Seq[(String, String)]): String =
    merges.foldLeft("syms") { case (inner, (l, r)) =>
      s"""list_reduce(list_transform($inner, s -> [s]),
         |  (acc, x) -> CASE WHEN acc[-1] = '$l' AND x[1] = '$r'
         |    THEN list_append(list_slice(acc, 1, len(acc) - 1), '$l$r')
         |    ELSE list_append(acc, x[1]) END)""".stripMargin
    }
}