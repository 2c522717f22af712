package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC 1.0) record parsing — the distribution
  * format of Common Crawl and every archival crawler, i.e. the TRUE
  * first input of a web-scale pipeline (before even
  * [[graft.operators.Urls]] and HTML extraction: segment → records →
  * payloads).
  *
  * The parser is a real byte-level walk honoring `Content-Length`
  * framing (payloads may contain anything, including strings that look
  * like record boundaries — boundary-scanning parsers corrupt exactly
  * the documents worth keeping), the multimodal codec-seam pattern:
  * imperative JVM kernel behind a columnar `flatMap`, malformed input
  * degrades to the records parsed so far, never a partition-killing
  * throw. At 100 TB each executor walks its own segment files
  * independently — the format is embarrassingly splittable at segment
  * granularity (one crawl segment per input row/file).
  */
object Warc {

  /** One parsed record. `target_uri` is '' for record types that carry
    * no `WARC-Target-URI` header (warcinfo); `payload` is the exact
    * `Content-Length` byte slice, binary-safe.
    */
  case class WarcRec(id: Long, rec_idx: Long, warc_type: String,
                     target_uri: String, content_length: Long,
                     payload: Array[Byte])

  private val Magic = "WARC/1.0\r\n".getBytes("US-ASCII")

  // hoisted: per-record cost is matcher(), not a fresh NFA build
  private val CharsetRe = java.util.regex.Pattern
    .compile("(?im)^content-type:[^\\r\\n]*charset=\"?([A-Za-z0-9_.:-]+)\"?")

  /** Parse one WARC segment: records until the bytes stop conforming
    * (truncated payload, missing Content-Length, malformed header
    * line, wrong magic). Header names are case-insensitive per spec;
    * the inter-record `\r\n\r\n` trailer is consumed when present and
    * its absence ends the walk AFTER the completed record (a segment
    * whose final record lacks the trailer still yields that record).
    */
  def parseRecords(bytes: Array[Byte]): Seq[(Long, String, String, Long, Array[Byte])] = {
    val out = Seq.newBuilder[(Long, String, String, Long, Array[Byte])]
    var cur = 0
    var idx = 0L
    var ok = bytes != null
    while (ok && cur + Magic.length <= bytes.length) {
      var i = 0
      while (i < Magic.length && bytes(cur + i) == Magic(i)) i += 1
      if (i < Magic.length) { ok = false }
      else {
        cur += Magic.length
        // header lines until the blank line
        var warcType = ""
        var uri = ""
        var len = -1L
        var headersDone = false
        while (ok && !headersDone) {
          val eol = indexOfCrlf(bytes, cur)
          if (eol < 0) ok = false
          else if (eol == cur) { cur += 2; headersDone = true }
          else {
            val line = new String(bytes, cur, eol - cur, "US-ASCII")
            val colon = line.indexOf(':')
            if (colon <= 0) ok = false
            else {
              val name = line.substring(0, colon).trim.toLowerCase
              val value = line.substring(colon + 1).trim
              name match {
                case "warc-type" => warcType = value
                case "warc-target-uri" => uri = value
                case "content-length" =>
                  len = try value.toLong catch { case _: NumberFormatException => -1L }
                case _ => ()
              }
              cur = eol + 2
            }
          }
        }
        if (ok) {
          if (len < 0 || cur.toLong + len > bytes.length) ok = false
          else {
            val payload = java.util.Arrays.copyOfRange(bytes, cur,
              cur + len.toInt)
            out += ((idx, warcType, uri, len, payload))
            idx += 1
            cur += len.toInt
            // inter-record trailer; a missing one ends the walk after
            // the record just emitted
            if (cur + 4 <= bytes.length && bytes(cur) == '\r' &&
                bytes(cur + 1) == '\n' && bytes(cur + 2) == '\r' &&
                bytes(cur + 3) == '\n') cur += 4
            else ok = false
          }
        }
      }
    }
    out.result()
  }

  private def indexOfCrlf(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Does the segment start with the gzip magic? Real Common Crawl
    * ships `.warc.gz` where EVERY record is its own gzip member
    * (concatenated members per the WARC 1.1 annex), so gzip-vs-plain
    * is a per-segment property detectable from the first two bytes.
    */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** End offset of the gzip member header starting at `pos`, honoring
    * the RFC 1952 optional fields (FEXTRA/FNAME/FCOMMENT/FHCRC); -1
    * when the header is malformed or truncated.
    */
  private def gzipHeaderEnd(b: Array[Byte], pos: Int): Int = {
    if (pos + 10 > b.length) return -1
    if ((b(pos + 2) & 0xff) != 8) return -1 // CM: deflate only
    val flg = b(pos + 3) & 0xff
    var i = pos + 10
    if ((flg & 0x04) != 0) { // FEXTRA: 2-byte little-endian length
      if (i + 2 > b.length) return -1
      i += 2 + ((b(i) & 0xff) | ((b(i + 1) & 0xff) << 8))
      if (i > b.length) return -1
    }
    if ((flg & 0x08) != 0) { // FNAME: zero-terminated
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) return -1
      i += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT: zero-terminated
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) return -1
      i += 1
    }
    if ((flg & 0x02) != 0) { // FHCRC: 2 bytes
      i += 2
      if (i > b.length) return -1
    }
    i
  }

  /** Inflate a run of concatenated gzip members into one buffer —
    * Common Crawl's member-per-record layout concatenates to exactly
    * the plain WARC byte stream, so [[parseRecords]] runs unchanged on
    * the result. SALVAGE semantics, matching the plain parser's: a
    * truncated or corrupt member ends the walk AFTER the members
    * already inflated (never a partition-killing throw), and a member
    * whose deflate stream completed but whose 8-byte CRC/ISIZE trailer
    * was cut off still contributes its payload. Members are walked one
    * at a time with `Inflater(nowrap)` + explicit RFC 1952 header
    * parsing because `GZIPInputStream` buffers ahead and cannot report
    * the exact compressed extent of the member it just finished.
    */
  def gunzipMembers(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](16384)
    var pos = 0
    var ok = true
    while (ok && pos + 2 <= bytes.length &&
           (bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b) {
      val dataStart = gzipHeaderEnd(bytes, pos)
      if (dataStart < 0) ok = false
      else {
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(bytes, dataStart, bytes.length - dataStart)
        val member = new java.io.ByteArrayOutputStream()
        var truncated = false
        while (!inf.finished() && !truncated) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException =>
              truncated = true; 0 }
          if (n > 0) member.write(buf, 0, n)
          else if (!inf.finished()) truncated = true // input exhausted
        }
        if (truncated) ok = false
        else {
          out.write(member.toByteArray)
          // skip the CRC32+ISIZE trailer; a cut-off trailer means the
          // archive ends here, but the member's payload was complete
          pos = dataStart + inf.getBytesRead.toInt + 8
          if (pos > bytes.length) ok = false
        }
        inf.end()
      }
    }
    out.toByteArray
  }

  /** Columnar seam: `segments(id, content)` → one row per parsed
    * record. Pure per-row flatMap — no shuffle; the record fan-out is
    * bounded by the segment's own size. Gzipped segments (`.warc.gz`,
    * a gzip member per record — the format every real Common Crawl
    * archive ships in) are detected by magic and inflated first; plain
    * and gzipped segments can coexist in one DataFrame.
    */
  def records(segments: DataFrame): Dataset[WarcRec] = {
    val spark = segments.sparkSession
    import spark.implicits._
    segments.select("id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val parsed =
          try parseRecords(if (isGzip(bytes)) gunzipMembers(bytes)
                           else bytes)
          catch { case scala.util.control.NonFatal(_) => Seq.empty }
        parsed.iterator.map { case (i, t, u, n, p) =>
          WarcRec(id, i, t, u, n, p) }
      }
  }

  /** HTTP status code of a `response` record payload (a real crawl's
    * WARC response payload IS an HTTP response: status line, headers,
    * blank line, body). Null when the payload doesn't start with a
    * status line. Column chain over the payload AS TEXT — the HTML
    * path; binary bodies stay on the byte-level seam.
    */
  def httpStatus(payload: Column): Column = {
    // the code must END after three digits (space, CR, or end of
    // input): 'HTTP/1.1 9999' is malformed, not status 999. Spelled
    // as a consumed group, not a lookahead — RE2 has no lookarounds
    // (the portability discipline, even though no oracle replays this)
    val s = regexp_extract(payload, "^HTTP/[0-9.]+ ([0-9]{3})([ \\r]|$)", 1)
    when(s === "", lit(null).cast("long")).otherwise(s.cast("long"))
  }

  /** First value of HTTP header `name` (case-insensitive), searched
    * ONLY inside the header block (before the first blank line — a
    * body line that happens to start `Content-Type:` must not match).
    * '' when absent. `name` must be a literal header name (letters,
    * digits, hyphens), not a regex.
    */
  def httpHeader(payload: Column, name: String): Column = {
    require(name.matches("[A-Za-z0-9-]+"), s"not a header name: $name")
    val headers = regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1)
    // coalesce: a NULL payload means header-absent (''), the same
    // answer httpBody gives — not a null that silently falls out of
    // downstream === '' filters
    coalesce(
      regexp_extract(headers, s"(?im)^$name:[ \\t]*([^\\r\\n]*)", 1),
      lit(""))
  }

  /** Everything after the first blank line — the HTTP body. A payload
    * with no blank line yields '' (a headers-only or malformed
    * response has no body, and handing the headers to an HTML
    * extractor would be worse than handing it nothing).
    */
  def httpBody(payload: Column): Column =
    when(payload.rlike("(?s)\\r\\n\\r\\n"),
      regexp_replace(payload, "(?s)^.*?\\r\\n\\r\\n", ""))
      .otherwise(lit(""))

  /** HTTP body decoded by the response's OWN declared charset (the
    * `charset=` parameter of `Content-Type`; UTF-8 when absent or
    * unsupported) with malformed bytes replaced, never thrown — the
    * honest version of `payload.cast("string")`, which silently reads
    * every legacy-encoded page as UTF-8 mojibake. A real crawl is full
    * of ISO-8859-1/windows-1252 content; the transcode has to happen
    * HERE, before any text operator hashes the bytes. '' for null
    * payloads and for responses with no header/body split (headers
    * must never reach the text pipeline).
    */
  def decodeHttpBody(payload: Array[Byte]): String = {
    if (payload == null) return ""
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return ""
    val headers = new String(payload, 0, split, "US-ASCII")
    val m = CharsetRe.matcher(headers)
    val cs =
      try {
        val name = if (m.find()) m.group(1) else "UTF-8"
        if (java.nio.charset.Charset.isSupported(name))
          java.nio.charset.Charset.forName(name)
        else java.nio.charset.StandardCharsets.UTF_8
      } catch { case scala.util.control.NonFatal(_) =>
        java.nio.charset.StandardCharsets.UTF_8 }
    cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      .decode(java.nio.ByteBuffer.wrap(payload, split + 4,
        payload.length - split - 4))
      .toString
  }

  /** [[syntheticHttpWarc]]'s legacy-encoding twin: the body is REAL
    * ISO-8859-1 (accented characters as single high bytes that are
    * INVALID UTF-8), declared in the Content-Type header — a decoder
    * that ignores the declaration cannot round-trip it.
    */
  def syntheticLatin1Warc(id: Long): Array[Byte] = {
    val html = s"<html><body><p>Café naïve $id</p></body></html>"
    val htmlBytes = html.getBytes("ISO-8859-1")
    val httpHead = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      s"charset=iso-8859-1\r\nContent-Length: ${htmlBytes.length}\r\n\r\n")
      .getBytes("US-ASCII")
    val warcHead = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://site${id % 7}.example.com/l1/$id\r\n" +
      s"Content-Length: ${httpHead.length + htmlBytes.length}\r\n\r\n")
      .getBytes("US-ASCII")
    warcHead ++ httpHead ++ htmlBytes ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** Closed-form WARC segment whose response payloads are REAL HTTP
    * responses wrapping the caller's HTML — the full crawl-archive
    * shape (WARC framing → HTTP response → markup) for the
    * end-to-end q156 gate and any pipeline rehearsal.
    */
  def syntheticHttpWarc(id: Long, html: String): Array[Byte] = {
    // BYTE lengths and UTF-8 throughout: Content-Length counts octets,
    // and an ASCII-only encode would silently mangle non-ASCII HTML
    // into '?' bytes while keeping the framing accidentally consistent
    val htmlBytes = html.getBytes("UTF-8")
    val httpHead = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      s"charset=utf-8\r\nX-Doc: $id\r\nContent-Length: " +
      s"${htmlBytes.length}\r\n\r\n").getBytes("US-ASCII")
    val warcHead = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://site${id % 7}.example.com/p/$id\r\n" +
      s"Content-Length: ${httpHead.length + htmlBytes.length}\r\n\r\n")
      .getBytes("US-ASCII")
    warcHead ++ httpHead ++ htmlBytes ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** Closed-form WARC segment from an id — the q133/q134 fixture
    * convention (the parser reads spec framing it did not write): one
    * `warcinfo` record followed by `id % 3 + 1` `response` records
    * with deterministic URIs and payload text the oracle re-derives
    * from the id alone.
    */
  def syntheticWarc(id: Long): Array[Byte] =
    syntheticWarcRecords(id).reduce(_ ++ _)

  /** [[syntheticWarc]] as one byte array PER RECORD — the unit of
    * gzip-member compression in a real `.warc.gz`.
    */
  def syntheticWarcRecords(id: Long): Seq[Array[Byte]] = {
    def rec(tpe: String, uri: String, payload: String): Array[Byte] = {
      val sb = new StringBuilder
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: $tpe\r\n")
      if (uri.nonEmpty) sb.append(s"WARC-Target-URI: $uri\r\n")
      sb.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      sb.append(s"Content-Length: ${payload.length}\r\n")
      sb.append("\r\n")
      sb.append(payload)
      sb.append("\r\n\r\n")
      sb.toString.getBytes("US-ASCII")
    }
    val out = Seq.newBuilder[Array[Byte]]
    out += rec("warcinfo", "", "software: graft/1.0")
    var r = 0L
    while (r <= id % 3) {
      out += rec("response",
        s"http://site${(id + r) % 7}.example.com/page/$id-$r",
        s"payload $id $r " + "a" * ((id + r) % 23).toInt)
      r += 1
    }
    out.result()
  }

  /** Gzipped crawl-archive segment for the q165 end-to-end chain: ONE
    * response record, member-per-record `.warc.gz` framing, carrying a
    * real HTTP response whose HTML wraps the caller's text in the
    * template shell (nav div + per-doc accent line + footer div).
    * Closed forms from `id`: host `site{id%7}.example.com`; path
    * `/private/{id}` when `id % 5 == 0` (the robots-gated slice) else
    * `/a/{id}`; body charset ISO-8859-1 when `id % 3 == 0` (the é is a
    * single 0xE9 byte — invalid UTF-8, so only a decoder that honors
    * the Content-Type declaration recovers it) else UTF-8.
    */
  def syntheticCrawlWarc(id: Long, text: String): Array[Byte] = {
    val html = "<html><body><div>Home | About | Contact</div>" +
      s"<p>Resume $id é</p><p>$text</p>" +
      "<div>(c) 2026 Example Corp.</div></body></html>"
    val latin1 = id % 3 == 0
    val htmlBytes = html.getBytes(if (latin1) "ISO-8859-1" else "UTF-8")
    val path = if (id % 5 == 0) s"/private/$id" else s"/a/$id"
    val httpHead = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      s"charset=${if (latin1) "iso-8859-1" else "utf-8"}\r\n" +
      s"Content-Length: ${htmlBytes.length}\r\n\r\n").getBytes("US-ASCII")
    val warcHead = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://site${id % 7}.example.com$path\r\n" +
      s"Content-Length: ${httpHead.length + htmlBytes.length}\r\n\r\n")
      .getBytes("US-ASCII")
    gzipMember(warcHead ++ httpHead ++ htmlBytes ++
      "\r\n\r\n".getBytes("US-ASCII"))
  }

  /** One gzip member over `bytes` (RFC 1952, deflate). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** [[syntheticWarc]] in Common Crawl's real wire format: each WARC
    * record gzip-compressed as its own member, members concatenated —
    * byte-for-byte the `.warc.gz` layout, so the q161 gate proves the
    * reader handles the archives it was built for with the SAME
    * closed-form oracle as the plain q155.
    */
  def syntheticWarcGz(id: Long): Array[Byte] =
    syntheticWarcRecords(id).map(gzipMember).reduce(_ ++ _)
}
