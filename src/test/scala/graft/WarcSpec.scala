package graft

import graft.corpus.Warc

/** WARC byte-level parsing: Content-Length framing (not boundary
  * scanning), case-insensitive headers, malformed-input degradation.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def seg(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("parseRecords honors Content-Length framing through boundary-like payloads") {
    // the FIRST payload contains a byte-exact record header — a parser
    // that scans for boundaries instead of honoring Content-Length
    // would split the record in the middle and corrupt both
    val evil = "see WARC/1.0\r\nWARC-Type: fake\r\n inside"
    val s = "WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://a.com/x\r\nContent-Length: ${evil.length}\r\n" +
      s"\r\n$evil\r\n\r\n" +
      "WARC/1.0\r\ncontent-length: 2\r\nwarc-type: metadata\r\n\r\nhi\r\n\r\n"
    val recs = Warc.parseRecords(seg(s))
    assert(recs.map(r => (r._1, r._2, r._3, r._4)) == Seq(
      (0L, "response", "http://a.com/x", evil.length.toLong),
      (1L, "metadata", "", 2L))) // lowercase headers parse (spec: CI)
    assert(new String(recs(0)._5, "US-ASCII") == evil)
    assert(new String(recs(1)._5, "US-ASCII") == "hi")
  }

  test("malformed input degrades to the records parsed so far") {
    val good = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    // truncated payload: declared 100 bytes, 3 present
    assert(Warc.parseRecords(seg(good +
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 100\r\n\r\nabc"))
      .map(_._2) == Seq("response"))
    // missing Content-Length entirely
    assert(Warc.parseRecords(seg(good +
      "WARC/1.0\r\nWARC-Type: response\r\n\r\nabc\r\n\r\n"))
      .map(_._2) == Seq("response"))
    // header line with no colon
    assert(Warc.parseRecords(seg(good + "WARC/1.0\r\ngarbage line\r\n"))
      .map(_._2) == Seq("response"))
    // wrong magic / garbage / null / empty
    assert(Warc.parseRecords(seg("HTTP/1.1 200 OK\r\n")).isEmpty)
    assert(Warc.parseRecords(null).isEmpty)
    assert(Warc.parseRecords(Array.empty[Byte]).isEmpty)
    // a final record missing its \r\n\r\n trailer is still emitted
    assert(Warc.parseRecords(seg(
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nabc"))
      .map(r => new String(r._5, "US-ASCII")) == Seq("abc"))
  }

  test("http split: status, header-block-only headers, body after blank line") {
    import org.apache.spark.sql.functions.col
    def row(p: String): (Option[Long], String, String) = {
      val df = Seq(p).toDF("p").select(
        Warc.httpStatus(col("p")).as("st"),
        Warc.httpHeader(col("p"), "Content-Type").as("ct"),
        Warc.httpBody(col("p")).as("b"))
      val r = df.head()
      (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getString(1),
        r.getString(2))
    }
    // a body line that LOOKS like a header must not leak into the
    // header search (the block ends at the first blank line)
    val p1 = "HTTP/1.1 200 OK\r\nServer: x\r\n\r\n" +
      "Content-Type: not-a-header\nreal body"
    assert(row(p1) == ((Some(200L), "",
      "Content-Type: not-a-header\nreal body")))
    // case-insensitive header, multi-header block, 404 status
    val p2 = "HTTP/1.0 404 Not Found\r\ncontent-type: text/plain\r\n" +
      "X-A: 1\r\n\r\nbody"
    assert(row(p2) == ((Some(404L), "text/plain", "body")))
    // no blank line → no body (headers must never reach the extractor);
    // non-HTTP payload → null status
    assert(row("HTTP/1.1 200 OK\r\nHalf: header") == ((Some(200L), "", "")))
    assert(row("GIF89a binary stuff") == ((None, "", "")))
    // malformed status tokens must NOT truncate into plausible codes;
    // a reason-less status line is still valid
    assert(row("HTTP/1.1 9999 Weird\r\n\r\nb")._1.isEmpty)
    assert(row("HTTP/1.1 2000\r\n\r\nb")._1.isEmpty)
    assert(row("HTTP/1.1 204\r\n\r\n") == ((Some(204L), "", "")))
    // NULL payload: header lookup answers '' (absent), not null
    val nullRow = Seq(Option.empty[String]).toDF("p").select(
      Warc.httpHeader(col("p"), "Content-Type").as("ct"),
      Warc.httpBody(col("p")).as("b")).head()
    assert(nullRow.getString(0) == "" && nullRow.getString(1) == "")
  }

  test("decodeHttpBody honors the declared charset and degrades safely") {
    def p(head: String, bodyBytes: Array[Byte]): Array[Byte] =
      (head + "\r\n\r\n").getBytes("US-ASCII") ++ bodyBytes
    // declared latin-1: 0xE9 is é there and INVALID UTF-8 — only a
    // declaration-honoring decoder round-trips it
    val latin = p("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=iso-8859-1", "Café".getBytes("ISO-8859-1"))
    assert(Warc.decodeHttpBody(latin) == "Café")
    // no charset declared → UTF-8
    assert(Warc.decodeHttpBody(p("HTTP/1.1 200 OK",
      "Café".getBytes("UTF-8"))) == "Café")
    // unsupported charset name → UTF-8 fallback, not a throw
    assert(Warc.decodeHttpBody(p("HTTP/1.1 200 OK\r\nContent-Type: " +
      "text/html; charset=not-a-charset", "ok".getBytes("UTF-8"))) == "ok")
    // invalid bytes under the chosen charset → replacement, not a throw
    assert(Warc.decodeHttpBody(p("HTTP/1.1 200 OK",
      Array(0xE9.toByte))) == "�")
    // no header/body split, and null → ''
    assert(Warc.decodeHttpBody("no split here".getBytes("US-ASCII")) == "")
    assert(Warc.decodeHttpBody(null) == "")
  }

  test("gzipped segments: member-per-record inflation matches the plain parse") {
    // the .warc.gz layout — every record its own gzip member — must
    // round-trip to byte-identical records
    for (id <- Seq(5L, 9L, 14L)) {
      val plain = Warc.parseRecords(Warc.syntheticWarc(id))
      val gz = Warc.parseRecords(Warc.gunzipMembers(Warc.syntheticWarcGz(id)))
      assert(gz.map(r => (r._1, r._2, r._3, r._4)) ==
        plain.map(r => (r._1, r._2, r._3, r._4)))
      assert(gz.map(r => new String(r._5, "US-ASCII")) ==
        plain.map(r => new String(r._5, "US-ASCII")))
    }
  }

  test("gzip salvage: a truncated member degrades to the records inflated so far") {
    val members = Warc.syntheticWarcRecords(8L).map(Warc.gzipMember)
    val full = members.reduce(_ ++ _)
    // cut the LAST member in half: the first three records survive
    val cut = full.dropRight(members.last.length / 2 + 4)
    val recs = Warc.parseRecords(Warc.gunzipMembers(cut))
    assert(recs.length == members.length - 1)
    // a member whose deflate data completed but whose 8-byte trailer
    // was cut off still contributes its payload
    val trailerCut = full.dropRight(3)
    assert(Warc.parseRecords(Warc.gunzipMembers(trailerCut)).length ==
      members.length)
    // garbage after the magic → no members, no throw
    assert(Warc.gunzipMembers(Array(0x1f.toByte, 0x8b.toByte, 0x00.toByte))
      .isEmpty)
  }

  test("records seam handles mixed plain and gzipped segments in one frame") {
    val segs = Seq(
      (7L, Warc.syntheticWarc(7L)),        // plain
      (8L, Warc.syntheticWarcGz(8L)))      // member-per-record gzip
      .toDF("id", "content")
    val recs = Warc.records(segs).collect().sortBy(r => (r.id, r.rec_idx))
    assert(recs.count(_.id == 7L) == 3 && recs.count(_.id == 8L) == 4)
    val r81 = recs.find(r => r.id == 8L && r.rec_idx == 1L).get
    assert(r81.target_uri == "http://site1.example.com/page/8-0")
    assert(new String(r81.payload, "US-ASCII") == "payload 8 0 " + "a" * 8)
  }

  test("records seam parses the synthetic fixture and composes with extraction") {
    val segs = Seq(7L, 8L).toDF("id")
      .as[Long].map(id => (id, Warc.syntheticWarc(id)))
      .toDF("id", "content")
    val recs = Warc.records(segs).collect().sortBy(r => (r.id, r.rec_idx))
    // id=7 → 7%3+1 = 2 responses + warcinfo; id=8 → 3 responses
    assert(recs.count(_.id == 7L) == 3 && recs.count(_.id == 8L) == 4)
    assert(recs.filter(_.id == 7L).map(_.warc_type).toSeq ==
      Seq("warcinfo", "response", "response"))
    val r71 = recs.find(r => r.id == 7L && r.rec_idx == 1L).get
    assert(r71.target_uri == "http://site0.example.com/page/7-0")
    assert(new String(r71.payload, "US-ASCII") ==
      "payload 7 0 " + "a" * 7)
    assert(r71.content_length == r71.payload.length.toLong)
  }
}
