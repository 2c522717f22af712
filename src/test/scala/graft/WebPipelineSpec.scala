package graft

import org.apache.spark.sql.functions._

import graft.corpus.Warc
import graft.operators.{Robots, Urls}
import graft.pipeline.CurationPipeline

/** The full crawl-to-corpus chain composed end to end: hand-assembled
  * WARC segments (framing the parser did not write) → HTTP body split
  * → URL identity → robots gate → HTML extraction → template-line
  * dedup → curation. Each layer is oracle- or spec-gated on its own;
  * this proves they COMPOSE.
  */
class WebPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def seg(uri: String, html: String): Array[Byte] = {
    val body = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n")
      .getBytes("US-ASCII")
  }

  test("crawl archive to curated corpus: every web layer composes") {
    val art1 = "The engine reads the data and writes the result while " +
      "we keep this page because it is unique and long enough!"
    val art2 = "A private page that the robots policy forbids fetching " +
      "even though its text would otherwise pass every gate."
    val art3 = "Another public article about the sink and the source " +
      "that we keep because it is unique and long enough too?"
    def page(article: String): String =
      "<html><body><div>Home | About | Contact</div>" +
        s"<p>$article</p><div>(c) 2026 Example Corp.</div></body></html>"
    val segs = Seq(
      (1L, seg("http://site0.example.com/a/1", page(art1))),
      (2L, seg("http://site0.example.com/private/2", page(art2))),
      (3L, seg("http://site1.example.com/b/3", page(art3)))
    ).toDF("id", "content")

    // WARC → HTTP → URL identity
    val docs = Warc.records(segs).toDF()
      .filter(col("warc_type") === "response")
      .select(col("id"),
        Urls.host(col("target_uri")).as("host"),
        regexp_extract(col("target_uri"), "://[^/]*(/.*)$", 1).as("path"),
        Warc.httpBody(col("payload").cast("string")).as("text"))

    // robots: site0 forbids /private; site1 publishes no robots.txt
    val robots = Seq(("site0.example.com",
      "User-agent: *\nDisallow: /private\n")).toDF("host", "txt")
    val gated = Robots.gate(docs,
      Robots.rules(robots, "host", "txt", "graftbot").toDF(),
      "host", "path")
    assert(gated.filter(!col("allowed")).select("id").as[Long]
      .collect().toSeq == Seq(2L), "robots must block exactly /private/2")

    // HTML extraction + template-line dedup + curation over survivors
    val res = CurationPipeline.run(
      gated.filter(col("allowed")).select(col("id"), col("text")),
      "id", "text", languages = Set.empty, html = true,
      spanDedup = Some((4, 1L)),
      spanMode = CurationPipeline.SpanLines, stageCounts = true)
    val out = res.curated.select("id", "text")
      .as[(Long, String)].collect().toMap
    // the nav/footer template lines (df=2 > maxDf=1) are gone; the
    // article text survives VERBATIM (case and punctuation intact)
    assert(out == Map(1L -> art1, 3L -> art3), s"got $out")
    assert(res.counts("input") == 2L, s"got ${res.counts}")

    // PRODUCTION landing shape: extraction happens once, in the landing
    // write (landExtracted), and the cascade then runs html=false —
    // same curated corpus as the in-cascade html=true form above
    val landed = CurationPipeline.landExtracted(
      gated.filter(col("allowed")).select(col("id"), col("text")),
      "id", "text")
    // the landing table itself carries extracted text (no markup)
    assert(landed.filter(col("text").contains("<")).count() == 0L)
    val resLanded = CurationPipeline.run(landed, "id", "text",
      languages = Set.empty, html = false,
      spanDedup = Some((4, 1L)),
      spanMode = CurationPipeline.SpanLines)
    val outLanded = resLanded.curated.select("id", "text")
      .as[(Long, String)].collect().toMap
    assert(outLanded == out, s"landed shape diverged: $outLanded vs $out")
  }
}
