package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.Skew

class MultimodalSkewSpec extends SparkSpec {
  import spark.implicits._

  test("columnar stub decode and mapPartitions decode agree") {
    val docs = Seq((1L, "hello world"), (2L, "another payload"), (3L, ""))
      .toDF("doc_id", "text")
    val assets = Multimodal.asBinaryAssets(docs, "doc_id", "text", "image")
    val columnar = Multimodal.stubDecodeMeta(assets)
      .select("id", "n_bytes", "width", "height", "channels", "duration_ms")
      .as[(Long, Long, Int, Int, Int, Long)].collect().toSet
    val imperative = Multimodal.decodePartitions(assets)
      .map(m => (m.id, m.nBytes, m.width, m.height, m.channels, m.durationMs))
      .collect().toSet
    assert(columnar == imperative,
      "the codegen'd metadata path and the per-partition decode seam must " +
        "derive identical values from the same bytes")
  }

  test("frame sampling fans out one row per sampled timestamp") {
    val docs = Seq((3L, "video payload here")).toDF("doc_id", "text")
    val assets = Multimodal.asBinaryAssets(docs, "doc_id", "text", "video")
    val meta = Multimodal.stubDecodeMeta(assets)
      .select("id", "duration_ms").as[(Long, Long)].head()
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000L)
      .select("frame_ts_ms").as[Long].collect().toSeq
    val expected = 0L.until(meta._2, 1000L)
    assert(frames == expected)
  }

  test("salted join returns exactly the plain join's rows") {
    val hot = (1 to 500).map(i => ("hotkey", i.toLong)) ++
      Seq(("cold", 1000L))
    val skewed = hot.toDF("k", "row_id")
    val dim = Seq(("hotkey", "H"), ("cold", "C"), ("unused", "U"))
      .toDF("k", "label")
    val plain = skewed.join(dim, "k")
      .select("k", "row_id", "label").as[(String, Long, String)]
      .collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"),
      saltBy = col("row_id"), salts = 8)
      .select("k", "row_id", "label").as[(String, Long, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
  }

  test("flagship entry query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
