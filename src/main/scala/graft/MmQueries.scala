package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.functions.{GraftFunctions, HashFunctions, TextAnalysis, TextFunctions}
import graft.operators.{Bpe, CountMin, Decontaminate, Dedup, Jaccard, Kmv, Knn, Pca, Pq, QualityLr, Scrub, TemporalJoins}
import graft.QShared._

/** Multimodal: container metadata (bmp/wav/mp4/avi), real pixel/sample/frame decode (incl. mjpeg), resize, histogram embeddings, frame sampling, and the decode seams — one registry slice of [[SparkEntry]]
  * (queries and their DuckDB oracles; see SparkEntry for the
  * hash-parity conventions every entry follows).
  */
private[graft] object MmQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- multimodal metadata plumbing (stub decode)
    "q71_mm_frames" -> ((s, dir) => {
      // mixed-modality view of the documents fixture: every third doc is
      // treated as video; frame-sample those at 5 s
      val assets = graft.multimodal.Multimodal.asBinaryAssets(
        t(s, dir, "documents"), "doc_id", "text",
        when(col("doc_id") % 3 === 0, lit("video")).otherwise(lit("image")))
      graft.multimodal.Multimodal.sampleFrames(assets, everyMs = 5000L)
        .orderBy("id", "frame_ts_ms")
    }),
    // full multimodal -> ANN composition, REAL features end to end
    // (round 10): BMP fixtures decode through the JDK reader, the
    // 16-bin grayscale histogram of the DECODED PIXELS is the
    // embedding (histEmbedBytes — the honest version of the stubEmbed
    // seam), and the IVF index runs over it. The oracle re-derives the
    // histograms from the closed-form pixel formula and replays the
    // whole search — a stub fallback would hash-fail
    "q72_mm_embed_knn" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "image", graft.multimodal.Multimodal.syntheticBmp(
          id, (id % 13 + 1).toInt, (id % 7 + 1).toInt))
      }.toDF("id", "modality", "content")
      val embs = graft.multimodal.Multimodal.embedPartitions(assets, dim = 16)
      // id < 8 predicate mirrors the oracle (see q43 note)
      val cents = embs.filter(col("id") < 8)
        .select(col("id").as("cid"), col("embedding").as("cvec"))
      Knn.ivfTopK(embs, embs.filter(col("id") < 10), cents,
        "id", "embedding", k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // stub resize: byte-budget plumbing (target w*h*c capped by source)
    "q73_mm_resize" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.asBinaryAssets(
        t(s, dir, "documents"), "doc_id", "text",
        when(col("doc_id") % 4 === 0, lit("audio")).otherwise(lit("image")))
      graft.multimodal.Multimodal.stubResize(assets, w = 8, h = 6)
        .orderBy("id")
    }),
    "q70_mm_meta" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.asBinaryAssets(
        t(s, dir, "documents"), "doc_id", "text", "image")
      graft.multimodal.Multimodal.stubDecodeMeta(assets)
        .select(col("id"), col("modality"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("duration_ms"))
        .orderBy("id")
    }),

    // the SAME metadata as q70, produced through the imperative
    // mapPartitions decoder seam (decodePartitions + stubDecodeBytes)
    // instead of the columnar stubDecodeMeta projection — the two paths
    // are value-identical by construction, so q70's oracle gates the
    // seam a real codec would plug into
    "q95_mm_decode_seam" -> ((s, dir) => {
      val assets = graft.multimodal.Multimodal.asBinaryAssets(
        t(s, dir, "documents"), "doc_id", "text", "image")
      graft.multimodal.Multimodal.decodePartitions(assets).toDF()
        .select(col("id"), col("modality"), col("nBytes").as("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("durationMs").as("duration_ms"))
        .orderBy("id")
    }),

    // REAL image decode through the decodePartitions seam: BMPs
    // synthesized per doc_id (JDK ImageIO writer), decoded by the JDK
    // ImageIO reader — width/height/channels come from decoded pixels,
    // and the oracle predicts them (plus the closed-form BI_RGB byte
    // size) straight from doc_id, so a stub fallback would hash-fail
    "q122_mm_real_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        val w = (id % 13 + 1).toInt
        val h = (id % 7 + 1).toInt
        (id, "image", graft.multimodal.Multimodal.syntheticBmp(id, w, h))
      }.toDF("id", "modality", "content")
        .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      graft.multimodal.Multimodal
        .decodePartitions(assets, graft.multimodal.Multimodal.imageDecodeBytes)
        .toDF()
        .select(col("id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"), col("nBytes").as("n_bytes"))
        .orderBy("id")
    }),

    // REAL audio metadata at the codec seam (the q122 pattern): hand-
    // assembled RIFF fixtures whose closed-form header fields the oracle
    // predicts from doc_id — the JDK AudioSystem parser must actually
    // read them (the md5-derived stub could never hash-match)
    "q133_mm_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "audio", graft.multimodal.Multimodal.syntheticWav(id))
      }.toDF("id", "modality", "content")
        .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      graft.multimodal.Multimodal
        .decodePartitions(assets, graft.multimodal.Multimodal.audioDecodeBytes)
        .toDF()
        .select(col("id"), col("width").cast("long").as("sample_rate"),
          col("height").cast("long").as("bits"),
          col("channels").cast("long").as("channels"),
          col("durationMs").as("duration_ms"), col("nBytes").as("n_bytes"))
        .orderBy("id")
    }),
    // REAL video-container metadata: hand-assembled ISO-BMFF fixtures
    // (ftyp + moov(mvhd + trak(tkhd))) parsed by the pure-JVM box walk —
    // dimensions/duration/track-count from actual spec offsets
    "q134_mm_mp4_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "video", graft.multimodal.Multimodal.syntheticMp4(id))
      }.toDF("id", "modality", "content")
        .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      graft.multimodal.Multimodal
        .decodePartitions(assets, graft.multimodal.Multimodal.videoDecodeBytes)
        .toDF()
        .select(col("id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("n_tracks"),
          col("durationMs").as("duration_ms"), col("nBytes").as("n_bytes"))
        .orderBy("id")
    }),
    // REAL video FRAME decode (closing the one documented stub): an
    // uncompressed-DIB AVI needs no codec library — the pure-JVM
    // RIFF/AVI walk extracts actual frame rasters, and every frame's
    // exact grayscale sum is re-derived by the oracle from the
    // closed-form pixel formula (id, frame, x, y) → rgb
    "q144_mm_avi_frames" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "video", graft.multimodal.Multimodal.syntheticAvi(id))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.frameGraySums(assets)
        .toDF()
        .orderBy("id", "frame_idx")
    }),
    // REAL MJPEG frame decode (the last documented codec stub): each
    // 00dc chunk is a standalone baseline JPEG, decoded by the same
    // ImageIO path as still images. Uniform-gray frames at quality 1.0
    // round-trip bit-exactly (constant block = DC only, Y = gray
    // value), so the oracle predicts every frame's sum as w·h·gray
    "q164_mm_mjpeg_frames" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "video", graft.multimodal.Multimodal.syntheticMjpegAvi(id))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.frameGraySums(assets)
        .toDF()
        .orderBy("id", "frame_idx")
    }),

    // REAL frame sampling: every 2nd frame decodes, the rest only walk
    // container headers (the bounded-decode-cost shape of a 100 TB
    // video pipeline); frame_idx keeps the original index, and the
    // oracle is q144's restricted to the sampled frames
    "q146_mm_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "video", graft.multimodal.Multimodal.syntheticAvi(id))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.frameGraySums(assets, everyNth = 2)
        .toDF()
        .orderBy("id", "frame_idx")
    }),

    // REAL image resize (the honest version of q73's byte-budget
    // stub): decode → deterministic nearest-neighbor resample →
    // exact grayscale sum of the RESIZED raster, every value
    // re-derived by the oracle from the closed-form pixel formula
    // through the same integer source-pixel mapping
    "q147_mm_real_resize" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "image", graft.multimodal.Multimodal.syntheticBmp(
          id, (id % 13 + 1).toInt, (id % 7 + 1).toInt))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.resizeGraySums(assets, outW = 8, outH = 6)
        .toDF()
        .orderBy("id")
    }),

    // REAL audio SAMPLE decode (completing the modality trio: q142
    // image pixels, q144 video frames, here PCM samples): the JDK
    // AudioSystem stream decodes the WAV fixtures' 16-bit frames and
    // every window's exact |sample| sum is re-derived by the oracle
    // from syntheticWav's closed-form sample formula
    "q145_mm_audio_energy" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "audio", graft.multimodal.Multimodal.syntheticWav(id))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.audioEnergyWindows(assets,
        windowFrames = 16)
        .toDF()
        .orderBy("id", "window_idx")
    }),

    // REAL pixel-derived features at the embed seam (the q122/q133
    // fixture pattern): BMPs decode through the JDK reader and the
    // 16-bin grayscale histogram comes from the DECODED raster; the
    // oracle re-derives every bin count from the closed-form pixel
    // formula (id, x, y) → rgb, so the hash-derived stub could never
    // match. Output: one row per (id, bin) with the normalized mass
    "q142_mm_real_embed" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "documents")
        .where(col("doc_id").isNotNull).select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        (id, "image", graft.multimodal.Multimodal.syntheticBmp(
          id, (id % 13 + 1).toInt, (id % 7 + 1).toInt))
      }.toDF("id", "modality", "content")
      graft.multimodal.Multimodal.embedPartitions(assets, dim = 16)
        .select(col("id"), posexplode(col("embedding")).as(Seq("bin", "f")))
        .select(col("id"), col("bin").cast("long").as("bin"),
          round(col("f").cast("double"), 6).as("frac"))
        .orderBy("id", "bin")
    }),
  )

  val oracles: Map[String, String] = Map(
    // hex of a byte-slice is a prefix of the full hex (2 chars/byte), so
    // the sliced blob's md5 gates without blob substring support
    "q73_mm_resize" ->
      """WITH a AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id % 4 = 0 THEN 'audio' ELSE 'image' END AS modality,
        |    encode(text) AS blob
        |  FROM documents),
        |b AS (
        |  SELECT id, CASE WHEN modality = 'image' THEN 3 ELSE 1 END AS c,
        |    octet_length(blob) AS nb, hex(blob) AS hx
        |  FROM a),
        |r AS (SELECT id, c, least(c * 48, nb) AS n_out, hx FROM b)
        |SELECT id, CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
        |  CAST(c AS BIGINT) AS channels, CAST(n_out AS BIGINT) AS n_bytes_out,
        |  md5(substr(hx, 1, CAST(2 * n_out AS INT))) AS out_md5
        |FROM r ORDER BY id""".stripMargin,

    // REAL embeddings + IVF (round 10): the grayscale-histogram CTE
    // re-derives every embedding from the closed-form pixel formula,
    // then the q44 IVF shape replays the whole search
    "q72_mm_embed_knn" ->
      s"""WITH $HistEmbCte,
         |cents AS (SELECT id AS cid, embedding AS cvec FROM emb WHERE id < 8),
         |ascored AS (
         |  SELECT e.id, c.cid, ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM emb e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT id, cid FROM (
         |    SELECT id, cid, row_number() OVER (PARTITION BY id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM ascored) x WHERE rn = 1),
         |q AS (SELECT id AS query_id, embedding AS qv FROM emb WHERE id < 10),
         |probed AS (
         |  SELECT query_id, cid FROM (
         |    SELECT query_id, c.cid,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY ${duckCos("qv", "c.cvec")} DESC, c.cid) AS pr
         |    FROM q CROSS JOIN cents c) y WHERE pr <= 2),
         |cand AS (
         |  SELECT query_id, a.id AS neighbor_id
         |  FROM probed p JOIN assigned a ON p.cid = a.cid
         |  WHERE query_id != a.id),
         |rescored AS (
         |  SELECT query_id, neighbor_id,
         |    ${duckCos("qe.embedding", "ne.embedding")} AS cosine
         |  FROM cand JOIN emb qe ON cand.query_id = qe.id
         |  JOIN emb ne ON cand.neighbor_id = ne.id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM rescored)
         |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // ---- multimodal metadata oracle (stub decode is deterministic md5 math)
    "q71_mm_frames" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(hex(encode(text))), 1, 15))::BIGINT AS hv
        |  FROM documents WHERE doc_id % 3 = 0),
        |v AS (
        |  SELECT doc_id AS id, (hv >> 18) % 60000 AS duration_ms
        |  FROM h WHERE (hv >> 18) % 60000 > 0)
        |SELECT id, CAST(duration_ms AS BIGINT) AS duration_ms,
        |  CAST(unnest(generate_series(0, duration_ms - 1, 5000)) AS BIGINT)
        |    AS frame_ts_ms
        |FROM v ORDER BY id, frame_ts_ms""".stripMargin,

    "q70_mm_meta" -> MmMetaOracle,
    // same oracle: the mapPartitions seam must agree with the columnar
    // stub path row for row
    "q95_mm_decode_seam" -> MmMetaOracle,


    // the oracle predicts what REAL decoding must return: the synthetic
    // dims from doc_id, 3 bands (24-bit BMP), and the uncompressed
    // BI_RGB byte size 54 + h*ceil(3w/4)*4 — a stub fallback (md5-
    // derived 64..575 dims) could never match
    "q122_mm_real_decode" ->
      s"""SELECT doc_id AS id,
         |  CAST(doc_id % 13 + 1 AS BIGINT) AS width,
         |  CAST(doc_id % 7 + 1 AS BIGINT) AS height,
         |  CAST(3 AS BIGINT) AS channels,
         |  CAST(54 + (doc_id % 7 + 1)
         |    * (((doc_id % 13 + 1) * 3 + 3) // 4 * 4) AS BIGINT) AS n_bytes
         |FROM documents WHERE doc_id IS NOT NULL
         |ORDER BY id""".stripMargin,

    // q144's semantics restricted to the sampled frames
    "q146_mm_frame_sample" ->
      s"""WITH p AS (
         |  SELECT d.doc_id AS id, f.f AS frame_idx,
         |    CAST(d.doc_id % 8 + 2 AS BIGINT) AS width,
         |    CAST(d.doc_id % 5 + 2 AS BIGINT) AS height,
         |    (d.doc_id * 2654435761 + f.f * 1009 + x.x * 7 + y.y * 131)
         |      % 16777216 AS v
         |  FROM documents d,
         |    unnest(generate_series(0, d.doc_id % 4 + 1)) AS f(f),
         |    unnest(generate_series(0, d.doc_id % 8 + 1)) AS x(x),
         |    unnest(generate_series(0, d.doc_id % 5 + 1)) AS y(y)
         |  WHERE d.doc_id IS NOT NULL AND f.f % 2 = 0)
         |SELECT id, frame_idx, width, height,
         |  width * height AS n_px,
         |  CAST(sum(((v // 65536) + ((v // 256) % 256) + (v % 256)) // 3)
         |    AS BIGINT) AS gray_sum
         |FROM p GROUP BY id, frame_idx, width, height
         |ORDER BY id, frame_idx""".stripMargin,

    // output pixel (x, y) reads source pixel (x·sw // 8, y·sh // 6) —
    // the same integer nearest-neighbor mapping as resizeGraySums,
    // composed with the q122/q142 closed-form source-pixel formula
    "q147_mm_real_resize" ->
      s"""WITH p AS (
         |  SELECT d.doc_id AS id,
         |    (d.doc_id * 2654435761
         |      + ((x.x * (d.doc_id % 13 + 1)) // 8) * 7
         |      + ((y.y * (d.doc_id % 7 + 1)) // 6) * 131) % 16777216 AS v
         |  FROM documents d,
         |    unnest(generate_series(0, 7)) AS x(x),
         |    unnest(generate_series(0, 5)) AS y(y)
         |  WHERE d.doc_id IS NOT NULL)
         |SELECT id, CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
         |  CAST(48 AS BIGINT) AS n_px,
         |  CAST(sum(((v // 65536) + ((v // 256) % 256) + (v % 256)) // 3)
         |    AS BIGINT) AS gray_sum
         |FROM p GROUP BY id
         |ORDER BY id""".stripMargin,

    // every window's |sample| sum re-derived from syntheticWav's
    // closed-form PCM formula (sample i of doc id is
    // (31·id + 7i) mod 2¹⁶ − 2¹⁵, interleaved over id%2+1 channels,
    // (id%50+1)·8 frames) — only a real sample decode can match
    "q145_mm_audio_energy" ->
      s"""WITH a AS (
         |  SELECT doc_id AS id,
         |    CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
         |    CAST((doc_id % 50 + 1) * 8 AS BIGINT) AS frames
         |  FROM documents WHERE doc_id IS NOT NULL),
         |s AS (
         |  SELECT id,
         |    (i.i // ch) // 16 AS window_idx,
         |    i.i // ch AS frame,
         |    abs((id * 31 + i.i * 7) % 65536 - 32768) AS a_s
         |  FROM a, unnest(generate_series(0, ch * frames - 1)) AS i(i))
         |SELECT id, CAST(window_idx AS BIGINT) AS window_idx,
         |  CAST(count(DISTINCT frame) AS BIGINT) AS n_frames,
         |  CAST(sum(a_s) AS BIGINT) AS abs_sum
         |FROM s GROUP BY id, window_idx
         |ORDER BY id, window_idx""".stripMargin,

    // every frame's gray sum re-derived from the closed-form pixel
    // formula — only REAL decoded frame rasters can match (sum of
    // BIGINT is HUGEINT in DuckDB, hence the cast)
    "q144_mm_avi_frames" ->
      s"""WITH p AS (
         |  SELECT d.doc_id AS id, f.f AS frame_idx,
         |    CAST(d.doc_id % 8 + 2 AS BIGINT) AS width,
         |    CAST(d.doc_id % 5 + 2 AS BIGINT) AS height,
         |    (d.doc_id * 2654435761 + f.f * 1009 + x.x * 7 + y.y * 131)
         |      % 16777216 AS v
         |  FROM documents d,
         |    unnest(generate_series(0, d.doc_id % 4 + 1)) AS f(f),
         |    unnest(generate_series(0, d.doc_id % 8 + 1)) AS x(x),
         |    unnest(generate_series(0, d.doc_id % 5 + 1)) AS y(y)
         |  WHERE d.doc_id IS NOT NULL)
         |SELECT id, frame_idx, width, height,
         |  width * height AS n_px,
         |  CAST(sum(((v // 65536) + ((v // 256) % 256) + (v % 256)) // 3)
         |    AS BIGINT) AS gray_sum
         |FROM p GROUP BY id, frame_idx, width, height
         |ORDER BY id, frame_idx""".stripMargin,

    // uniform gray frames: REAL JPEG decode must land exactly on the
    // closed form w·h·((id·2654435761 + 1009f) mod 256)
    "q164_mm_mjpeg_frames" ->
      """SELECT d.doc_id AS id, f.f AS frame_idx,
        |  CAST(d.doc_id % 8 + 2 AS BIGINT) AS width,
        |  CAST(d.doc_id % 5 + 2 AS BIGINT) AS height,
        |  CAST((d.doc_id % 8 + 2) * (d.doc_id % 5 + 2) AS BIGINT) AS n_px,
        |  CAST((d.doc_id % 8 + 2) * (d.doc_id % 5 + 2)
        |    * ((d.doc_id * 2654435761 + f.f * 1009) % 256) AS BIGINT)
        |    AS gray_sum
        |FROM documents d,
        |  unnest(generate_series(0, d.doc_id % 4 + 1)) AS f(f)
        |WHERE d.doc_id IS NOT NULL
        |ORDER BY id, frame_idx""".stripMargin,

    // every bin count re-derived from the closed-form pixel formula —
    // the REAL decoded raster must produce these masses
    "q142_mm_real_embed" ->
      s"""WITH $HistEmbCte
         |SELECT id, bin,
         |  round(CAST(CAST(CAST(cnt AS DOUBLE) / npx AS FLOAT) AS DOUBLE),
         |    6) AS frac
         |FROM bfull ORDER BY id, bin""".stripMargin,

    // the oracle predicts what REAL WAV header parsing must return —
    // the closed-form RIFF fields syntheticWav writes (8 kHz, 16-bit,
    // id-derived channels/frames); the stub's md5-derived values could
    // never match
    "q133_mm_wav_decode" ->
      s"""SELECT doc_id AS id,
         |  CAST(8000 AS BIGINT) AS sample_rate,
         |  CAST(16 AS BIGINT) AS bits,
         |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
         |  CAST(doc_id % 50 + 1 AS BIGINT) AS duration_ms,
         |  CAST(44 + (doc_id % 50 + 1) * 8 * (doc_id % 2 + 1) * 2
         |    AS BIGINT) AS n_bytes
         |FROM documents WHERE doc_id IS NOT NULL
         |ORDER BY id""".stripMargin,
    // closed-form ISO-BMFF fields syntheticMp4 writes: 16.16 fixed-point
    // presentation dims, mvhd duration at timescale 600, one track,
    // fixed 232-byte layout
    "q134_mm_mp4_decode" ->
      s"""SELECT doc_id AS id,
         |  CAST(doc_id % 640 + 16 AS BIGINT) AS width,
         |  CAST(doc_id % 360 + 16 AS BIGINT) AS height,
         |  CAST(1 AS BIGINT) AS n_tracks,
         |  CAST((doc_id % 120 + 1) * 1000 AS BIGINT) AS duration_ms,
         |  CAST(232 AS BIGINT) AS n_bytes
         |FROM documents WHERE doc_id IS NOT NULL
         |ORDER BY id""".stripMargin,
  )
}
