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

  test("decodePartitions drives a CUSTOM codec: per-partition instance, " +
    "sequential batch, real bytes") {
    // a stand-in for a native codec handle: the closure's counter is
    // task-deserialized, so each partition gets a FRESH instance — call
    // indices must restart at 0 in every partition. width := call index,
    // height := partition id, duration := payload length (proves the
    // actual bytes reach the codec).
    val docs = (0 until 64).map(i => (i.toLong, "p" * (i % 7 + 1)))
      .toDF("doc_id", "text").repartition(4)
    val assets = Multimodal.asBinaryAssets(docs, "doc_id", "text", "audio")
    val fakeCodec: (Array[Byte], String) => (Int, Int, Int, Long) = {
      val instanceCalls = new java.util.concurrent.atomic.AtomicInteger(0)
      (bytes, modality) => {
        val idx = instanceCalls.getAndIncrement()
        val pid = org.apache.spark.TaskContext.get().partitionId()
        (idx, pid, if (modality == "audio") 1 else -1, bytes.length.toLong)
      }
    }
    val out = Multimodal.decodePartitions(assets, fakeCodec).collect()
    assert(out.length == 64)
    // the custom fn (not the stub) decoded: payload length round-trips
    out.foreach { m => assert(m.durationMs == m.nBytes && m.channels == 1) }
    // one codec instance per partition, fed sequentially: every
    // partition's call indices are exactly 0..n-1 (a shared/global
    // instance would leave gaps; a per-row instance would repeat 0)
    val parts = out.groupBy(_.height)
    assert(parts.size > 1, "fixture must span multiple partitions")
    parts.foreach { case (pid, rows) =>
      assert(rows.map(_.width).sorted.toSeq == (0 until rows.length),
        s"partition $pid saw call indices ${rows.map(_.width).sorted.toSeq}")
    }
  }

  test("imageDecodeBytes decodes real BMP/PNG pixels; unknown codecs " +
    "fall back to the stub") {
    // real fixtures through the real JDK readers: dims/bands must come
    // from decoded pixels, not the content hash
    val bmp = Multimodal.syntheticBmp(42L, 9, 5)
    assert(Multimodal.imageDecodeBytes(bmp, "image") == ((9, 5, 3, 0L)))
    val png = {
      val img = new java.awt.image.BufferedImage(
        4, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(Multimodal.imageDecodeBytes(png, "image") == ((4, 6, 3, 0L)))
    // no registered reader → the deterministic stub, not a throw
    val garbage = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.imageDecodeBytes(garbage, "image") ==
      Multimodal.stubDecodeBytes(garbage, "image"))
    // non-image modalities never enter the codec
    assert(Multimodal.imageDecodeBytes(bmp, "audio") ==
      Multimodal.stubDecodeBytes(bmp, "audio"))

    // end-to-end through the mapPartitions seam: a mixed table of real
    // images and a garbage payload decodes without a partition throw
    val assets = spark.createDataFrame(Seq(
      (1L, "image", Multimodal.syntheticBmp(1L, 3, 2)),
      (2L, "image", Multimodal.syntheticBmp(2L, 7, 4)),
      (3L, "image", garbage)
    )).toDF("id", "modality", "content")
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
    val out = Multimodal
      .decodePartitions(assets, Multimodal.imageDecodeBytes)
      .collect().map(m => m.id -> ((m.width, m.height, m.channels)))
      .toMap
    assert(out(1L) == ((3, 2, 3)) && out(2L) == ((7, 4, 3)))
    val (gw, gh, gc, _) = Multimodal.stubDecodeBytes(garbage, "image")
    assert(out(3L) == ((gw, gh, gc)))
  }

  test("histEmbedBytes histograms REAL decoded pixels; stubEmbedBytes " +
    "matches the stubEmbed column; fallbacks engage") {
    // hand-computed oracle: replay the syntheticBmp pixel formula in
    // plain Scala and histogram it — the decoded raster must agree
    val (id, w, h) = (42L, 9, 5)
    val expected = {
      val counts = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id * 2654435761L + x * 7 + y * 131) % 0x1000000L).toInt
        val gray = (((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)) / 3
        counts(gray * 16 / 256) += 1
      }
      counts.map(c => (c.toDouble / (w * h)).toFloat).toSeq
    }
    val bmp = Multimodal.syntheticBmp(id, w, h)
    assert(Multimodal.histEmbedBytes(bmp, "image", 16).toSeq == expected)
    // the histogram is a probability mass: sums to ~1, never zero-norm
    assert(math.abs(expected.map(_.toDouble).sum - 1.0) < 1e-6)

    // stubEmbedBytes is the byte-for-byte JVM twin of the stubEmbed
    // column math (same md5 chain) — the fallback can't drift
    val garbage = "definitely not an image".getBytes("UTF-8")
    val viaColumn = Multimodal.stubEmbed(
      spark.createDataFrame(Seq((7L, new String(garbage, "UTF-8"))))
        .toDF("doc_id", "text")
        .select(col("doc_id").as("id"),
          encode(col("text"), "UTF-8").as("content")),
      dim = 16).collect().head.getSeq[Float](1)
    assert(Multimodal.stubEmbedBytes(garbage, 16).toSeq == viaColumn)
    // non-decodable payloads and non-image modalities fall back
    assert(Multimodal.histEmbedBytes(garbage, "image", 16).toSeq ==
      Multimodal.stubEmbedBytes(garbage, 16).toSeq)
    assert(Multimodal.histEmbedBytes(bmp, "audio", 16).toSeq ==
      Multimodal.stubEmbedBytes(bmp, 16).toSeq)

    // the mapPartitions seam end to end, mixed decodable/garbage/null —
    // a null payload (failed fetch) must embed as if empty, not NPE the
    // partition
    val assets = spark.createDataFrame(Seq(
      (1L, "image", Multimodal.syntheticBmp(1L, 3, 2)),
      (2L, "image", garbage),
      (3L, "image", null: Array[Byte])
    )).toDF("id", "modality", "content")
    val out = Multimodal.embedPartitions(assets, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L) ==
      Multimodal.histEmbedBytes(Multimodal.syntheticBmp(1L, 3, 2),
        "image", 16).toSeq)
    assert(out(2L) == Multimodal.stubEmbedBytes(garbage, 16).toSeq)
    assert(out(3L) ==
      Multimodal.stubEmbedBytes(Array.emptyByteArray, 16).toSeq)
  }

  test("frameGraySums decodes REAL AVI frames; corrupt/non-video " +
    "payloads yield no rows") {
    // hand-replay the fixture's pixel formula and compare against the
    // container walk + DIB decode of the actual bytes
    val id = 17L
    val (w, h, n) = ((id % 8 + 2).toInt, (id % 5 + 2).toInt, (id % 4 + 2).toInt)
    val expected = (0 until n).map { f =>
      (0 until h).flatMap(y => (0 until w).map { x =>
        val v = (id * 2654435761L + f * 1009 + x * 7 + y * 131) % 0x1000000L
        (((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)).toInt / 3
      }).map(_.toLong).sum
    }
    val assets = spark.createDataFrame(Seq(
      (id, "video", Multimodal.syntheticAvi(id)),
      (1L, "video", "not an avi at all".getBytes("UTF-8")), // corrupt
      (2L, "image", Multimodal.syntheticAvi(2L)) // wrong modality
    )).toDF("id", "modality", "content")
    val out = Multimodal.frameGraySums(assets).collect()
    assert(out.forall(_.id == id), "only the real video asset yields rows")
    assert(out.length == n)
    out.sortBy(_.frame_idx).zipWithIndex.foreach { case (fs, i) =>
      assert(fs.frame_idx == i && fs.width == w && fs.height == h &&
        fs.n_px == w.toLong * h && fs.gray_sum == expected(i),
        s"frame $i: got $fs expected sum ${expected(i)}")
    }
    // truncating the movi list mid-frame must bail, not throw or
    // return partial garbage
    val truncated = Multimodal.syntheticAvi(id).take(120)
    assert(Multimodal.frameGraySums(
      spark.createDataFrame(Seq((9L, "video", truncated)))
        .toDF("id", "modality", "content")).collect().isEmpty)
    // adversarial headers: (a) an hdrl whose declared avih size is too
    // short to cover the dimension fields must bail (not read the next
    // chunk's bytes as width/height); (b) huge declared dimensions
    // whose Int stride math would wrap must yield no rows, not an
    // out-of-bounds pixel loop
    val shortAvih = {
      val b = Multimodal.syntheticAvi(id)
      val bb = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // layout: RIFF(0) size(4) 'AVI '(8) LIST(12) size(16) 'hdrl'(20)
      // 'avih'(24) avihSize(28) payload(32..) — dwWidth at 32+32 = 64
      bb.putInt(28, 16) // avih declared size 16 < 40
      b
    }
    val hugeDims = {
      val b = Multimodal.syntheticAvi(id)
      val bb = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(64, 0x30000000) // dwWidth: Int stride math wraps
      b
    }
    assert(Multimodal.frameGraySums(
      spark.createDataFrame(Seq((8L, "video", shortAvih),
        (7L, "video", hugeDims), (6L, "video", null: Array[Byte])))
        .toDF("id", "modality", "content")).collect().isEmpty)
  }

  test("frameGraySums decodes MJPEG (00dc) frames; corrupt frames skip, " +
    "truncation bails") {
    // uniform-gray frames round-trip JPEG bit-exactly, so the expected
    // sum is the closed form w·h·gray(id, f)
    val id = 23L
    val (w, h, n) = ((id % 8 + 2).toInt, (id % 5 + 2).toInt, (id % 4 + 2).toInt)
    val expected = (0 until n).map { f =>
      w.toLong * h * ((id * 2654435761L + f * 1009) % 256L)
    }
    val assets = spark.createDataFrame(Seq(
      (id, "video", Multimodal.syntheticMjpegAvi(id))))
      .toDF("id", "modality", "content")
    val out = Multimodal.frameGraySums(assets).collect().sortBy(_.frame_idx)
    assert(out.length == n)
    out.zipWithIndex.foreach { case (fs, i) =>
      assert(fs.frame_idx == i && fs.width == w && fs.height == h &&
        fs.n_px == w.toLong * h && fs.gray_sum == expected(i),
        s"frame $i: got $fs expected sum ${expected(i)}")
    }
    // frame sampling parity: everyNth skips the JPEG decode entirely
    // for unsampled frames and keeps ORIGINAL indices
    val sampled = Multimodal.frameGraySums(assets, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx.toInt).toSeq ==
      (0 until n by 2).toSeq)
    sampled.foreach(fs =>
      assert(fs.gray_sum == expected(fs.frame_idx.toInt)))
    // corrupting ONE frame's JPEG payload (kill the SOI marker) skips
    // that frame only — the rest of the container still decodes
    val oneBad = {
      val b = Multimodal.syntheticMjpegAvi(id)
      // find the second 00dc chunk and stomp its first payload bytes
      val s = new String(b.map(c => if (c >= 32 && c < 127) c.toChar
        else '.'))
      val first = s.indexOf("00dc")
      val second = s.indexOf("00dc", first + 4)
      b(second + 8) = 0; b(second + 9) = 0
      b
    }
    val salvaged = Multimodal.frameGraySums(
      spark.createDataFrame(Seq((id, "video", oneBad)))
        .toDF("id", "modality", "content")).collect().sortBy(_.frame_idx)
    assert(salvaged.map(_.frame_idx.toInt).toSeq ==
      (0 until n).filterNot(_ == 1).toSeq,
      s"frame 1 must be skipped, rest kept: ${salvaged.toSeq}")
    salvaged.foreach(fs =>
      assert(fs.gray_sum == expected(fs.frame_idx.toInt)))
    // WarcSpec-style truncation: cutting the container mid-movi must
    // bail to zero rows, not throw
    val truncated = Multimodal.syntheticMjpegAvi(id).take(150)
    assert(Multimodal.frameGraySums(
      spark.createDataFrame(Seq((9L, "video", truncated)))
        .toDF("id", "modality", "content")).collect().isEmpty)
  }

  test("resizeGraySums resamples REAL decoded pixels (up- and down-" +
    "scale); frame sampling decodes only every Nth frame") {
    // nearest-neighbor replay in plain Scala against the decoded path,
    // one downscale (11x6 -> 8x6) and one upscale (2x2 -> 8x6)
    for ((id, sw, sh) <- Seq((42L, 11, 6), (7L, 2, 2))) {
      val expected = (0 until 6).flatMap { y =>
        (0 until 8).map { x =>
          val (px, py) = (x * sw / 8, y * sh / 6)
          val v = ((id * 2654435761L + px * 7 + py * 131) % 0x1000000L).toInt
          ((((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)) / 3).toLong
        }
      }.sum
      val out = Multimodal.resizeGraySums(
        spark.createDataFrame(Seq(
          (id, "image", Multimodal.syntheticBmp(id, sw, sh)),
          (99L, "image", "garbage".getBytes("UTF-8")),
          (98L, "audio", Multimodal.syntheticBmp(98L, 3, 3))))
          .toDF("id", "modality", "content"), outW = 8, outH = 6)
        .collect()
      assert(out.length == 1 && out.head.id == id &&
        out.head.gray_sum == expected,
        s"resize of ${sw}x$sh: got ${out.toSeq} expected sum $expected")
    }
    // everyNth frame sampling: exactly frames 0, 2, ... decode, with
    // their ORIGINAL indices and the same sums as the full decode
    val vid = 17L
    val full = Multimodal.frameGraySums(
      spark.createDataFrame(Seq((vid, "video", Multimodal.syntheticAvi(vid))))
        .toDF("id", "modality", "content")).collect()
      .map(f => f.frame_idx -> f.gray_sum).toMap
    val sampled = Multimodal.frameGraySums(
      spark.createDataFrame(Seq((vid, "video", Multimodal.syntheticAvi(vid))))
        .toDF("id", "modality", "content"), everyNth = 2).collect()
    assert(sampled.map(_.frame_idx).sorted.toSeq ==
      full.keys.filter(_ % 2 == 0).toSeq.sorted)
    sampled.foreach(f => assert(f.gray_sum == full(f.frame_idx)))
  }

  test("audioEnergyWindows decodes REAL PCM samples; corrupt/non-audio " +
    "payloads yield no rows") {
    // hand-replay syntheticWav's sample formula and compare against
    // the AudioSystem decode of the actual bytes — id 22 (mono,
    // 184 frames → 8-frame SHORT TAIL window) and id 23 (stereo,
    // 192 frames → exact multiple) cover both channel counts and
    // both tail shapes
    for (id <- Seq(22L, 23L)) {
      val ch = (id % 2 + 1).toInt
      val frames = ((id % 50) + 1).toInt * 8
      val expected = (0 until frames).grouped(16).toSeq.map { fs =>
        fs.flatMap(f => (0 until ch).map { c =>
          val i = f * ch + c
          math.abs((id * 31 + i * 7) % 65536 - 32768)
        }).sum
      }
      if (id == 22L) assert(frames % 16 != 0, "id 22 must have a tail")
      val assets = spark.createDataFrame(Seq(
        (id, "audio", Multimodal.syntheticWav(id)),
        (1L, "audio", "not audio".getBytes("UTF-8")),
        (2L, "image", Multimodal.syntheticWav(2L)),
        (3L, "audio", null: Array[Byte])
      )).toDF("id", "modality", "content")
      val out = Multimodal.audioEnergyWindows(assets, windowFrames = 16)
        .collect()
      assert(out.forall(_.id == id), "only the real audio asset yields rows")
      assert(out.length == expected.length)
      out.sortBy(_.window_idx).zipWithIndex.foreach { case (w, i) =>
        val expFrames = math.min(16, frames - i * 16)
        assert(w.window_idx == i && w.n_frames == expFrames &&
          w.abs_sum == expected(i),
          s"id $id window $i: got $w expected sum ${expected(i)} " +
            s"frames $expFrames")
      }
    }
  }

  test("audioDecodeBytes parses real WAV headers; corrupt payloads " +
    "fall back to the stub") {
    // id=7: channels = 7%2+1 = 2, frames = (7%50+1)*8 = 64 → 8 ms at
    // 8 kHz, 16-bit — values only a real RIFF parse can produce
    val wav = Multimodal.syntheticWav(7L)
    assert(wav.length == 44 + 64 * 2 * 2)
    assert(Multimodal.audioDecodeBytes(wav, "audio") == ((8000, 16, 2, 8L)))
    // a WAV the JDK wrote itself must parse identically (cross-check the
    // hand-assembled fixture against AudioSystem's own writer)
    val jdkWav = {
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
      val data = new Array[Byte](320) // 160 frames
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, 160),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(Multimodal.audioDecodeBytes(jdkWav, "audio") == ((16000, 16, 1, 10L)))
    // truncated header (magic number intact) → stub, not a throw
    val corrupt = wav.take(20)
    assert(Multimodal.audioDecodeBytes(corrupt, "audio") ==
      Multimodal.stubDecodeBytes(corrupt, "audio"))
    // non-audio modalities never enter the codec
    assert(Multimodal.audioDecodeBytes(wav, "image") ==
      Multimodal.stubDecodeBytes(wav, "image"))
  }

  test("videoDecodeBytes walks real ISO-BMFF boxes; corrupt payloads " +
    "fall back to the stub") {
    // id=5: width 5%640+16=21, height 5%360+16=21, duration (5%120+1)s
    val mp4 = Multimodal.syntheticMp4(5L)
    assert(mp4.length == 232)
    assert(Multimodal.videoDecodeBytes(mp4, "video") == ((21, 21, 1, 6000L)))
    // a corrupt box size inside moov must not throw or loop
    val broken = mp4.clone()
    broken(16) = 0x7f.toByte // moov size → absurd, exceeds buffer
    assert(Multimodal.videoDecodeBytes(broken, "video") ==
      Multimodal.stubDecodeBytes(broken, "video"))
    val garbage = "not a container".getBytes("UTF-8")
    assert(Multimodal.videoDecodeBytes(garbage, "video") ==
      Multimodal.stubDecodeBytes(garbage, "video"))
    assert(Multimodal.videoDecodeBytes(mp4, "audio") ==
      Multimodal.stubDecodeBytes(mp4, "audio"))
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
