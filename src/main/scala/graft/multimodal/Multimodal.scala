package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata alongside, the
  * standard layout for training-data lakes (one row per asset, bytes +
  * metadata columns, parquet-encoded).
  *
  * The Spark-side mechanics here — schema, per-partition batched decode,
  * frame-sampling explode, partition sizing — are real and tested. The
  * actual codec calls are STUBBED with a deterministic fake (this
  * container has no image/audio libraries): `stubDecode*` derive plausible
  * metadata from a content hash. Swap `decodeFn` for a real decoder (JNI /
  * javacv) without touching any of the plumbing.
  */
object Multimodal {

  /** A decoded-asset metadata record. */
  case class AssetMeta(id: Long, modality: String, nBytes: Long,
                       width: Int, height: Int, channels: Int,
                       durationMs: Long)

  /** Wrap a text/id DataFrame as a binary-asset table (for fixtures — in
    * production the binary column comes straight from parquet).
    * Output: id, modality, content (binary), n_bytes.
    */
  def asBinaryAssets(df: DataFrame, idCol: String, payloadCol: String,
                     modality: String): DataFrame =
    asBinaryAssets(df, idCol, payloadCol, lit(modality))

  /** Column-modality overload (mixed-modality tables). */
  def asBinaryAssets(df: DataFrame, idCol: String, payloadCol: String,
                     modality: Column): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      modality.as("modality"),
      encode(col(payloadCol), "UTF-8").as("content"),
      octet_length(col(payloadCol)).cast("long").as("n_bytes"))

  /** Deterministic fake decode: metadata derived from the md5 of the
    * payload. Column-only (codegen'd) — this is the *metadata-extraction*
    * path; the imperative batched path is `decodePartitions`.
    */
  def stubDecodeMeta(assets: DataFrame): DataFrame = {
    // hash the UPPERCASE hex of the payload: `hex` is identical across
    // engines, unlike base64 (Spark's base64 is MIME-chunked with CRLFs)
    val h = HashFunctions.md5Long(hex(col("content")))
    assets.select(
      col("id"), col("modality"), col("n_bytes"),
      (h % 512 + 64).cast("int").as("width"),
      (shiftright(h, 9) % 512 + 64).cast("int").as("height"),
      when(col("modality") === "image", 3).otherwise(1).cast("int").as("channels"),
      when(col("modality").isin("audio", "video"),
        shiftright(h, 18) % 60000L).otherwise(0L).as("duration_ms"))
  }

  /** The real-decoder seam: batched per-partition decode via
    * `mapPartitions` (one decoder instance per partition, the JVM
    * equivalent of `mapInPandas` batching). `decodeFn` receives raw bytes;
    * the default is the deterministic stub.
    */
  def decodePartitions(
      assets: DataFrame,
      decodeFn: (Array[Byte], String) => (Int, Int, Int, Long) = stubDecodeBytes)
      : Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("id", "modality", "content", "n_bytes")
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition decoder setup would happen here (e.g. native lib
        // handle); the iterator keeps the decode pipelined and batched
        it.map { case (id, modality, bytes, nBytes) =>
          val (w, h, c, d) = decodeFn(bytes, modality)
          AssetMeta(id, modality, nBytes, w, h, c, d)
        }
      }
  }

  /** Deterministic stand-in for a codec: ??? in spirit — returns metadata
    * derived from content bytes so tests are stable. Computes the exact
    * same values as `stubDecodeMeta` (md5 of the uppercase-hex payload,
    * first 15 hex digits) so the columnar and mapPartitions paths agree.
    */
  def stubDecodeBytes(bytes: Array[Byte], modality: String): (Int, Int, Int, Long) = {
    val hexStr = bytes.map("%02X".format(_)).mkString
    val h = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(hexStr.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val w = (h % 512 + 64).toInt
    val hgt = ((h >> 9) % 512 + 64).toInt
    val c = if (modality == "image") 3 else 1
    val d = if (modality == "audio" || modality == "video") (h >> 18) % 60000L else 0L
    (w, hgt, c, d)
  }

  /** REAL image decode at the [[decodePartitions]] seam: the JDK's
    * built-in `javax.imageio` readers (PNG, BMP, GIF, JPEG, WBMP) parse
    * the payload bytes — width/height from the decoded image, channels
    * from the decoded raster's band count, duration 0 (stills). Payloads
    * no registered reader recognizes (and non-image modalities) fall
    * back to the deterministic stub, so a mixed asset table decodes
    * without a partition-killing throw. This is the "swap `decodeFn`
    * for a real decoder" contract of [[decodePartitions]] made good
    * with a codec that ships in the JVM.
    */
  def imageDecodeBytes(bytes: Array[Byte],
                       modality: String): (Int, Int, Int, Long) = {
    if (modality == "image") {
      val img = decodeImage(bytes)
      if (img != null)
        (img.getWidth, img.getHeight, img.getRaster.getNumBands, 0L)
      else stubDecodeBytes(bytes, modality)
    } else stubDecodeBytes(bytes, modality)
  }

  /** Shared JDK ImageIO decode for [[imageDecodeBytes]] and
    * [[histEmbedBytes]]; null when no registered reader recognizes the
    * payload or the decode throws.
    *
    * MemoryCacheImageInputStream, NOT ImageIO.read(InputStream):
    * ImageIO's default stream wrapper is FILE-cache backed — a temp
    * file per decoded asset, which a per-row codec at corpus scale
    * must never do. NonFatal, not just IOException: a recognized
    * magic number with a corrupt header throws unchecked
    * (IllegalArgument/NegativeArraySize/IndexOutOfBounds are all
    * real ImageIO failure modes) and must fall to the stub, not
    * kill the partition.
    */
  private def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) null
        else {
          val r = readers.next()
          try { r.setInput(in); r.read(0) } finally r.dispose()
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => null }

  /** REAL audio metadata at the [[decodePartitions]] seam: the JDK's
    * `javax.sound.sampled.AudioSystem` parses the payload header (WAV/
    * AIFF/AU ship in every JVM) — no native libs, same zero-dependency
    * contract as [[imageDecodeBytes]]. The fixed (Int, Int, Int, Long)
    * metadata tuple is repurposed for audio as
    * `(sampleRateHz, bitsPerSample, channels, durationMs)`;
    * `durationMs` is `round(frameLength · 1000 / frameRate)`. Unknown
    * codecs, corrupt headers, and non-audio modalities fall back to the
    * deterministic stub (NonFatal — a recognized magic number with a
    * truncated header must not kill the partition).
    */
  def audioDecodeBytes(bytes: Array[Byte],
                       modality: String): (Int, Int, Int, Long) = {
    if (modality == "audio") {
      // ByteArrayInputStream supports mark/reset, which AudioSystem
      // requires to probe multiple file readers without a temp file
      val parsed =
        try {
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = aff.getFormat
          val frames = aff.getFrameLength
          val dur =
            if (frames >= 0 && fmt.getFrameRate > 0)
              Math.round(frames * 1000.0 / fmt.getFrameRate)
            else 0L
          (fmt.getSampleRate.toInt, fmt.getSampleSizeInBits,
            fmt.getChannels, dur)
        } catch { case scala.util.control.NonFatal(_) => null }
      if (parsed != null) parsed else stubDecodeBytes(bytes, modality)
    } else stubDecodeBytes(bytes, modality)
  }

  /** Deterministic PCM WAV fixture, hand-assembled from the published
    * RIFF layout (so the REAL `AudioSystem` parser in
    * [[audioDecodeBytes]] exercises actual header fields, not bytes it
    * wrote itself): 16-bit little-endian PCM, `id`-derived channel count
    * and frame count, 8 kHz. The closed forms a hash-gated oracle can
    * predict from `id` alone:
    * channels = id % 2 + 1; frames = (id % 50 + 1) · 8 (so durationMs
    * = id % 50 + 1 exactly at 8 kHz); total bytes = 44 + frames ·
    * channels · 2 — values the md5-derived stub could never match.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val channels = (id % 2 + 1).toInt
    val frames = ((id % 50) + 1).toInt * 8
    val sampleRate = 8000
    val dataSize = frames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < frames * channels) {
      buf.putShort(((id * 31 + i * 7) % 65536 - 32768).toShort)
      i += 1
    }
    buf.array()
  }

  /** REAL video-container metadata at the [[decodePartitions]] seam: a
    * pure-JVM ISO-BMFF (MP4, ISO/IEC 14496-12) box walk — `moov/mvhd`
    * for timescale+duration, `moov/trak/tkhd` for the presentation
    * width×height (16.16 fixed point; the max over tracks, audio tracks
    * carry 0×0). The metadata tuple is
    * `(width, height, nTracks, durationMs)`. No frame DECODING happens
    * here (ISO-BMFF codecs — H.264 etc. — need a codec library); the
    * container fields every video curation pipeline filters on —
    * dimensions, duration, track count — are parsed from real bytes.
    * For REAL frame decode without a codec library see
    * [[frameGraySums]] (uncompressed-DIB and MJPEG AVI). Malformed or
    * non-ISO-BMFF payloads fall back to the stub.
    */
  def videoDecodeBytes(bytes: Array[Byte],
                       modality: String): (Int, Int, Int, Long) = {
    if (modality == "video") {
      val parsed =
        try Mp4Meta.parse(bytes)
        catch { case scala.util.control.NonFatal(_) => null }
      if (parsed != null) parsed else stubDecodeBytes(bytes, modality)
    } else stubDecodeBytes(bytes, modality)
  }

  /** Minimal ISO-BMFF reader for [[videoDecodeBytes]] — box sizes and
    * field offsets straight from the published spec (14496-12 §8.2.2
    * `mvhd`, §8.3.2 `tkhd`).
    */
  private object Mp4Meta {
    def parse(bytes: Array[Byte]): (Int, Int, Int, Long) = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      var durationMs = -1L
      var w = 0
      var h = 0
      var tracks = 0
      def walk(start: Int, end: Int, depth: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val size = bb.getInt(off)
          if (size < 8 || off + size > end) return // corrupt → bail
          val typ = new String(bytes, off + 4, 4, "US-ASCII")
          typ match {
            case "moov" if depth == 0 => walk(off + 8, off + size, 1)
            case "trak" if depth == 1 =>
              tracks += 1
              walk(off + 8, off + size, 2)
            case "mvhd" if depth == 1 =>
              val v = bb.get(off + 8) & 0xff
              // v0: ctime4 mtime4 timescale4 dur4; v1: 8/8/4/8
              val (ts, dur) =
                if (v == 1) (bb.getInt(off + 28),
                  bb.getLong(off + 32))
                else (bb.getInt(off + 20),
                  bb.getInt(off + 24).toLong & 0xffffffffL)
              if (ts > 0) durationMs = dur * 1000L / ts
            case "tkhd" if depth == 2 =>
              val v = bb.get(off + 8) & 0xff
              // width/height are the LAST 8 bytes of the box (after the
              // 36-byte matrix), 16.16 fixed point — same offset-from-end
              // for v0 and v1
              val wOff = off + size - 8
              w = math.max(w, bb.getInt(wOff) >>> 16)
              h = math.max(h, bb.getInt(wOff + 4) >>> 16)
            case _ => ()
          }
          off += size
        }
      }
      walk(0, bytes.length, 0)
      if (durationMs < 0) null else (w, h, tracks, durationMs)
    }
  }

  /** Deterministic MP4 fixture, hand-assembled from the published
    * ISO-BMFF layout (`ftyp` + `moov(mvhd + trak(tkhd))`) so the REAL
    * box walk in [[videoDecodeBytes]] parses actual spec offsets.
    * Closed forms from `id`: width = id % 640 + 16,
    * height = id % 360 + 16, durationMs = (id % 120 + 1) · 1000
    * (timescale 600), one track, total bytes 16 + 8 + 108 + 100 = 232.
    */
  def syntheticMp4(id: Long): Array[Byte] = {
    val w = (id % 640 + 16).toInt
    val h = (id % 360 + 16).toInt
    val durSec = (id % 120 + 1).toInt
    val bb = java.nio.ByteBuffer.allocate(232)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    // ftyp: major brand isom, minor 0, one compatible brand
    bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    // moov = 8 + mvhd(108) + trak(8 + tkhd(92)) = 216
    bb.putInt(216).put("moov".getBytes("US-ASCII"))
    // mvhd v0: fullbox(4) ctime mtime timescale duration rate(4)
    // volume(2) reserved(10) matrix(36) predefined(24) next_track(4)
    bb.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(600).putInt(durSec * 600)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      .putInt(0).putInt(0)
    putIdentityMatrix(bb)
    (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt(2) // next_track_ID
    // trak > tkhd v0: fullbox(4) ctime mtime track_ID reserved duration
    // reserved(8) layer(2) alt_group(2) volume(2) reserved(2)
    // matrix(36) width height  → box size 92
    bb.putInt(100).put("trak".getBytes("US-ASCII"))
    bb.putInt(92).put("tkhd".getBytes("US-ASCII"))
      .putInt(0x00000007) // v0, flags: enabled|in_movie|in_preview
      .putInt(0).putInt(0).putInt(1).putInt(0).putInt(durSec * 600)
      .putLong(0L).putShort(0).putShort(0).putShort(0).putShort(0)
    putIdentityMatrix(bb)
    bb.putInt(w << 16).putInt(h << 16)
    bb.array()
  }

  private def putIdentityMatrix(bb: java.nio.ByteBuffer): Unit = {
    bb.putInt(0x00010000).putInt(0).putInt(0)
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
  }

  /** REAL video FRAME decode at the [[decodePartitions]] seam — the
    * one stage that previously stayed stubbed "pending a codec
    * library". Two codec-free paths share the RIFF/AVI container walk
    * (published layout — `avih` main header, `strl` stream list,
    * `movi` chunk list): `00db` chunks are raw bottom-up BGR DIB
    * rasters read directly, and `00dc` MJPEG chunks are each a
    * STANDALONE JPEG — the JDK ImageIO path that already decodes
    * still images decodes them frame by frame (Motion JPEG is
    * concatenated baseline JPEGs; no inter-frame state exists).
    * Output: one row per (asset, frame) with the frame's exact
    * grayscale sum — the per-frame feature a sampling/curation stage
    * keys on. Non-video modalities and unparsable payloads yield no
    * rows, and a corrupt FRAME inside a valid container skips that
    * frame only (a corrupt asset must not kill the partition).
    */
  case class FrameStat(id: Long, frame_idx: Long, width: Long,
                       height: Long, n_px: Long, gray_sum: Long)

  /** `everyNth` is REAL frame sampling: container headers are still
    * walked for every frame chunk, but the pixel decode — the dominant
    * cost — runs only on frames with `idx % everyNth == 0` (the
    * every-Nth-frame shape a 100 TB video pipeline uses to bound
    * decode cost; `frame_idx` keeps the ORIGINAL index so downstream
    * timestamps stay correct).
    */
  def frameGraySums(assets: DataFrame,
                    everyNth: Int = 1): Dataset[FrameStat] = {
    require(everyNth >= 1, s"everyNth ($everyNth) must be >= 1")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("id", "modality", "content")
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, modality, bytes) =>
        // the sampling stride goes INTO the parser: unsampled frames
        // are never byte-copied or retained, so memory and allocation
        // scale with the SAMPLED fraction, not the container size
        val parsed =
          if (modality != "video") null
          else
            try AviFrames.parse(bytes, everyNth)
            catch { case scala.util.control.NonFatal(_) => null }
        // LONG arithmetic for the size guards: a malformed header can
        // declare dimensions whose Int stride/byte-count wraps negative,
        // which would pass an Int `<` check and send the pixel loop out
        // of bounds — the partition-killing throw this seam forbids
        val strideL = if (parsed == null) 0L
          else (parsed._1.toLong * 3 + 3) / 4 * 4
        if (parsed == null || parsed._1 <= 0 || parsed._2 <= 0 ||
            strideL * parsed._2 > Int.MaxValue) Iterator.empty
        else {
          val (w, h, frames) = parsed
          val stride = strideL.toInt
          frames.iterator.flatMap { case (i, isJpeg, fr) =>
            if (isJpeg) {
              // MJPEG: the chunk is a complete baseline JPEG — decode
              // through the shared no-temp-file ImageIO path; a frame
              // whose decode fails or whose dimensions contradict the
              // container header is skipped, not fatal
              val img = decodeImage(fr)
              if (img == null || img.getWidth != w || img.getHeight != h)
                Iterator.empty
              else {
                val px = rgbPixels(img)
                var sum = 0L
                var i2 = 0
                while (i2 < px.length) {
                  val v = px(i2)
                  sum += (((v >> 16) & 0xff) + ((v >> 8) & 0xff) +
                    (v & 0xff)) / 3
                  i2 += 1
                }
                Iterator.single(FrameStat(id, i.toLong, w.toLong,
                  h.toLong, w.toLong * h, sum))
              }
            }
            else if (fr.length.toLong < strideL * h) Iterator.empty // truncated
            else {
              var sum = 0L
              var y = 0
              while (y < h) {
                // rows are stored BOTTOM-UP in a DIB
                val row = (h - 1 - y) * stride
                var x = 0
                while (x < w) {
                  val b = fr(row + x * 3) & 0xff
                  val g = fr(row + x * 3 + 1) & 0xff
                  val r = fr(row + x * 3 + 2) & 0xff
                  sum += (r + g + b) / 3
                  x += 1
                }
                y += 1
              }
              Iterator.single(FrameStat(id, i.toLong, w.toLong, h.toLong,
                w.toLong * h, sum))
            }
          }
        }
      }
  }

  /** REAL image resize at the [[decodePartitions]] seam — the honest
    * version of [[stubResize]]'s byte-budget plumbing: the payload
    * DECODES (shared ImageIO path), a deterministic nearest-neighbor
    * resample maps output pixel (x, y) to source pixel
    * `(x·sw / dw, y·sh / dh)` (integer division — closed-form, so an
    * oracle can replay it from the fixture's pixel formula, which
    * Java2D's own interpolation rounding could never guarantee), and
    * the resized raster reports its exact grayscale sum. Output:
    * `(id, width, height, n_px, gray_sum)` per decodable image asset;
    * non-images and undecodable payloads yield no rows.
    */
  case class ResizeStat(id: Long, width: Long, height: Long,
                        n_px: Long, gray_sum: Long)

  /** One bulk RGB grab of the whole raster (row-major, stride = width).
    * Per-pixel `getRGB(x, y)` pays a ColorModel conversion call per
    * pixel — several times slower at real frame sizes; the bulk form
    * converts in one pass and the hot loops index a plain int array.
    */
  private def rgbPixels(img: java.awt.image.BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  def resizeGraySums(assets: DataFrame, outW: Int,
                     outH: Int): Dataset[ResizeStat] = {
    require(outW >= 1 && outH >= 1,
      s"target dimensions out of range: ${outW}x$outH")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("id", "modality", "content")
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, modality, bytes) =>
        val img =
          if (modality != "image" || bytes == null) null
          else decodeImage(bytes)
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
          Iterator.empty
        else {
          val (sw, sh) = (img.getWidth, img.getHeight)
          val px = rgbPixels(img)
          var sum = 0L
          var y = 0
          while (y < outH) {
            val sy = (y.toLong * sh / outH).toInt
            var x = 0
            while (x < outW) {
              val sx = (x.toLong * sw / outW).toInt
              val v = px(sy * sw + sx)
              sum += (((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          Iterator.single(ResizeStat(id, outW.toLong, outH.toLong,
            outW.toLong * outH, sum))
        }
      }
  }

  /** REAL audio SAMPLE decode at the [[decodePartitions]] seam — the
    * content-level counterpart of [[audioDecodeBytes]]' header parse
    * (PCM needs no codec library, like [[frameGraySums]]' DIB frames):
    * the JDK `AudioSystem` stream decodes the payload to raw 16-bit
    * PCM frames, and each `windowFrames`-frame window reports its
    * exact absolute-amplitude sum — the energy feature audio curation
    * gates on (silence and clipping detection). Output: one row per
    * (asset, window), `n_frames` counts the window's frames (the tail
    * window may be short), `abs_sum` sums |sample| over every channel.
    * Non-audio modalities, null payloads, unknown codecs, and
    * non-16-bit-PCM streams yield no rows.
    */
  case class AudioWindow(id: Long, window_idx: Long, n_frames: Long,
                         abs_sum: Long)

  def audioEnergyWindows(assets: DataFrame,
                         windowFrames: Int): Dataset[AudioWindow] = {
    require(windowFrames >= 1, s"windowFrames ($windowFrames) must be >= 1")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("id", "modality", "content")
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, modality, bytes) =>
        val parsed =
          if (modality != "audio" || bytes == null) null
          else
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val fmt = in.getFormat
                if (fmt.getSampleSizeInBits != 16 ||
                  fmt.getEncoding !=
                    javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                  null
                else (fmt.getChannels, fmt.isBigEndian, in.readAllBytes())
              } finally in.close()
            } catch { case scala.util.control.NonFatal(_) => null }
        if (parsed == null) Iterator.empty
        else {
          val (ch, bigEndian, data) = parsed
          val frameBytes = ch * 2
          val nFrames = if (frameBytes > 0) data.length / frameBytes else 0
          (0 until nFrames by windowFrames).iterator.zipWithIndex
            .map { case (start, w) =>
              val endF = math.min(start + windowFrames, nFrames)
              var sum = 0L
              var i = start * ch
              val endI = endF * ch
              while (i < endI) {
                val off = i * 2
                val s =
                  if (bigEndian)
                    ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                  else
                    ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
                sum += math.abs(s.toLong)
                i += 1
              }
              AudioWindow(id, w.toLong, (endF - start).toLong, sum)
            }
        }
      }
  }

  /** Minimal RIFF/AVI reader for [[frameGraySums]] — chunk layout per
    * the published AVI RIFF form (`avih` fields at their spec offsets,
    * `movi` list, `00db` uncompressed-DIB / `00dc` compressed (MJPEG)
    * frame chunks). Returns (width, height, sampled frames as
    * (original index, isCompressed, payload)); null on anything
    * malformed. `everyNth` samples at the CHUNK WALK: unsampled
    * frames' bytes are never copied — and for `00dc` never
    * JPEG-decoded — only their 8-byte headers are stepped over.
    */
  private[multimodal] object AviFrames {
    def parse(bytes: Array[Byte],
              everyNth: Int = 1): (Int, Int, Seq[(Int, Boolean, Array[Byte])]) = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(off: Int): String =
        if (off + 4 > bytes.length) ""
        else new String(bytes, off, 4, "US-ASCII")
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return null
      var w = 0
      var h = 0
      var frameIdx = 0
      val frames =
        scala.collection.mutable.ArrayBuffer.empty[(Int, Boolean, Array[Byte])]
      var off = 12
      val end = math.min(bytes.length.toLong, 8L + bb.getInt(4)).toInt
      while (off + 8 <= end) {
        val ck = fourcc(off)
        val size = bb.getInt(off + 4)
        if (size < 0 || off + 8 + size > end) return null // corrupt → bail
        if (ck == "LIST") {
          fourcc(off + 8) match {
            case "hdrl" =>
              // first sub-chunk is avih: dwWidth/dwHeight at +32/+36 of
              // the avih payload (header data starts at off+12+8).
              // Both the LIST and the declared avih size must COVER
              // those offsets — a short-but-in-bounds hdrl would
              // otherwise read the next chunk's bytes as dimensions
              // and silently decode garbage instead of bailing
              if (fourcc(off + 12) != "avih") return null
              val avihSize = bb.getInt(off + 16)
              if (avihSize < 40 || 12 + 8 + avihSize > 8 + size)
                return null
              w = bb.getInt(off + 20 + 32)
              h = bb.getInt(off + 20 + 36)
            case "movi" =>
              var p = off + 12
              val mEnd = off + 8 + size
              while (p + 8 <= mEnd) {
                val fsz = bb.getInt(p + 4)
                if (fsz < 0 || p + 8 + fsz > mEnd) return null
                val fcc = fourcc(p)
                if (fcc == "00db" || fcc == "00dc") {
                  if (frameIdx % everyNth == 0)
                    frames += ((frameIdx, fcc == "00dc",
                      java.util.Arrays.copyOfRange(bytes, p + 8,
                        p + 8 + fsz)))
                  frameIdx += 1
                }
                p += 8 + fsz + (fsz & 1) // chunks are word-aligned
              }
            case _ => ()
          }
        }
        off += 8 + size + (size & 1)
      }
      if (w <= 0 || h <= 0 || frames.isEmpty) null
      else (w, h, frames.toSeq)
    }
  }

  /** Deterministic uncompressed-DIB AVI fixture, hand-assembled from
    * the published RIFF/AVI layout so the REAL container walk and
    * frame decode in [[frameGraySums]] read actual spec offsets.
    * Closed forms from `id`: width = id % 8 + 2, height = id % 5 + 2,
    * frames = id % 4 + 2; pixel (x, y) of frame f is
    * `(id·2654435761 + 1009f + 7x + 131y) mod 2²⁴` as RGB (stored as
    * bottom-up BGR rows, 4-byte-aligned stride — the DIB contract).
    */
  def syntheticAvi(id: Long): Array[Byte] = {
    val w = (id % 8 + 2).toInt
    val h = (id % 5 + 2).toInt
    val nFrames = (id % 4 + 2).toInt
    val stride = (w * 3 + 3) / 4 * 4
    val frameSize = stride * h
    val moviSize = 4 + nFrames * (8 + frameSize)
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(riffSize); cc("AVI ")
    cc("LIST"); bb.putInt(hdrlSize); cc("hdrl")
    // avih: 14 DWORDs
    cc("avih"); bb.putInt(56)
    bb.putInt(100000) // usec/frame (10 fps)
      .putInt(0).putInt(0).putInt(0)
      .putInt(nFrames).putInt(0).putInt(1).putInt(frameSize)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // strl: strh (vids/DIB) + strf (BITMAPINFOHEADER)
    cc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); bb.putInt(56)
    cc("vids"); cc("DIB ")
    bb.putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(10) // scale/rate = 10 fps
      .putInt(0).putInt(nFrames).putInt(frameSize)
      .putInt(-1).putInt(frameSize)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    cc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .putInt(0) // BI_RGB
      .putInt(frameSize).putInt(0).putInt(0).putInt(0).putInt(0)
    // movi: one 00db chunk per frame, bottom-up BGR rows
    cc("LIST"); bb.putInt(moviSize); cc("movi")
    var f = 0
    while (f < nFrames) {
      cc("00db"); bb.putInt(frameSize)
      var row = h - 1 // bottom-up: first stored row is y = h-1
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val v = (id * 2654435761L + f * 1009 + x * 7 + row * 131) % 0x1000000L
          bb.put((v & 0xff).toByte)          // B
            .put(((v >> 8) & 0xff).toByte)   // G
            .put(((v >> 16) & 0xff).toByte)  // R
          x += 1
        }
        var pad = stride - w * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        row -= 1
      }
      f += 1
    }
    bb.array()
  }

  /** Deterministic MJPEG-in-AVI fixture: the same hand-assembled RIFF
    * layout as [[syntheticAvi]] but with `00dc` chunks, each a REAL
    * baseline JPEG written by the JDK encoder. Frame `f` of asset `id`
    * is UNIFORM gray `(id·2654435761 + 1009f) mod 256` — a constant
    * block has only a DC coefficient, and at compression quality 1.0
    * with equal RGB channels (Y = value exactly, Cb = Cr = 128) the
    * JPEG round-trip reproduces it bit-exactly (verified across the
    * id range), so the oracle predicts each frame's gray sum in
    * closed form: `w·h·gray(id, f)`. Closed forms from `id` otherwise
    * match [[syntheticAvi]]: width = id % 8 + 2, height = id % 5 + 2,
    * frames = id % 4 + 2.
    */
  def syntheticMjpegAvi(id: Long): Array[Byte] = {
    val w = (id % 8 + 2).toInt
    val h = (id % 5 + 2).toInt
    val nFrames = (id % 4 + 2).toInt
    val jpegs = (0 until nFrames).map { f =>
      val gv = ((id * 2654435761L + f * 1009) % 256L).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (gv << 16) | (gv << 8) | gv); x += 1 }
        y += 1
      }
      val wr = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      val bos = new java.io.ByteArrayOutputStream()
      val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        wr.setOutput(mos)
        wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { mos.close(); wr.dispose() }
      bos.toByteArray
    }
    val chunk = jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val moviSize = 4 + chunk
    val maxFrame = jpegs.map(_.length).max
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(riffSize); cc("AVI ")
    cc("LIST"); bb.putInt(hdrlSize); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(100000) // usec/frame (10 fps)
      .putInt(0).putInt(0).putInt(0)
      .putInt(nFrames).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); bb.putInt(56)
    cc("vids"); cc("MJPG")
    bb.putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(10) // scale/rate = 10 fps
      .putInt(0).putInt(nFrames).putInt(maxFrame)
      .putInt(-1).putInt(maxFrame)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    cc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
    cc("MJPG") // biCompression
    bb.putInt(maxFrame).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); bb.putInt(moviSize); cc("movi")
    jpegs.foreach { j =>
      cc("00dc"); bb.putInt(j.length); bb.put(j)
      if ((j.length & 1) == 1) bb.put(0.toByte) // word alignment
    }
    bb.array()
  }

  /** Deterministic 24-bit BMP fixture: pixel (x, y) of asset `id` is an
    * id-stable RGB value, encoded by the JDK's BMP writer. Uncompressed
    * BI_RGB layout → the byte size is the closed-form
    * `54 + h * ceil(3w/4)*4`, which the q122 oracle predicts — so a
    * hash-gated query can check that REAL decoded pixels (not the stub)
    * produced the metadata.
    */
  def syntheticBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id * 2654435761L + x * 7 + y * 131) % 0x1000000L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // memory-cached stream for the same no-temp-file reason as the reader
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, "bmp", out)
    finally out.close() // flushes, then frees the memory cache
    bos.toByteArray
  }

  /** Deterministic fake feature-extraction: a float32 embedding derived
    * from the content hash — the stub stands where a vision/audio encoder
    * would run (same seam as `stubDecodeMeta`; swap for a real encoder
    * without touching the plumbing). The payload is reduced to ONE
    * 32-char md5 seed per row in its own projection, then each dimension
    * hashes `seed:i` into [-0.5, 0.5]: per-dimension work is O(32 chars)
    * regardless of payload size, and the seed column is referenced `dim`
    * times so CollapseProject keeps the projection boundary (a payload
    * expression inside a per-element lambda would re-encode the full
    * payload once per dimension). Output: (id, embedding array<float>) —
    * feeds the `Knn` operators directly.
    */
  def stubEmbed(assets: DataFrame, dim: Int): DataFrame =
    assets
      .select(col("id"), md5(hex(col("content"))).as("__seed"))
      .select(col("id"),
        array((0 until dim).map(i =>
          (((HashFunctions.md5Long(concat(col("__seed"), lit(s":$i")))
            % 1000001L) - 500000L).cast("double")
            / 1000000.0).cast("float")): _*).as("embedding"))

  /** JVM twin of [[stubEmbed]] (same md5 math, byte-for-byte): the
    * fallback of [[histEmbedBytes]] for payloads no codec recognizes,
    * so a mixed asset table embeds without a partition-killing throw
    * and non-decodable rows still get a usable (hash-derived,
    * non-zero-norm) vector.
    */
  def stubEmbedBytes(bytes: Array[Byte], dim: Int): Array[Float] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // null payload ≡ empty payload (matches stubEmbed's column math,
    // where a null content row would have been filtered upstream — at
    // THIS seam a null must not kill the partition)
    val src = if (bytes == null) Array.emptyByteArray else bytes
    val seed = md5hex(src.map("%02X".format(_)).mkString)
    Array.tabulate(dim) { i =>
      val h = java.lang.Long.parseLong(md5hex(s"$seed:$i").take(15), 16)
      (((h % 1000001L) - 500000L).toDouble / 1000000.0).toFloat
    }
  }

  /** REAL feature extraction at the embed seam: the decoded raster's
    * `bins`-bin grayscale histogram, normalized to a unit-sum float
    * vector — a deterministic, pixel-derived feature where a
    * vision-encoder embedding would slot in (the honest version of
    * [[stubEmbed]] for the formats the JDK decodes). Grayscale is the
    * integer mean `(r + g + b) / 3` of the sRGB channels; bin
    * `gray * bins / 256`. Payloads that fail to decode (and non-image
    * modalities) fall back to [[stubEmbedBytes]].
    */
  def histEmbedBytes(bytes: Array[Byte], modality: String,
                     bins: Int): Array[Float] = {
    if (bytes != null && modality == "image") {
      val img = decodeImage(bytes)
      if (img != null && img.getWidth > 0 && img.getHeight > 0) {
        val counts = new Array[Long](bins)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v = img.getRGB(x, y)
            val gray =
              (((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)) / 3
            counts(gray * bins / 256) += 1
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        counts.map(c => (c.toDouble / n).toFloat)
      } else stubEmbedBytes(bytes, bins)
    } else stubEmbedBytes(bytes, bins)
  }

  /** The embed seam as a per-partition batched stage (the
    * [[decodePartitions]] shape for features): one extractor instance
    * per partition, raw bytes in, `(id, embedding array<float>)` out —
    * feeds the [[graft.operators.Knn]] operators directly. Default
    * extractor is the real [[histEmbedBytes]].
    */
  def embedPartitions(
      assets: DataFrame, dim: Int,
      embedFn: (Array[Byte], String, Int) => Array[Float] = histEmbedBytes)
      : DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("id", "modality", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, bytes) =>
          (id, embedFn(bytes, modality, dim))
        }
      }
      .toDF("id", "embedding")
  }

  /** Stub resize: the byte-budget plumbing of an image resize without a
    * codec. The output byte length is the real resize contract
    * (`w*h*channels` for the target, capped by the source payload — a
    * decoder-backed implementation replaces the byte slice with actual
    * resampling at this seam); schema and budgets are what downstream
    * batch sizing cares about. Output: (id, width, height, channels,
    * n_bytes_out, out_md5).
    */
  def stubResize(assets: DataFrame, w: Int, h: Int): DataFrame = {
    val channels = when(col("modality") === "image", 3).otherwise(1)
    val target = channels * (w.toLong * h)
    // substr's len is int; target is bounded by w*h*3 which the require
    // keeps inside Int range
    val out = col("content").substr(lit(1),
      least(lit(target), col("n_bytes")).cast("int"))
    require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue,
      "target dimensions out of range")
    assets.select(
      col("id"), lit(w).cast("long").as("width"), lit(h).cast("long").as("height"),
      channels.cast("long").as("channels"),
      octet_length(out).cast("long").as("n_bytes_out"),
      md5(hex(out)).as("out_md5"))
  }

  /** Frame sampling: one row per sampled frame index for video assets —
    * `explode(sequence(...))`, i.e. the fan-out stays distributed and
    * codegen'd; a real pipeline would decode the frame bytes in a
    * downstream `decodePartitions`.
    */
  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame =
    stubDecodeMeta(assets)
      .filter(col("modality") === "video" && col("duration_ms") > 0)
      // outer ≡ inner (duration_ms > 0 makes the sequence non-empty);
      // inner would infer a size()>0 filter that re-materializes the
      // frame-index array inside the filter below the Generate
      .select(col("id"), col("duration_ms"),
        explode_outer(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_ts_ms"))
}
