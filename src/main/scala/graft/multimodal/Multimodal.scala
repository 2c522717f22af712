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
      // MemoryCacheImageInputStream, NOT ImageIO.read(InputStream):
      // ImageIO's default stream wrapper is FILE-cache backed — a temp
      // file per decoded asset, which a per-row codec at corpus scale
      // must never do. NonFatal, not just IOException: a recognized
      // magic number with a corrupt header throws unchecked
      // (IllegalArgument/NegativeArraySize/IndexOutOfBounds are all
      // real ImageIO failure modes) and must fall to the stub, not
      // kill the partition.
      val img =
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
      if (img != null)
        (img.getWidth, img.getHeight, img.getRaster.getNumBands, 0L)
      else stubDecodeBytes(bytes, modality)
    } else stubDecodeBytes(bytes, modality)
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
