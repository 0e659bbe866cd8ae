package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque binary payload + typed metadata. The Spark
  * representation for multimodal training data: `binary` column for the
  * raw asset, explicit metadata columns, features as `array<float>`. */
final case class MediaRow(
    media_id: Long,
    kind: String,          // image | audio | video
    bytes: Array[Byte],
    declared_len: Int)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    width: Int,
    height: Int,
    n_frames: Int,
    features: Array[Float])

/** [EXT] Multimodal-column plumbing for a training-data pipeline:
  * image/audio/video as opaque binary columns, decoded/feature-extracted
  * in distributed batch closures.
  *
  * IMAGE AND AUDIO DECODE ARE REAL: image-kind assets carry genuine
  * 24-bit BMP payloads ([[encodeBmp]] — byte length exactly
  * `54 + h·rowSize`, so the oracle restates sizes arithmetically) read
  * by the JDK's `javax.imageio.ImageIO`, returning the codec's own
  * width/height plus pixel-derived features; WAV payloads
  * ([[encodeWav]] — `44 + 2·nSamples` bytes by construction, q230)
  * parse through `javax.sound.sampled` for codec-reported sample
  * rate/channels/frame count. Bytes no registered reader accepts (the
  * video stand-in payloads — the JDK ships no video codec) fall back to
  * [[decodeStub]]'s deterministic byte-derived metadata, clearly
  * labeled. The Spark-side plumbing — binary column handling, schema,
  * `mapPartitions` batch shape (the Scala analog of a `mapInPandas`
  * batch UDF), partition-parallel decode — is shared by all paths.
  *
  * Scale notes: decode runs per-partition with no shuffle; payloads never
  * leave the executor that scanned them. Feature vectors (small) are what
  * flows onward. Repartition before decode only to balance CPU, not data.
  */
object Multimodal {

  // ImageIO's default scratch-file cache would turn every decode into
  // a temp-file round trip; byte-array payloads decode in memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic 24-bit uncompressed BMP (BITMAPINFOHEADER, BI_RGB,
    * bottom-up, rows padded to 4 bytes) — written by hand so the total
    * byte length is `54 + height * ((3*width + 3) / 4 * 4)` BY
    * CONSTRUCTION, an arithmetic fact any engine can restate. Pixels
    * are a seed-salted gradient, so payloads differ per asset but are
    * bit-reproducible. Decodable by the JDK's standard BMP reader. */
  def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowSize = (3 * width + 3) / 4 * 4
    val dataSize = rowSize * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize)          // file size
    buf.putInt(0)                      // reserved
    buf.putInt(54)                     // pixel-array offset
    buf.putInt(40)                     // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height)
    buf.putShort(1)                    // planes
    buf.putShort(24)                   // bits per pixel
    buf.putInt(0)                      // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835)                   // 72 dpi in px/metre
    buf.putInt(2835)
    buf.putInt(0)                      // palette entries
    buf.putInt(0)                      // important colors
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        buf.put(((x + seed) % 251).toByte)       // B
        buf.put(((y + seed) % 241).toByte)       // G
        buf.put(((x + y + seed) % 239).toByte)   // R
        x += 1
      }
      var p = 3 * width
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y += 1
    }
    buf.array()
  }

  /** As [[encodeBmp]] (same hand-written container), but with a
    * seed-salted TEXTURE instead of the smooth gradient: cross-term
    * zig-zags make the image non-monotonic in x and the large seed
    * multipliers move every wrap boundary per class — so perceptual
    * hashes ([[dHash64]]) distinguish classes, which the q242 gradient
    * cannot (monotonic rows hash to all-zero bits for every seed; the
    * round-8 DHashSpec failure that motivated this encoder). Channel
    * maxima stay 250/240/238, preserving the +5 shift-invariance
    * headroom. */
  def encodeTextureBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowSize = (3 * width + 3) / 4 * 4
    val dataSize = rowSize * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize)
    buf.putInt(0)
    buf.putInt(54)
    buf.putInt(40)
    buf.putInt(width)
    buf.putInt(height)
    buf.putShort(1)
    buf.putShort(24)
    buf.putInt(0)
    buf.putInt(dataSize)
    buf.putInt(2835)
    buf.putInt(2835)
    buf.putInt(0)
    buf.putInt(0)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        buf.put(((x * 37 + y * 11 + seed * 71 + (x * y % 13) * 19) % 251)
          .toByte)
        buf.put(((x * 23 + y * 41 + seed * 97 + ((x + y * y) % 11) * 17)
          % 241).toByte)
        buf.put(((x * 13 + y * 29 + seed * 131 + ((x * x + y) % 7) * 29)
          % 239).toByte)
        x += 1
      }
      var p = 3 * width
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y += 1
    }
    buf.array()
  }

  /** Deterministic 16-bit mono PCM WAV (RIFF canonical layout) — byte
    * length is `44 + 2 * nSamples` BY CONSTRUCTION (44-byte header, two
    * bytes per sample), an arithmetic fact any engine restates. Samples
    * are a seed-salted sawtooth, bit-reproducible. Parseable by the
    * JDK's standard `javax.sound.sampled` WAV reader. */
  def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0, s"bad WAV $nSamples@$sampleRate")
    val dataSize = 2 * nSamples
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)              // RIFF chunk size
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                         // fmt chunk size
    buf.putShort(1)                        // PCM
    buf.putShort(1)                        // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)             // byte rate
    buf.putShort(2)                        // block align
    buf.putShort(16)                       // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      buf.putShort((((i * (7 + seed % 13) + seed) % 8192) - 4096).toShort)
      i += 1
    }
    buf.array()
  }

  /** Real audio parse: hand the payload to `javax.sound.sampled`. Yields
    * the codec's own (sampleRate, channels, frameLength, bitsPerSample)
    * for any format the JDK reads (WAV/AIFF/AU); None otherwise. */
  def audioMeta(bytes: Array[Byte]): Option[(Int, Int, Long, Int)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      Some((f.getSampleRate.toInt, f.getChannels, ais.getFrameLength,
        f.getSampleSizeInBits))
    } catch { case _: Exception => None }

  /** Synthesize a deterministic media table from `documents` (kind
    * assigned round-robin by id). Image-kind assets carry a REAL BMP
    * payload whose dimensions derive from the text's first two bytes
    * (`16 + byte % 240` — the same formula the fallback decoder uses,
    * so the decoded dims are restatable either way); audio/video carry
    * the UTF-8 text bytes as an opaque stand-in payload. */
  def syntheticMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("_1"), col("text").as("_2"),
        col("n_chars").cast("int").as("_3"))
      .as[(Long, String, Int)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val utf8 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def at(i: Int): Int = if (utf8.isEmpty) 0 else utf8(i % utf8.length) & 0xff
        val bytes =
          if (kind == "image")
            encodeBmp(16 + at(0) % 240, 16 + at(1) % 240, id)
          else utf8
        MediaRow(id, kind, bytes, nChars)
      }
  }

  /** Real decode: hand the payload to `javax.imageio.ImageIO`. A
    * registered reader that accepts the bytes (BMP/PNG/JPEG/GIF — the
    * JDK's built-ins) yields the codec's true dimensions and
    * pixel-derived features; anything unreadable (the audio/video
    * stand-in payloads, torn bytes) falls back to [[decodeStub]]. */
  def decode(row: MediaRow): MediaFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.bytes))
      catch { case _: Exception => null }
    if (img == null) audioMeta(row.bytes) match {
      // real audio parse: width carries the sample rate, height the
      // channel count, n_frames the codec-reported PCM frame length
      case Some((rate, channels, frames, bits)) =>
        MediaFeatures(row.media_id, row.kind, rate, channels,
          math.min(frames, Int.MaxValue).toInt,
          Array(rate / 48000f, channels.toFloat, bits / 16f,
            frames / 1e6f, row.bytes.length.toFloat / (2 * frames + 44),
            0f, 0f, 2f))
      case None => decodeStub(row)
    }
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      // channel means over a bounded pixel sample (≤ ~64 per axis):
      // deterministic, cheap, and independent of image size
      val (sx, sy) = (math.max(1, w / 64), math.max(1, h / 64))
      var (r, g, b, n) = (0L, 0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          n += 1
          x += sx
        }
        y += sy
      }
      val feats = Array(
        w / 255f, h / 255f, w.toFloat / h,
        r.toFloat / n / 255f, g.toFloat / n / 255f, b.toFloat / n / 255f,
        row.bytes.length.toFloat / (w * h), 1f)
      MediaFeatures(row.media_id, row.kind, w, h, 1, feats)
    }
  }

  /** Decode every PCM sample of a WAV through the JDK codec
    * (`javax.sound.sampled` — 16-bit little-endian signed mono). Unlike
    * [[audioMeta]]'s header facts, this drains the audio STREAM, so a
    * codec that mis-frames, byte-swaps, or truncates the payload is
    * caught sample-exactly. */
  def audioSamples(bytes: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val data = ais.readAllBytes()
      Array.tabulate(data.length / 2) { i =>
        (((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort).toInt
      }
    } finally ais.close()
  }

  /** Lossless PNG re-encode of a decoded image through the JDK's
    * ImageIO writer — a second CONTAINER for the same pixel content
    * (deterministic: the writer emits no timestamps). */
  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Perceptual difference hash (dHash, Krawetz 2013): luminance
    * (ITU-R 601 integer weights, 299r+587g+114b over 1000) block-
    * averaged onto a 9×8 grid (floor cell boundaries gx·w/9 — exact
    * integer partition of any size), one bit per horizontal neighbor
    * comparison → 64 bits. All-integer, so the hash is a pure function
    * of pixel content.
    *
    * The invariance that makes it PERCEPTUAL is exact here, not
    * approximate: a uniform channel shift of +s changes every
    * luminance by precisely +s (the weight sum is 1000, so
    * (X + 1000s)/1000 = X/1000 + s under integer division) and every
    * cell mean by +s (n·s extra over n pixels), leaving every
    * comparison bit unchanged — PROVIDED no channel clamps at 255.
    * q260's ±shift assets are constructed to stay below the clamp, so
    * dHash equality across the photometric edit is arithmetic, not
    * luck. */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val means = Array.ofDim[Long](8, 9)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 9) {
        val (x0, x1) = (gx * w / 9, (gx + 1) * w / 9)
        val (y0, y1) = (gy * h / 8, (gy + 1) * h / 8)
        var (sum, n) = (0L, 0L)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            sum += (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
              114L * (p & 0xff)) / 1000L
            n += 1
            x += 1
          }
          y += 1
        }
        means(gy)(gx) = if (n == 0) 0L else sum / n
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      val (gy2, gx2) = (i / 8, i % 8)
      if (means(gy2)(gx2) > means(gy2)(gx2 + 1)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Uniform brightness shift: every channel +s on a fresh raster.
    * Callers must keep max(channel)+s ≤ 255 — clamping would break
    * [[dHash64]]'s exact shift invariance (the synthetic gradients top
    * out at 250/240/238, so +5 is always safe). */
  def brightnessShift(img: java.awt.image.BufferedImage,
                      s: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        val r = ((p >> 16) & 0xff) + s
        val g = ((p >> 8) & 0xff) + s
        val b = (p & 0xff) + s
        require(r <= 255 && g <= 255 && b <= 255,
          s"brightnessShift(+$s) clamped at ($x,$y) — invariance broken")
        out.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Canonical pixel fingerprint: md5 over the ARGB raster in row-major
    * order. `getRGB` normalizes every backing raster layout (BMP's
    * 3BYTE_BGR, PNG's INT_RGB, …) to packed ARGB, so two containers of
    * the same pixels fingerprint identically — the container-invariant
    * content hash byte-level dedup can't provide. */
  def pixelMd5(img: java.awt.image.BufferedImage): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(4)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        buf.clear(); buf.putInt(img.getRGB(x, y))
        md.update(buf.array()); x += 1
      }
      y += 1
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Fallback decoder for payloads no codec accepts — deterministic
    * byte-derived metadata/features (the honest stand-in for the audio/
    * video codecs this environment doesn't ship). */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bs = row.bytes
    def at(i: Int): Int = if (bs.isEmpty) 0 else bs(i % bs.length) & 0xff
    val width = 16 + at(0) % 240
    val height = 16 + at(1) % 240
    val nFrames = row.kind match {
      case "video" => 1 + at(2) % 32
      case "audio" => 1 + at(2) % 8
      case _       => 1
    }
    // 8-dim "embedding": byte histogram moments, deterministic
    val feats = Array.tabulate(8) { d =>
      var acc = 0L
      var i = d
      while (i < bs.length) { acc += (bs(i) & 0xff); i += 8 }
      (acc % 1000).toFloat / 1000f
    }
    MediaFeatures(row.media_id, row.kind, width, height, nFrames, feats)
  }

  /** Distributed decode + feature extraction: per-partition batch loop
    * (mapPartitions — one closure invocation per partition, streaming
    * through rows, the JVM analog of a batched Pandas UDF). Real
    * ImageIO decode for image payloads, stub fallback otherwise. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decode))
  }

  /** Thumbnail resize planning: aspect-preserving integer downscale to
    * `target` on the long side (no-op when already within bounds). Pure
    * integer arithmetic — `floor(dim * target / maxSide)` — so the
    * output dims are exactly restatable cross-engine. In production the
    * same mapPartitions pass would hold the pixel resample; here the
    * decode is the documented stub, and the resize math (the part a
    * pipeline gets wrong: rounding, degenerate 1-pixel dims, upscale
    * avoidance) is the tested surface. */
  def resizePlan(media: Dataset[MediaRow], target: Int): DataFrame = {
    import media.sparkSession.implicits._
    decodeAll(media).map { f =>
      val m = math.max(f.width, f.height)
      val (ow, oh) =
        if (m <= target) (f.width, f.height)
        else (math.max(1, f.width * target / m),
              math.max(1, f.height * target / m))
      (f.media_id, f.kind, f.width, f.height, ow, oh)
    }.toDF("media_id", "kind", "width", "height", "out_w", "out_h")
  }

  /** Frame sampling for video assets: every strideth 16-byte chunk of
    * the payload becomes a "frame" (binary). Real pipelines would emit
    * decoded frames; the chunking/explode plumbing is the same. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { m =>
        m.bytes.grouped(16).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, idx) => (m.media_id, idx, chunk) }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }
}
