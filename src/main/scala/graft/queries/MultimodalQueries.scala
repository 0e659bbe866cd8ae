package graft.queries

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal-column queries: the binary-payload plumbing
  * (schema, per-partition decode batches, frame-sample explode) driven
  * through the named-query surface. Image assets are REAL BMPs decoded
  * by `javax.imageio.ImageIO` ([[Multimodal.decode]]); the BMP byte
  * layout makes sizes/dims engine-portable arithmetic, so the columns
  * stay oracle-checked. Decode *features* and the PNG/BMP codec round
  * trip are covered by MultimodalIngestSpec. */
object MultimodalQueries {

  /** Per-kind asset stats over the binary payload column: row counts,
    * total payload bytes, declared-length bounds. `length(binary)` is
    * the byte length — matches DuckDB `octet_length(encode(text))`. */
  def mediaKindStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.syntheticMediaTable(s, dir).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length(col("bytes")).cast("long")).as("total_bytes"),
        min(col("declared_len")).cast("long").as("min_declared"),
        max(col("declared_len")).cast("long").as("max_declared"))
      .orderBy(col("kind"))

  /** Frame sampling for video assets (stride 4 over 16-byte chunks):
    * the explode/flatMap plumbing counted per asset — sampled frames =
    * ceil(ceil(bytes/16) / 4), pure arithmetic the oracle reproduces. */
  def videoFrameSample(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMediaTable(s, dir)
    Multimodal.sampleFrames(media, stride = 4)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(length(col("frame_bytes")).cast("long")).as("sampled_bytes"))
      .orderBy(col("media_id"))
  }

  /** q175: thumbnail resize planning over the decoded dims
    * ([[Multimodal.resizePlan]] — aspect-preserving integer downscale to
    * 64 on the long side). Image dims come from ImageIO's REAL decode of
    * the BMP payload; the BMP was synthesized at dims derived from the
    * text's first two bytes (ASCII corpus: the first two characters),
    * and audio/video fall back to the stub with the same formula — so
    * DuckDB restates the whole synthesize→decode→resize chain with
    * `ord(substr(text, …))` and integer division, and the oracle pins
    * the rounding/no-upscale/degenerate-dim rules exactly. */
  def mediaResizePlan(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(Multimodal.syntheticMediaTable(s, dir), 64)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum((col("out_w") * col("out_h")).cast("long")).as("thumb_pixels"),
        max(col("out_w")).cast("long").as("max_w"),
        max(col("out_h")).cast("long").as("max_h"),
        sum(when(col("out_w") === col("width"), 1L).otherwise(0L))
          .as("n_unscaled"))
      .orderBy(col("kind"))

  /** q230: audio metadata through the REAL JDK codec — every audio-kind
    * asset synthesized as a genuine 16-bit mono 8 kHz PCM WAV
    * ([[Multimodal.encodeWav]], sample count derived from the text's
    * first two bytes) and parsed back with `javax.sound.sampled`
    * ([[Multimodal.audioMeta]]): the reported rate/channels/bits/frames
    * are the codec's, not ours. The WAV layout makes every aggregate
    * pure arithmetic for the oracle (bytes = 44 + 2·frames), and the
    * format facts pin as stable booleans (q84's gate pattern). Scale
    * shape: per-partition encode+parse with no shuffle, one global
    * aggregate — identical to the image decode pass. */
  def audioWavMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val metas = graft.Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 3 === 1) // the audio-kind assets
      .select(col("doc_id").as("_1"), col("text").as("_2"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val utf8 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def at(i: Int): Int = if (utf8.isEmpty) 0 else utf8(i % utf8.length) & 0xff
        val wav = Multimodal.encodeWav(
          256 + (at(0) * 256 + at(1)) % 4096, 8000, id)
        val (rate, channels, frames, bits) = Multimodal.audioMeta(wav)
          .getOrElse(sys.error(s"JDK WAV parse failed for asset $id"))
        (id, wav.length.toLong, rate, channels, frames, bits)
      }
      .toDF("media_id", "n_bytes", "rate_hz", "channels", "frames", "bits")
    metas.agg(
      count(lit(1)).as("n_assets"),
      sum(col("n_bytes")).as("total_bytes"),
      sum(col("frames")).as("total_frames"),
      (countDistinct(col("rate_hz")) === 1 && min(col("rate_hz")) === 8000)
        .as("rate_ok"),
      (min(col("channels")) === 1 && max(col("channels")) === 1 &&
        min(col("bits")) === 16 && max(col("bits")) === 16).as("mono16_ok"),
      (min(col("n_bytes") - col("frames") * 2) === 44 &&
        max(col("n_bytes") - col("frames") * 2) === 44).as("layout_ok"))
  }

  /** q237: container-invariant pixel dedup — the multimodal dedup rule
    * byte hashing cannot express: the SAME pixel content shipped in two
    * different containers (a hand-built BMP and the JDK encoder's PNG of
    * its decoded raster) must dedupe together. Each image-kind doc
    * yields two assets of its class's pixels (class = doc_id % 7, so
    * duplicate groups are PLANTED arithmetically); assets are
    * fingerprinted two ways — md5 of the raw container bytes vs md5 of
    * the decoded ARGB raster ([[Multimodal.pixelMd5]]). Byte groups
    * split per container (PNG bytes never equal BMP bytes); pixel
    * groups unite them, and `cross_container_pairs` counts exactly the
    * duplicates only the decode-then-hash pass can see. Every group
    * cardinality is doc_id arithmetic, so the oracle restates all six
    * facts from `documents` — an accidental hash collision, a
    * nondeterministic encoder, or a raster-order change breaks the
    * match. Scale shape: per-partition encode/decode/hash with no
    * shuffle, then two hash-group aggregations over fingerprint keys. */
  def pixelDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = graft.Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 3 === 0) // the image-kind assets
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val bmp = Multimodal.encodeBmp(32, 24, id % 7)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bmp))
          val png = Multimodal.encodePng(img)
          val pix = Multimodal.pixelMd5(img)
          // the PNG re-decodes to the same raster — fingerprint it
          // independently so a lossy/reordering codec would be caught
          val pix2 = Multimodal.pixelMd5(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png)))
          Iterator((id, "bmp", bmp, pix), (id, "png", png, pix2))
        }
      }
      .toDF("doc_id", "container", "bytes", "pixel_md5")
      .withColumn("byte_md5", md5(col("bytes")))
    val byteG = hashed.groupBy(col("byte_md5")).agg(count(lit(1)).as("k"))
    val pixG = hashed.groupBy(col("pixel_md5")).agg(count(lit(1)).as("k"))
    def pairs(k: org.apache.spark.sql.Column) = (k * (k - 1) / 2).cast("long")
    val b = byteG.agg(count(lit(1)).as("bg"), sum(pairs(col("k"))).as("bp")).head()
    val p = pixG.agg(count(lit(1)).as("pg"), sum(pairs(col("k"))).as("pp")).head()
    val n = hashed.count()
    graft.util.LocalFrame.materialize(Seq(
      ("byte_dup_pairs", b.getLong(1)),
      ("byte_groups", b.getLong(0)),
      ("cross_container_pairs", p.getLong(1) - b.getLong(1)),
      ("n_assets", n),
      ("pixel_dup_pairs", p.getLong(1)),
      ("pixel_groups", p.getLong(0))
    ).toDF("fact", "n").orderBy(col("fact")))
  }

  /** q260: PERCEPTUAL image dedup via difference hash
    * ([[Multimodal.dHash64]]) — the near-dup layer above q237's
    * pixel-exact dedup: each image-kind doc ships its class TEXTURE
    * ([[Multimodal.encodeTextureBmp]] — the q242 gradient is
    * dHash-degenerate: monotonic rows hash to zero for every seed,
    * DHashSpec proves it) twice, once as the original BMP and once
    * brightness-shifted +5
    * and re-encoded PNG. The photometric edit defeats BOTH byte-level
    * and pixel-exact hashing (every raster value changed), yet dHash
    * unifies the pair EXACTLY: the +5 shift moves every luminance and
    * every 9×8 cell mean by precisely +5 (integer identity, no channel
    * clamps — the gradients top out at 250/240/238), so all 64
    * neighbor-comparison bits are unchanged. That is the
    * scaled-down form of the real pipeline question — "same image,
    * different exposure/re-encode" — answered with arithmetic instead
    * of a tolerance knob.
    *
    * Every published count is doc_id arithmetic (class = doc_id % 7):
    * pixel groups split 2-per-class, dHash groups close back to
    * 1-per-class, and the orig×shifted pair count per class is m².
    * The oracle restates all five facts from `documents` alone — a
    * dHash that loses shift invariance, collides classes, or a codec
    * that perturbs pixels breaks the match. Scale shape: per-partition
    * encode/decode/hash (no shuffle), then fingerprint-keyed
    * aggregates; three bounded scalars on the driver. */
  def perceptualDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = graft.Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val bmp = Multimodal.encodeTextureBmp(32, 24, id % 7)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bmp))
          val shifted = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              Multimodal.encodePng(Multimodal.brightnessShift(img, 5))))
          Iterator(
            (id, "orig", Multimodal.pixelMd5(img), Multimodal.dHash64(img)),
            (id, "plus5", Multimodal.pixelMd5(shifted),
              Multimodal.dHash64(shifted)))
        }
      }
      .toDF("doc_id", "variant", "pixel_md5", "dhash")
      .persist()
    val n = hashed.count()
    val pixG = hashed.groupBy(col("pixel_md5")).agg(count(lit(1)).as("k"))
      .agg(count(lit(1))).head().getLong(0)
    val d = hashed.groupBy(col("dhash")).agg(
        count(lit(1)).as("k"),
        sum(when(col("variant") === "orig", 1L).otherwise(0L)).as("o"),
        sum(when(col("variant") === "plus5", 1L).otherwise(0L)).as("p"))
      .agg(count(lit(1)).as("dg"), max(col("k")).as("mx"),
        sum(col("o") * col("p")).as("pairs")).head()
    val res = graft.util.LocalFrame.materialize(Seq(
      ("dhash_groups", d.getLong(0)),
      ("max_dhash_group", d.getLong(1)),
      ("n_assets", n),
      ("photometric_pairs", d.getLong(2)),
      ("pixel_groups", pixG)
    ).toDF("fact", "n").orderBy(col("fact")))
    hashed.unpersist()
    res
  }

  /** q241: PCM sample statistics through the REAL audio codec — q230
    * trusts the WAV header; this drains the stream
    * ([[Multimodal.audioSamples]]) and aggregates the decoded samples
    * themselves. The synthesized sawtooth is pure integer arithmetic
    * (`((i·(7 + seed%13) + seed) % 8192) − 4096`), so the oracle
    * recomputes every per-asset sum/abs-sum/min/max from `documents`
    * alone — a codec that mis-frames, byte-swaps, or truncates the
    * payload diverges on the first asset. Row-level output (one row per
    * audio asset), no shuffle until the final sort. */
  def audioSampleStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id").as("_1"), col("text").as("_2"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val utf8 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def at(i: Int): Int =
          if (utf8.isEmpty) 0 else utf8(i % utf8.length) & 0xff
        val wav = Multimodal.encodeWav(
          256 + (at(0) * 256 + at(1)) % 4096, 8000, id)
        val xs = Multimodal.audioSamples(wav)
        (id, xs.length.toLong, xs.map(_.toLong).sum,
          xs.map(v => math.abs(v.toLong)).sum,
          xs.min.toLong, xs.max.toLong)
      }
      .toDF("media_id", "n_frames", "sum_samples", "sum_abs",
        "min_sample", "max_sample")
      .orderBy(col("media_id"))
  }

  /** q242: exact per-channel pixel sums through the REAL image codec —
    * the image twin of q241: the BMP is synthesized as a seed-salted
    * gradient (B=(x+seed)%251, G=(y+seed)%241, R=(x+y+seed)%239), so
    * the per-asset channel sums over the ImageIO-decoded raster are
    * pure arithmetic the oracle recomputes from `documents` alone — a
    * decoder that swaps BGR/RGB or mis-pads rows diverges immediately
    * (the channel formulas are asymmetric in x and y so transposition
    * is caught too). Plain sums are orientation-invariant, so a
    * y-WEIGHTED green sum pins the bottom-up row order as well: BMP
    * stores the bottom row first, so decoded G(x,y) is
    * ((h−1−y)+seed)%241 and the oracle bakes that flip in — a decoder
    * that returned rows in file order would diverge on it.
    * Per-partition decode, row-level output, no shuffle until the
    * sort. */
  def imagePixelSums(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("_1"), col("text").as("_2"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val utf8 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def at(i: Int): Int =
          if (utf8.isEmpty) 0 else utf8(i % utf8.length) & 0xff
        val bmp = Multimodal.encodeBmp(16 + at(0) % 240, 16 + at(1) % 240, id)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bmp))
        var (sr, sg, sb, wg) = (0L, 0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            val g = (p >> 8) & 0xff
            sr += (p >> 16) & 0xff; sg += g; sb += p & 0xff
            wg += y.toLong * g
            x += 1
          }
          y += 1
        }
        (id, img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb, wg)
      }
      .toDF("media_id", "w", "h", "sum_r", "sum_g", "sum_b", "wsum_g")
      .orderBy(col("media_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q242_image_pixel_sums" -> (imagePixelSums _),
    "q241_audio_sample_stats" -> (audioSampleStats _),
    "q237_pixel_dedup"      -> (pixelDedup _),
    "q260_perceptual_dedup" -> (perceptualDedup _),
    "q73_media_kind_stats"  -> (mediaKindStats _),
    "q74_video_frame_sample" -> (videoFrameSample _),
    "q175_media_resize_plan" -> (mediaResizePlan _),
    "q230_audio_wav_meta"   -> (audioWavMeta _)
  )

  val oracles: Map[String, String] = Map(
    // q242: gradient channel sums recomputed from the synthesis formula;
    // wsum_g bakes in BMP's bottom-up order (decoded row y = written
    // row h-1-y, so the weighted sum uses ((h-1-y)+seed)%241)
    "q242_image_pixel_sums" ->
      """WITH im AS (
        |  SELECT doc_id AS media_id, doc_id AS seed,
        |         16 + (CASE WHEN length(text) = 0 THEN 0
        |               ELSE ord(substr(text, 1, 1)) END) % 240 AS w,
        |         16 + (CASE WHEN length(text) = 0 THEN 0
        |               ELSE ord(substr(text, (1 % length(text)) + 1, 1))
        |               END) % 240 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |bx AS (
        |  SELECT media_id, CAST(sum((x + seed) % 251) AS BIGINT) AS sxb
        |  FROM (SELECT media_id, seed, UNNEST(range(0, w)) AS x FROM im)
        |  GROUP BY media_id),
        |gy AS (
        |  SELECT media_id,
        |         CAST(sum((y + seed) % 241) AS BIGINT) AS syg,
        |         CAST(sum(y * ((h - 1 - y + seed) % 241)) AS BIGINT) AS wyg
        |  FROM (SELECT media_id, seed, h, UNNEST(range(0, h)) AS y FROM im)
        |  GROUP BY media_id),
        |rx0 AS (SELECT media_id, seed, h, UNNEST(range(0, w)) AS x FROM im),
        |rx AS (
        |  SELECT media_id, CAST(sum((x + y + seed) % 239) AS BIGINT) AS sr
        |  FROM (SELECT media_id, seed, x, UNNEST(range(0, h)) AS y
        |        FROM rx0)
        |  GROUP BY media_id)
        |SELECT im.media_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
        |       rx.sr AS sum_r,
        |       CAST(im.w AS BIGINT) * gy.syg AS sum_g,
        |       CAST(im.h AS BIGINT) * bx.sxb AS sum_b,
        |       CAST(im.w AS BIGINT) * gy.wyg AS wsum_g
        |FROM im JOIN bx USING (media_id) JOIN gy USING (media_id)
        |JOIN rx USING (media_id)
        |ORDER BY media_id""".stripMargin,
    // q241: the decoded sawtooth recomputed sample-by-sample —
    // v(i) = ((i·(7 + seed%13) + seed) % 8192) − 4096, seed = doc_id
    "q241_audio_sample_stats" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id, doc_id AS seed,
        |         256 + ((CASE WHEN length(text) = 0 THEN 0
        |                 ELSE ord(substr(text, 1, 1)) END) * 256
        |              + (CASE WHEN length(text) = 0 THEN 0
        |                 ELSE ord(substr(text, (1 % length(text)) + 1, 1))
        |                 END)) % 4096 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT media_id, ((i * (7 + seed % 13) + seed) % 8192) - 4096 AS v
        |  FROM (SELECT media_id, seed, n, UNNEST(range(0, n)) AS i FROM a))
        |SELECT media_id, count(*) AS n_frames,
        |       CAST(sum(v) AS BIGINT) AS sum_samples,
        |       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |       CAST(min(v) AS BIGINT) AS min_sample,
        |       CAST(max(v) AS BIGINT) AS max_sample
        |FROM s GROUP BY media_id ORDER BY media_id""".stripMargin,
    // q260: the same doc_id arithmetic as q237 — classes split
    // 2-per-class under pixel hashing, close to 1-per-class under
    // dHash, m² orig×shifted pairs per class; a shift-variance bug, a
    // cross-class dhash collision, or a pixel-perturbing codec breaks
    // the restatement
    "q260_perceptual_dedup" ->
      """WITH img AS (SELECT doc_id % 7 AS cls FROM documents
        |             WHERE doc_id % 3 = 0),
        |g AS (SELECT cls, count(*) AS k FROM img GROUP BY cls)
        |SELECT * FROM (
        |  SELECT 'dhash_groups' AS fact, CAST(count(*) AS BIGINT) AS n
        |  FROM g
        |  UNION ALL SELECT 'max_dhash_group', CAST(2 * max(k) AS BIGINT)
        |  FROM g
        |  UNION ALL SELECT 'n_assets', CAST(sum(2 * k) AS BIGINT) FROM g
        |  UNION ALL SELECT 'photometric_pairs',
        |                   CAST(sum(k * k) AS BIGINT) FROM g
        |  UNION ALL SELECT 'pixel_groups', CAST(2 * count(*) AS BIGINT)
        |  FROM g)
        |ORDER BY fact""".stripMargin,
    // q237: duplicate groups planted as doc_id arithmetic (class =
    // doc_id % 7 over the image-kind docs); all six facts restated
    "q237_pixel_dedup" ->
      """WITH img AS (SELECT doc_id % 7 AS cls FROM documents
        |             WHERE doc_id % 3 = 0),
        |g AS (SELECT cls, count(*) AS k FROM img GROUP BY cls)
        |SELECT * FROM (
        |  SELECT 'byte_dup_pairs' AS fact,
        |         CAST(sum(2 * (k * (k - 1) / 2)) AS BIGINT) AS n FROM g
        |  UNION ALL SELECT 'byte_groups', CAST(2 * count(*) AS BIGINT) FROM g
        |  UNION ALL SELECT 'cross_container_pairs',
        |                   CAST(sum(k * k) AS BIGINT) FROM g
        |  UNION ALL SELECT 'n_assets', CAST(sum(2 * k) AS BIGINT) FROM g
        |  UNION ALL SELECT 'pixel_dup_pairs',
        |                   CAST(sum(2 * k * (2 * k - 1) / 2) AS BIGINT) FROM g
        |  UNION ALL SELECT 'pixel_groups', count(*) FROM g)
        |ORDER BY fact""".stripMargin,
    // decode stub (width = 16 + byte0 % 240, height = 16 + byte1 % 240)
    // + integer resize, byte i = ord of char (i % len) + 1 (ASCII corpus)
    "q175_media_resize_plan" ->
      """WITH d AS (
        |  SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)]
        |           AS kind,
        |         16 + (CASE WHEN length(text) = 0 THEN 0
        |               ELSE ord(substr(text, 1, 1)) END) % 240 AS w,
        |         16 + (CASE WHEN length(text) = 0 THEN 0
        |               ELSE ord(substr(text, (1 % length(text)) + 1, 1))
        |               END) % 240 AS h
        |  FROM documents),
        |r AS (
        |  SELECT kind, w, h,
        |         CASE WHEN greatest(w, h) <= 64 THEN w
        |              ELSE greatest(1, (w * 64) // greatest(w, h)) END AS ow,
        |         CASE WHEN greatest(w, h) <= 64 THEN h
        |              ELSE greatest(1, (h * 64) // greatest(w, h)) END AS oh
        |  FROM d)
        |SELECT kind, count(*) AS n,
        |       CAST(sum(ow * oh) AS BIGINT) AS thumb_pixels,
        |       CAST(max(ow) AS BIGINT) AS max_w,
        |       CAST(max(oh) AS BIGINT) AS max_h,
        |       CAST(sum(CASE WHEN ow = w THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_unscaled
        |FROM r GROUP BY kind ORDER BY kind""".stripMargin,
    // image payloads are REAL 24-bit BMPs written at formula dims, so
    // their byte size is exact arithmetic: 54-byte header + height
    // rows padded to 4 bytes. audio/video keep the raw text payload.
    "q73_media_kind_stats" ->
      """WITH d AS (
        |  SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)]
        |           AS kind,
        |         octet_length(encode(text)) AS tlen,
        |         16 + (CASE WHEN length(text) = 0 THEN 0
        |               ELSE ord(substr(text, 1, 1)) END) % 240 AS w,
        |         16 + (CASE WHEN length(text) = 0 THEN 0
        |               ELSE ord(substr(text, (1 % length(text)) + 1, 1))
        |               END) % 240 AS h,
        |         n_chars
        |  FROM documents)
        |SELECT kind, count(*) AS n_assets,
        |       CAST(SUM(CASE WHEN kind = 'image'
        |                THEN 54 + h * ((3 * w + 3) // 4 * 4)
        |                ELSE tlen END) AS BIGINT) AS total_bytes,
        |       CAST(min(n_chars) AS BIGINT) AS min_declared,
        |       CAST(max(n_chars) AS BIGINT) AS max_declared
        |FROM d GROUP BY kind ORDER BY kind""".stripMargin,
    // WAV layout law: 44-byte canonical header + 2 bytes/sample; the
    // codec-reported facts (8 kHz, mono, 16-bit, frames = sample count)
    // pin as booleans the SQL side states as constants
    "q230_audio_wav_meta" ->
      """WITH a AS (
        |  SELECT doc_id,
        |         256 + ((CASE WHEN length(text) = 0 THEN 0
        |                 ELSE ord(substr(text, 1, 1)) END) * 256
        |              + (CASE WHEN length(text) = 0 THEN 0
        |                 ELSE ord(substr(text, (1 % length(text)) + 1, 1))
        |                 END)) % 4096 AS n
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT count(*) AS n_assets,
        |       CAST(sum(44 + 2 * n) AS BIGINT) AS total_bytes,
        |       CAST(sum(n) AS BIGINT) AS total_frames,
        |       CAST(1 AS BOOLEAN) AS rate_ok,
        |       CAST(1 AS BOOLEAN) AS mono16_ok,
        |       CAST(1 AS BOOLEAN) AS layout_ok
        |FROM a""".stripMargin,
    // sampled chunk i kept when i % 4 == 0, i in [0, ceil(len/16)) →
    // n_sampled = ceil(ceil(len/16)/4); sampled bytes = 16 per full
    // chunk, len % 16 for a kept trailing partial chunk
    "q74_video_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, octet_length(encode(text)) AS len,
        |         CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT)
        |           AS n_chunks
        |  FROM documents
        |  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0)
        |SELECT media_id,
        |       CAST(ceil(n_chunks / 4.0) AS BIGINT) AS n_sampled,
        |       CAST(ceil(n_chunks / 4.0) AS BIGINT) * 16
        |         - (CASE WHEN (n_chunks - 1) % 4 = 0 AND len % 16 != 0
        |                 THEN 16 - (len % 16) ELSE 0 END) AS sampled_bytes
        |FROM v ORDER BY media_id""".stripMargin
  )
}
