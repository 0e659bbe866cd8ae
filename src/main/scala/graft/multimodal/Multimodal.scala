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
  * The DECODE STEP IS A STUB: no image/audio codecs exist in this
  * environment, so [[decodeStub]] derives deterministic fake
  * width/height/frames/features from the payload bytes. The Spark-side
  * plumbing — binary column handling, schema, `mapPartitions` batch shape
  * (the Scala analog of a `mapInPandas` batch UDF), partition-parallel
  * decode — is real and tested; swap [[decodeStub]] for a codec call in
  * production.
  *
  * Scale notes: decode runs per-partition with no shuffle; payloads never
  * leave the executor that scanned them. Feature vectors (small) are what
  * flows onward. Repartition before decode only to balance CPU, not data.
  */
object Multimodal {

  /** Synthesize a deterministic media table from `documents` (binary
    * payload = UTF-8 bytes of the text — a stand-in for real encoded
    * assets; kind assigned round-robin by id). */
  def syntheticMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        col("n_chars").cast("int").as("declared_len"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake metadata/features from bytes.
    * Replace with real codec calls (e.g. javax.imageio / ffmpeg bindings)
    * in an environment that has them. */
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
    * through rows, the JVM analog of a batched Pandas UDF). */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
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
