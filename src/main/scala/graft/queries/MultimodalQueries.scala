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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_media_kind_stats"  -> (mediaKindStats _),
    "q74_video_frame_sample" -> (videoFrameSample _),
    "q175_media_resize_plan" -> (mediaResizePlan _)
  )

  val oracles: Map[String, String] = Map(
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
