package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every character k-gram with a
  * polynomial rolling hash, then keep the minimum hash of each window of
  * `w` consecutive k-gram hashes (rightmost minimum on ties, consecutive
  * duplicates collapsed). The selected set is the document's fingerprint.
  *
  * Guarantee (the property the q89 gate rests on): any substring match of
  * length ≥ w + k − 1 between two documents produces at least one SHARED
  * fingerprint, because the window of k-gram hashes inside the match is
  * identical in both documents and winnowing picks the same minimum.
  *
  * Scale notes: fingerprinting is a stateless per-row map (codegen-
  * friendly mapPartitions, no shuffle); the fingerprint set is ~|text|/w
  * longs — the shuffle-side stand-in for the full text in dedup joins.
  * On corpora with a rich vocabulary the fingerprint inverted index
  * (explode → groupBy fp) is the candidate generator; on this synthetic
  * corpus the ~30-token vocabulary makes every k-gram near-universal, so
  * the query surface (q89) verifies the sharing guarantee on the exact
  * near-dup pairs instead of building the index.
  */
object Winnow {

  /** Rolling-hash winnow fingerprints of one string. Deterministic:
    * polynomial hash base 257 mod 2⁶³ (odd multiplier keeps full
    * avalanche on the low bits we compare), robust-winnowing tie rule. */
  def fingerprintsLocal(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    val s = text
    if (s.length < k) return Array(polyHash(s, 0, s.length))
    val nGrams = s.length - k + 1
    val hs = new Array[Long](nGrams)
    // rolling update: h_{i+1} = (h_i - s(i)*B^{k-1}) * B + s(i+k)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hs(0) = finalize64(h)
    var topPow = 1L
    i = 0
    while (i < k - 1) { topPow *= B; i += 1 }
    i = 1
    while (i < nGrams) {
      h = (h - s.charAt(i - 1) * topPow) * B + s.charAt(i + k - 1)
      hs(i) = finalize64(h)
      i += 1
    }
    if (nGrams <= w) {
      // degenerate: one window — the global minimum is the fingerprint
      var best = hs(0); var j = 1
      while (j < nGrams) { if (hs(j) <= best) best = hs(j); j += 1 }
      return Array(best)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastPickIdx = -1
    var win = 0
    while (win <= nGrams - w) {
      // rightmost minimum in hs[win, win+w)
      var minIdx = win
      var j = win + 1
      while (j < win + w) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
      if (minIdx != lastPickIdx) { out += hs(minIdx); lastPickIdx = minIdx }
      win += 1
    }
    out.distinct.sorted.toArray
  }

  private val B = 257L

  /** Mix the raw polynomial value so window minima are uniformly
    * distributed (raw poly hashes of similar strings cluster). */
  private def finalize64(x: Long): Long =
    graft.functions.Hash64.splitmix64(x)

  private def polyHash(s: String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = h * B + s.charAt(i); i += 1 }
    finalize64(h)
  }

  /** (id, fps: array<bigint>) fingerprint frame over a document table. */
  def fingerprintDataset(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, w: Int = 4): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, fingerprintsLocal(text, k, w))
      })
      .toDF("id", "fps")
  }

  /** For each given (id_a, id_b) pair, whether the two documents share at
    * least one winnow fingerprint. Fingerprints are joined onto the
    * (few) pairs — never self-joined — so cost is linear in corpus +
    * pairs regardless of how common the k-grams are. */
  def sharesFingerprint(docs: DataFrame, idCol: String, textCol: String,
                        pairs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    // persisted: the fingerprint frame feeds both sides of the pair
    // join — without it the whole-corpus rolling-hash scan runs twice
    val fps = fingerprintDataset(docs, idCol, textCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs
      .join(fps.select(col("id").as("id_a"), col("fps").as("fps_a")), "id_a")
      .join(fps.select(col("id").as("id_b"), col("fps").as("fps_b")), "id_b")
      .withColumn("shares_fp",
        size(array_intersect(col("fps_a"), col("fps_b"))) >= 1)
      .drop("fps_a", "fps_b")
  }
}
