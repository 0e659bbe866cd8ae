package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting (Charikar 2002 random-hyperplane
  * sketch over token features): 64-bit fingerprint whose Hamming distance
  * approximates 1 - cosine similarity of the bag-of-words vectors.
  *
  * Built entirely from higher-order functions: per token take xxhash64,
  * then for each of 64 bit positions accumulate ±1 and keep the sign.
  * Candidate pairs at scale come from the pigeonhole chunk join: two docs
  * within Hamming distance d must share at least one of d+1 equal chunks —
  * a shuffle on (chunk_index, chunk_value), never an O(n²) comparison.
  */
object SimHash {

  /** Fast JVM-loop simhash over (id, text) — used on the hot path:
    * higher-order-function expressions are interpreted (not codegen'd) in
    * Spark, and the 64-lane accumulation per token made the pure-Column
    * form ~50× slower at bench scale. The closure runs per partition with
    * no shuffle; same algorithm, deterministic. The token hash
    * ([[graft.functions.Hash64.xxhash64String]] == Spark's `xxhash64`)
    * matches the Column [[simhash64]] form, so fingerprints from the two
    * forms are identical (verified in TextDedupSpec). */
  def simhashDataset(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, simhashLocal(text)) })
      .toDF("id", "sig")
  }

  /** Deterministic local simhash (token hash = xxhash64 of the token's
    * UTF-8 bytes, ±1 per bit lane, sign → fingerprint). */
  def simhashLocal(text: String): Long = {
    val counts = new Array[Int](64)
    val it = text.trim.split("\\s+").iterator
    while (it.hasNext) {
      val h = graft.functions.Hash64.xxhash64String(it.next())
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** 64-bit SimHash of whitespace tokens (duplicated tokens weigh more,
    * matching the classic term-frequency weighting). */
  def simhash64(textCol: Column): Column = {
    val hs = transform(graft.text.TextFunctions.tokens(textCol),
      t => xxhash64(t))
    // counts(i) = Σ_tokens (bit i set ? 1 : -1)
    def srl(h: Column, i: Column): Column =
      call_function("shiftrightunsigned", h, i)
    def sll(h: Column, i: Column): Column =
      call_function("shiftleft", h, i)
    val counts = aggregate(
      hs,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (c, i) => c + when(srl(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    // fingerprint = Σ_{i: counts(i) > 0} 2^i
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, sll(lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-duplicate candidate pairs with Hamming distance ≤ maxDist,
    * found via the (maxDist+1)-chunk pigeonhole join. nChunks must be
    * > maxDist for the guarantee to hold (default 4 chunks of 16 bits
    * covers maxDist ≤ 3; raise chunks for looser thresholds). */
  def nearDuplicatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      nChunks: Int = 4): DataFrame = {
    require(nChunks > maxDist, "pigeonhole needs nChunks > maxDist")
    val bitsPer = 64 / nChunks
    val mask = (1L << bitsPer) - 1
    // persisted: the fingerprint scan feeds both sides of the pigeonhole
    // self-join — without it the simhash computation runs twice
    val withSig = simhashDataset(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val entries = withSig.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(nChunks - 1)), i =>
        struct(i.as("chunk"),
          call_function("shiftrightunsigned", col("sig"), i * bitsPer)
            .bitwiseAND(mask).as("cval")))).as("e"))
      .select(col("id"), col("sig"),
        col("e.chunk").as("chunk"), col("e.cval").as("cval"))

    val a = entries.alias("a")
    val b = entries.alias("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
        col("a.cval") === col("b.cval") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }
}
