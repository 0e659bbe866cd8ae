package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection, the standard web-scale dedup
  * pipeline (shingle → minhash signature → band buckets → bucket join →
  * exact-Jaccard verify on candidates).
  *
  * Scale design (100 TB): the only shuffle is on (band, bucket-hash) —
  * candidate generation is linear in input + bucket collisions, never the
  * O(n²) cross join. Exact verification runs only on candidate pairs.
  * Everything is built-in higher-order functions (codegen'd); signatures
  * are `array<bigint>` of length k = bands × rowsPerBand, 8k bytes per
  * doc in the shuffle instead of the document text.
  */
object MinHash {

  /** Word n-shingles (n consecutive tokens joined by a space). Documents
    * shorter than n tokens get one whole-document shingle. */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(c)
    val count = size(toks) - (n - 1)
    when(count >= 1,
      array_distinct(transform(sequence(lit(0), count - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Mersenne prime 2³¹−1: hash-family modulus. Products a·h with
    * a, h < p stay under 2⁶², so ANSI-mode long arithmetic never
    * overflows. */
  val P: Long = 2147483647L

  /** Deterministic universal hash family h_i(x) = (a_i·x + b_i) mod p,
    * seeds derived from splitmix64 of the index (a ∈ [1,p), b ∈ [0,p)). */
  private def seeds(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      (math.floorMod(splitmix64(2L * i + 1), P - 1) + 1,
        math.floorMod(splitmix64(2L * i + 2), P))
    }

  private def splitmix64(seed: Long): Long =
    graft.functions.Hash64.splitmix64(seed)

  /** MinHash signature (array<long>, length k) over a shingle array. */
  def signature(shingles: Column, k: Int): Column = {
    val hs = transform(shingles, s => pmod(xxhash64(s), lit(P)))
    val seedArr = array(seeds(k).map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    transform(seedArr, s =>
      array_min(transform(hs, h =>
        pmod(s.getField("a") * h + s.getField("b"), lit(P)))))
  }

  /** Estimated Jaccard from two signatures: fraction of agreeing slots. */
  def estimatedJaccard(sigA: Column, sigB: Column, k: Int): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x))
      .cast("double") / k

  /** Exact Jaccard between two shingle-set columns (distinct sets). */
  def exactJaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** JVM fast path: per-partition computation of distinct shingle hashes
    * and the minhash signature in tight loops (the HOF form interpreted
    * k×|shingles| lambda calls per doc — measured ~6× slower at bench
    * scale). Shares both the (a,b) permutation seeds AND the base
    * shingle hash ([[graft.functions.Hash64.xxhash64String]] ==
    * Spark's `xxhash64`) with the Column [[signature]] form, so the two
    * forms produce IDENTICAL signatures (verified in MinHashSpec).
    * Shingle identity keeps the full 64-bit hash (collisions ~2⁻⁶⁴ —
    * negligible for exact-Jaccard verification). */
  def signatureDataset(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int, k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val sd = seeds(k).toArray
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.trim.split("\\s+")
        val shingleStrs: Iterator[String] =
          if (toks.length >= shingleN) toks.sliding(shingleN).map(_.mkString(" "))
          else Iterator(toks.mkString(" "))
        // shingle identity keeps the full 64-bit hash (collision odds
        // ~2⁻⁶⁴ — safe for exact-Jaccard equality checks); the minhash
        // permutations reduce mod P internally. Sorted primitive array +
        // in-place dedup (no boxed TreeSet in the per-doc hot path).
        val raw = shingleStrs
          .map(graft.functions.Hash64.xxhash64String).toArray
        java.util.Arrays.sort(raw)
        var w = 0
        var rIdx = 0
        while (rIdx < raw.length) {
          if (w == 0 || raw(rIdx) != raw(w - 1)) { raw(w) = raw(rIdx); w += 1 }
          rIdx += 1
        }
        val sh = if (w == raw.length) raw else java.util.Arrays.copyOf(raw, w)
        // hoist the mod-P reduction of each shingle hash out of the
        // permutation loop (it is identical for every j) — bit-identical
        // signatures, k× fewer floorMods in the hot path
        val hm = new Array[Long](sh.length)
        var m0 = 0
        while (m0 < sh.length) { hm(m0) = math.floorMod(sh(m0), P); m0 += 1 }
        val sig = new Array[Long](k)
        var j = 0
        while (j < k) {
          val (a, b) = sd(j)
          var best = Long.MaxValue
          var m = 0
          while (m < hm.length) {
            val v = math.floorMod(a * hm(m) + b, P)
            if (v < best) best = v
            m += 1
          }
          sig(j) = best
          j += 1
        }
        (id, sh, sig)
      })
      .toDF("id", "sh", "sig")
  }

  /** Exact top-k document pairs by n-gram Jaccard similarity, computed
    * with a broadcast nested loop over per-doc sorted shingle-hash sets
    * and per-partition top-k pruning (same shape as
    * [[graft.vector.VectorFunctions.topPairsExactFast]]). Jaccard values
    * are ratios of small integers — deterministic and engine-portable.
    * The heap orders by the full output total order (j desc, id_a,
    * id_b), so ties at the cutoff resolve identically everywhere.
    * For corpora beyond broadcast size use [[nearDuplicatePairs]]. */
  def jaccardTopPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      collectShingleSets(docs, idCol, textCol, shingleN))
    // total order for "better": higher j, then smaller ids
    implicit val ord: Ordering[(Double, Long, Long)] =
      Ordering.fromLessThan[(Double, Long, Long)] { (p, q) =>
        if (p._1 != q._1) p._1 < q._1
        else if (p._2 != q._2) p._2 > q._2
        else p._3 > q._3
      }
    val ids = docs.select(col(idCol).cast("long")).as[Long]
    val cands = ids.mapPartitions { it =>
      val all = bc.value
      val idArr = all.map(_._1)
      val byId = all.toMap
      val heap = scala.collection.mutable.PriorityQueue
        .empty[(Double, Long, Long)](ord.reverse) // min-heap: worst on top
      for (lid <- it) {
        val a = byId(lid)
        var j = java.util.Arrays.binarySearch(idArr, lid) + 1
        while (j < all.length) {
          val (rid, b) = all(j)
          // once the heap is full, a pair can only enter with
          // jac ≥ heap-min — prune with the shared threshold machinery
          val union0 = a.length + b.length
          val needInter =
            if (heap.size < k) 0
            else needIntersection(heap.head._1, union0)
          val inter = prunedIntersection(a, b, needInter)
          if (inter >= 0) {
            val jac = inter.toDouble / (union0 - inter)
            if (heap.size < k) heap.enqueue((jac, lid, rid))
            else {
              val h = heap.head
              // primitive compare first; allocate only on admit
              if (jac > h._1 || (jac == h._1 &&
                  (lid < h._2 || (lid == h._2 && rid < h._3)))) {
                heap.dequeue(); heap.enqueue((jac, lid, rid))
              }
            }
          }
          j += 1
        }
      }
      heap.iterator
    }
    cands.toDF("jaccard", "id_a", "id_b")
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** ALL document pairs with exact n-gram Jaccard ≥ `minJ`, via the same
    * broadcast nested loop as [[jaccardTopPairs]] but threshold-pruned
    * instead of heap-pruned: a pair reaches the merge only if
    * `min(|a|,|b|) ≥ ceil(minJ·(|a|+|b|)/(1+minJ))` (jac = m/(|a|+|b|−m)
    * is monotone in m), and the merge aborts as soon as the remaining
    * elements cannot reach that intersection. At high thresholds this
    * rejects almost every pair on the two length fields alone.
    *
    * This is the ground-truth side of an LSH recall check (q85): O(n²)
    * candidate loop, so at true corpus scale run it on a sample — the
    * production dedup path stays [[nearDuplicatePairs]]. */
  def jaccardThresholdPairs(docs: DataFrame, idCol: String, textCol: String,
                            shingleN: Int, minJ: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      collectShingleSets(docs, idCol, textCol, shingleN))
    val ids = docs.select(col(idCol).cast("long")).as[Long]
    val pairs = ids.mapPartitions { it =>
      val all = bc.value
      val idArr = all.map(_._1)
      val byId = all.toMap
      it.flatMap { lid =>
        val a = byId(lid)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var j = java.util.Arrays.binarySearch(idArr, lid) + 1
        while (j < all.length) {
          val (rid, b) = all(j)
          val union0 = a.length + b.length
          val inter = prunedIntersection(a, b, needIntersection(minJ, union0))
          if (inter >= 0) {
            val jac = inter.toDouble / (union0 - inter)
            if (jac >= minJ) out += ((lid, rid, jac))
          }
          j += 1
        }
        out.iterator
      }
    }
    pairs.toDF("id_a", "id_b", "jaccard")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Collected, id-sorted (id, sorted-distinct shingle-hash set) array —
    * the broadcast side of the exact pair scans. */
  private def collectShingleSets(docs: DataFrame, idCol: String,
                                 textCol: String, shingleN: Int)
      : Array[(Long, Array[Long])] = {
    import docs.sparkSession.implicits._
    signatureDataset(docs, idCol, textCol, shingleN, 1)
      .select(col("id"), col("sh")).as[(Long, Array[Long])]
      .collect().sortBy(_._1)
  }

  /** Minimal intersection size for jac ≥ minJ at a given size-sum
    * (jac = m/(union0−m) is monotone in m). 1e-9 slack: the exact
    * threshold is a ratio of small ints; double rounding can land an ulp
    * ABOVE an integer and ceil would then prune a pair tied exactly at
    * the threshold that should survive. The slack is far larger than the
    * ~1e-11 arithmetic error and far smaller than the ~1e-5 gap between
    * distinct small-int ratios, so pruning stays tight and never drops
    * a tie. */
  private def needIntersection(minJ: Double, union0: Int): Int =
    math.ceil(minJ * union0 / (1.0 + minJ) - 1e-9).toInt

  /** Sorted-merge intersection size, or −1 as soon as the remaining
    * elements cannot reach `needInter` (0 never aborts). Ties exactly at
    * `needInter` complete fully, so threshold/tiebreak semantics of the
    * callers are unaffected by the pruning. */
  private def prunedIntersection(a: Array[Long], b: Array[Long],
                                 needInter: Int): Int = {
    if (math.min(a.length, b.length) < needInter) return -1
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
      if (inter + math.min(a.length - i, b.length - j) < needInter) return -1
    }
    inter
  }

  /** Candidate near-duplicate pairs via banded LSH + exact verification.
    *
    * @param docs      (id, text) frame
    * @param idCol     id column name
    * @param textCol   text column name
    * @param shingleN  tokens per shingle
    * @param bands     LSH bands
    * @param rowsPerBand signature rows per band (k = bands·rowsPerBand)
    * @param threshold exact-Jaccard acceptance threshold
    * @return (id_a, id_b, jaccard) with id_a < id_b, verified ≥ threshold
    */
  def nearDuplicatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val k = bands * rowsPerBand
    // persisted: the signature scan feeds three plan branches (band
    // entries + both sides of the pair verification join) — without it
    // the shingle/signature computation runs three times
    val prepared = signatureDataset(docs, idCol, textCol, shingleN, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // explode ONLY (id, band, bucket) into the candidate-generation
    // shuffle — carrying the shingle array through the explode would
    // multiply shuffle volume by `bands`; the (much larger) shingle sets
    // are joined back onto the candidate PAIRS for verification, which
    // are few
    val entries = prepared.select(
      col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          // xxhash64 hashes array<bigint> elementwise-recursively —
          // no JSON string materialization per (doc, band)
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
            .as("bucket"))))
        .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val a = entries.alias("a")
    val b = entries.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val shingles = prepared.select(col("id"), col("sh"))
    candidates
      .join(shingles.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingles.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", exactJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
