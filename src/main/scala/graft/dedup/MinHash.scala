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

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

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
    * scale). Same hash family and seeds; shingle identity is its 64-bit
    * mixed hash (collisions ~2⁻⁶⁴ — negligible for Jaccard estimates). */
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
        val set = new java.util.TreeSet[java.lang.Long]()
        shingleStrs.foreach { s =>
          set.add(math.floorMod(
            mix64(scala.util.hashing.MurmurHash3.stringHash(s)), P))
        }
        val sh = new Array[Long](set.size)
        var i = 0
        val it = set.iterator()
        while (it.hasNext) { sh(i) = it.next(); i += 1 }
        val sig = new Array[Long](k)
        var j = 0
        while (j < k) {
          val (a, b) = sd(j)
          var best = Long.MaxValue
          var m = 0
          while (m < sh.length) {
            val v = math.floorMod(a * sh(m) + b, P)
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

  private def mix64(seed: Int): Long = {
    var z = seed.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
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
    val prepared = signatureDataset(docs, idCol, textCol, shingleN, k)

    // explode into (band, bucket) entries; bucket = hash of band slice
    val entries = prepared.select(
      col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(to_json(slice(col("sig"), b * rowsPerBand + 1,
              lit(rowsPerBand))))
            .as("bucket"))))
        .as("bb"))
      .select(col("id"), col("sh"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val a = entries.alias("a")
    val b = entries.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", exactJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
