package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over `array<float>` embedding columns ([EXT]
  * similarity-search surface). Dot products and norms are sequential
  * double-precision folds over the array (`aggregate`/`zip_with` —
  * codegen'd builtins), so results are deterministic and engine-portable.
  *
  * Scale design (100 TB): brute-force top-k is the correctness baseline —
  * a broadcast of the (small) query set against a full scan, no shuffle
  * of the corpus. The scale path is [[ivfTopK]]: vectors are bucketed by
  * a coarse quantizer (here: sign-bit LSH over fixed hyperplanes), the
  * query probes only matching buckets → the scan touches ~1/buckets of
  * the corpus; recall is tested against the brute-force baseline.
  */
object VectorFunctions {

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98): greedily build a k-subset of a candidate pool that
    * trades relevance against redundancy — score(c) = λ·rel(c) −
    * (1−λ)·max_{s∈selected} sim(c, s). The pool is BOUNDED (top-N from
    * an ANN/exact stage), so the greedy loop is driver-side over ≤ N
    * items per query — the distributed work is producing the pool, the
    * same split every RAG pipeline uses. Deterministic: sequential
    * double accumulation, ties broken by lower candidate id. */
  def mmrSelect(candidates: Seq[(Long, Double, Array[Double])], k: Int,
                lambda: Double): Seq[Long] = {
    val pool = scala.collection.mutable.LinkedHashMap(
      candidates.map(c => c._1 -> c): _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    while (selected.size < k && pool.nonEmpty) {
      var bestId = -1L; var bestScore = Double.NegativeInfinity
      for ((id, (_, rel, v)) <- pool) {
        val redundancy =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => cos(v, s._2)).max
        val score = lambda * rel - (1.0 - lambda) * redundancy
        if (score > bestScore || (score == bestScore && id < bestId)) {
          bestScore = score; bestId = id
        }
      }
      val picked = pool.remove(bestId).get
      selected += ((bestId, picked._3))
    }
    selected.map(_._1).toSeq
  }

  /** Σ aᵢ·bᵢ in double precision, sequential element order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native codegen expression
    * [[graft.functions.CosineSimilarity]] — bitwise-identical to the
    * `dot/(norm·norm)` HOF formulation (same sequential double folds) but
    * compiled into whole-stage codegen instead of interpreted lambdas. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Brute-force cosine top-k: for each query row, rank the corpus.
    * Query set must be small (it is broadcast as a literal cross join). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int): DataFrame = {
    val joined = queries.select(col(qId).as("query_id"), col(qVec).as("qv"))
      .crossJoin(corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64-seeded, values
    * in [-1,1]) for the sign-bit coarse quantizer. */
  private def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    import graft.functions.Hash64
    var state = Hash64.Golden
    def next(): Double = {
      state += Hash64.Golden
      val z = Hash64.mix64(state)
      (z >>> 11) * (1.0 / (1L << 53)) * 2.0 - 1.0
    }
    Array.fill(nPlanes, dim)(next())
  }

  /** Johnson-Lindenstrauss-style random projection: the embedding's
    * dot products against `outDim` deterministic hyperplanes (same
    * splitmix64 family as [[lshBucket]]) — the dimensionality-reduction
    * step that shrinks index footprint before bucketing/quantization.
    * Cosine is scale-invariant, so the 1/√outDim JL factor is omitted.
    * Returns array<double>. */
  def randomProjection(vec: Column, outDim: Int, dim: Int): Column = {
    val planes = hyperplanes(outDim, dim)
    array(planes.map(p => dot(vec, array(p.map(lit): _*))): _*)
  }

  /** Sign-bit LSH bucket id (0 .. 2^nPlanes-1) of an embedding. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val planes = hyperplanes(nPlanes, dim)
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF/LSH-bucketed approximate top-k: corpus pre-bucketed by
    * [[lshBucket]]; each query probes only its own bucket plus the
    * single-bit-flip neighbor buckets (multi-probe). Trades recall for a
    * corpus-scan factor of ~(nPlanes+1)/2^nPlanes. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val bucketed = corpus.select(col(cId).as("neighbor_id"), col(cVec).as("cv"),
      lshBucket(col(cVec), nPlanes, dim).as("bucket"))
    // query probes: own bucket + all 1-bit flips
    val probes = explode(array((0 to nPlanes).map { i =>
      if (i == 0) col("qbucket")
      else col("qbucket").bitwiseXOR(lit(1L << (i - 1)))
    }: _*))
    val q = queries.select(col(qId).as("query_id"), col(qVec).as("qv"),
        lshBucket(col(qVec), nPlanes, dim).as("qbucket"))
      .withColumn("bucket", probes)
    val joined = q.join(bucketed, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
  }

  /** Exact top-k most-similar pairs over the whole corpus via broadcast
    * nested loop with per-partition top-k pruning — the efficient form of
    * an all-pairs ranking when one copy of the (normalized) corpus fits
    * in executor memory. Each task scans its partition of the left side
    * against the broadcast right side in a tight JVM loop (800M flops/s
    * class), keeps a local k-heap, and only k rows per partition reach
    * the final ordering. The HOF-expression cross join computes the same
    * thing ~30× slower (higher-order functions are interpreted, not
    * codegen'd). For corpora beyond broadcast size, use the LSH-bucketed
    * [[nearDuplicateEmbeddings]] path instead. */
  def topPairsExactFast(corpus: DataFrame, idCol: String, vecCol: String,
                        k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val normed: Array[(Long, Array[Double])] = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
      .map { case (id, v) =>
        val d = v.map(_.toDouble)
        val n = math.sqrt(d.map(x => x * x).sum)
        (id, d.map(_ / n))
      }
    val bc = spark.sparkContext.broadcast(normed)
    val ids = corpus.select(col(idCol).cast("long")).as[Long]
    // heap ordered by the output total order (sim desc, id_a, id_b) so
    // ties at the cutoff resolve identically to the oracle's ORDER BY
    // regardless of partition arrival order
    implicit val better: Ordering[(Double, Long, Long)] =
      Ordering.fromLessThan[(Double, Long, Long)] { (p, q) =>
        if (p._1 != q._1) p._1 < q._1
        else if (p._2 != q._2) p._2 > q._2
        else p._3 > q._3
      }
    val candidates = ids.mapPartitions { it =>
      val all = bc.value
      val idArr = all.map(_._1)
      val byId = all.toMap
      val heap = scala.collection.mutable.PriorityQueue
        .empty[(Double, Long, Long)](better.reverse) // worst candidate on top
      for (lid <- it) {
        val lv = byId(lid)
        var j = java.util.Arrays.binarySearch(idArr, lid) + 1
        while (j < all.length) {
          val (rid, rv) = all(j)
          var s = 0.0
          var d = 0
          while (d < lv.length) { s += lv(d) * rv(d); d += 1 }
          val cand = (s, lid, rid)
          if (heap.size < k) heap.enqueue(cand)
          else if (better.gt(cand, heap.head)) {
            heap.dequeue(); heap.enqueue(cand)
          }
          j += 1
        }
      }
      heap.iterator
    }
    candidates.toDF("sim", "id_a", "id_b")
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(k)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** EXACT all-pairs threshold scan via broadcast + per-partition tight
    * loop (same execution shape as [[topPairsExactFast]], emitting every
    * pair with cosine ≥ threshold instead of a global top-k). The
    * expression-tree formulation (cross join + cosine column) computes
    * the identical values ~5× slower — the JVM loop over the broadcast
    * array stays out of row encoding entirely. Sim math mirrors the
    * engines' formula bit-for-bit: sequential double dot product divided
    * by the product of sequential double norms. For corpora beyond
    * broadcast size, cluster [[nearDuplicateEmbeddings]]'s LSH
    * candidates instead. */
  def thresholdPairsExact(corpus: DataFrame, idCol: String, vecCol: String,
                          threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs: Array[(Long, Array[Double], Double)] = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
      .map { case (id, v) =>
        val d = v.map(_.toDouble)
        var s = 0.0
        var i = 0
        while (i < d.length) { s += d(i) * d(i); i += 1 }
        (id, d, math.sqrt(s))
      }
    val bc = spark.sparkContext.broadcast(vecs)
    val ids = corpus.select(col(idCol).cast("long")).as[Long]
    ids.mapPartitions { it =>
      val all = bc.value
      val idArr = all.map(_._1)
      it.flatMap { lid =>
        val li = java.util.Arrays.binarySearch(idArr, lid)
        val (_, lv, ln) = all(li)
        Iterator.range(li + 1, all.length).flatMap { j =>
          val (rid, rv, rn) = all(j)
          var s = 0.0
          var d = 0
          while (d < lv.length) { s += lv(d) * rv(d); d += 1 }
          val sim = s / (ln * rn)
          if (sim >= threshold) Some((lid, rid, sim)) else None
        }
      }
    }.toDF("id_a", "id_b", "sim")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold. Brute force
    * within LSH buckets (the scale path); exact for bucket-mates. */
  def nearDuplicateEmbeddings(
      corpus: DataFrame, cId: String, cVec: String,
      threshold: Double, nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val b = corpus.select(col(cId).as("id"), col(cVec).as("v"),
      lshBucket(col(cVec), nPlanes, dim).as("bucket"))
    val l = b.alias("l"); val r = b.alias("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("sim", cosine(col("l.v"), col("r.v")))
      .filter(col("sim") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("sim"))
  }
}
