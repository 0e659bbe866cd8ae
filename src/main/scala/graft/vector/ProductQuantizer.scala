package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) with asymmetric distance
  * computation (ADC) — the standard memory-bound ANN scale path beyond
  * the int8 scalar scheme in q144: a 64-dim float vector (256 bytes)
  * compresses to `m` byte codes (8 bytes at m=8), a 32× reduction,
  * and distances are computed against the CODES via per-query lookup
  * tables without ever reconstructing the corpus vectors.
  *
  * Scale design (100 TB): codebooks train on a bounded driver-side
  * sample (m × kCodes × subDim doubles — KBs) exactly like
  * [[KMeansIvf]]; encoding is one broadcast + mapPartitions pass (no
  * shuffle — vectors stream, codes ride along); the ADC scan streams
  * the 8-byte codes against broadcast per-query distance tables, so
  * the working set per corpus vector is the code array, not the
  * vector. The only shuffle is the final per-query top-k. Everything
  * is seeded and iteration-capped — bit-deterministic across runs and
  * partitionings (sequential double accumulation per (query, vector)
  * in fixed subspace order).
  */
object ProductQuantizer {

  /** Per-subspace codebooks from an id-sorted sample: subspace `s` sees
    * the slice [s·subDim, (s+1)·subDim) of every sample vector and gets
    * its own deterministic k-means ([[KMeansIvf.fitCentroids]]).
    * Result: codebooks(s)(code) = centroid (subDim doubles). */
  def fitCodebooks(sample: Array[(Long, Array[Double])], m: Int,
                   kCodes: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    Array.tabulate(m) { s =>
      val sub = sample.map { case (id, v) =>
        (id, java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      }
      KMeansIvf.fitCentroids(sub, kCodes)
    }
  }

  /** Nearest-code encoding: one byte per subspace (ties → lowest code,
    * deterministic — [[KMeansIvf.nearest]]). */
  def encode(codebooks: Array[Array[Array[Double]]],
             v: Array[Double]): Array[Byte] = {
    val m = codebooks.length
    val subDim = v.length / m
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      codes(s) = KMeansIvf.nearest(codebooks(s),
        java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim)).toByte
      s += 1
    }
    codes
  }

  /** ADC lookup table for one query: table(s)(code) = squared L2
    * distance from the query's subvector `s` to that code's centroid.
    * Approximate squared distance to a corpus vector is then
    * Σ_s table(s)(codes(s)) — m array lookups + m adds per vector. */
  def distanceTable(codebooks: Array[Array[Array[Double]]],
                    q: Array[Double]): Array[Array[Double]] = {
    val m = codebooks.length
    val subDim = q.length / m
    Array.tabulate(m) { s =>
      codebooks(s).map { cent =>
        var d2 = 0.0; var d = 0
        while (d < subDim) {
          val x = q(s * subDim + d) - cent(d); d2 += x * x; d += 1
        }
        d2
      }
    }
  }

  /** IVF-PQ (FAISS's IVFPQ composition): a coarse k-means quantizer
    * partitions the corpus into inverted lists, PQ codebooks are
    * trained on RESIDUALS (v − centroid), and a query probes only its
    * `nProbe` nearest lists, ADC-scanning each list's codes with a
    * table built from the query's residual against THAT centroid.
    * Corpus work per query drops to ~nProbe/nCentroids of the codes —
    * the memory-bound ANN shape that scales past what one ADC sweep of
    * every code can do. Scale: centroids + codebooks broadcast (KBs);
    * encoding is one mapPartitions pass; the probe scan filters on the
    * bucket id riding with the codes. Deterministic throughout (seeded
    * k-means, fixed iteration caps, id tiebreaks). */
  def ivfPqTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                qId: String, qVec: String, cId: String, cVec: String,
                k: Int, nCentroids: Int = 16, nProbe: Int = 4, m: Int = 8,
                kCodes: Int = 256, maxTrainSample: Int = 4096): DataFrame = {
    import spark.implicits._
    val train = corpus
      .select(col(cId).cast("long"), col(cVec)).as[(Long, Array[Float])]
      .orderBy(col(cId)).limit(maxTrainSample).collect()
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val centroids = KMeansIvf.fitCentroids(train, nCentroids)
    def residual(v: Array[Double], c: Int): Array[Double] = {
      val cent = centroids(c)
      Array.tabulate(v.length)(i => v(i) - cent(i))
    }
    val residualSample = train.map { case (id, v) =>
      (id, residual(v, KMeansIvf.nearest(centroids, v)))
    }
    val codebooks = fitCodebooks(residualSample, m, kCodes)
    val bcCent = spark.sparkContext.broadcast(centroids)
    val bcBooks = spark.sparkContext.broadcast(codebooks)

    val coded = corpus
      .select(col(cId).cast("long"), col(cVec)).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cents = bcCent.value; val books = bcBooks.value
        it.map { case (id, v) =>
          val vd = v.map(_.toDouble)
          val b = KMeansIvf.nearest(cents, vd)
          val cent = cents(b)
          val res = Array.tabulate(vd.length)(i => vd(i) - cent(i))
          (id, b, encode(books, res))
        }
      }.toDF("neighbor_id", "bucket", "codes")

    // per query: the probed buckets, each with its own residual table
    val probes = queries
      .select(col(qId).cast("long"), col(qVec)).as[(Long, Array[Float])]
      .collect()
      .flatMap { case (id, v) =>
        val vd = v.map(_.toDouble)
        KMeansIvf.nearestN(centroids, vd, nProbe).map { b =>
          (id, b, distanceTable(codebooks, residual(vd, b)))
        }
      }
    val bcProbes = spark.sparkContext.broadcast(probes)

    val scored = coded.as[(Long, Int, Array[Byte])].mapPartitions { it =>
      val ps = bcProbes.value
      it.flatMap { case (nid, bucket, codes) =>
        ps.iterator.collect {
          case (qid, b, table) if b == bucket && qid != nid =>
            var d2 = 0.0; var s = 0
            while (s < codes.length) {
              d2 += table(s)(codes(s) & 0xff); s += 1
            }
            (qid, nid, d2)
        }
      }
    }.toDF("query_id", "neighbor_id", "approx_d2")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("approx_d2"))
  }

  /** Approximate squared-L2 top-k by ADC over PQ codes: encode the
    * corpus once, broadcast the per-query distance tables, stream the
    * codes. Ascending distance, ties by neighbor id. */
  def adcTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
              qId: String, qVec: String, cId: String, cVec: String,
              k: Int, m: Int = 8, kCodes: Int = 256,
              maxTrainSample: Int = 4096): DataFrame = {
    import spark.implicits._
    val train = corpus
      .select(col(cId).cast("long"), col(cVec)).as[(Long, Array[Float])]
      .orderBy(col(cId)).limit(maxTrainSample).collect()
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val codebooks = fitCodebooks(train, m, kCodes)
    val bcBooks = spark.sparkContext.broadcast(codebooks)

    val coded = corpus
      .select(col(cId).cast("long"), col(cVec)).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val books = bcBooks.value
        it.map { case (id, v) => (id, encode(books, v.map(_.toDouble))) }
      }.toDF("neighbor_id", "codes")

    // queries are the broadcast side: id → precomputed ADC table
    val tables = queries
      .select(col(qId).cast("long"), col(qVec)).as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) => (id, distanceTable(codebooks, v.map(_.toDouble))) }
    val bcTables = spark.sparkContext.broadcast(tables)

    val scored = coded.as[(Long, Array[Byte])].mapPartitions { it =>
      val ts = bcTables.value
      it.flatMap { case (nid, codes) =>
        ts.iterator.collect { case (qid, table) if qid != nid =>
          var d2 = 0.0; var s = 0
          while (s < codes.length) {
            d2 += table(s)(codes(s) & 0xff); s += 1
          }
          (qid, nid, d2)
        }
      }
    }.toDF("query_id", "neighbor_id", "approx_d2")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("approx_d2"))
  }
}
