package graft

import graft.queries.VectorQueries
import graft.vector.VectorFunctions
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b"))).head()
      .getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    assert(math.abs(df.select(VectorFunctions.cosine(col("a"), col("b")))
      .head().getDouble(0)) < 1e-12)
  }

  test("brute-force knn: k rows per query, descending sim, no self") {
    val res = VectorQueries.knnBrute(spark, sf).collect()
    val byQuery = res.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5)
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length == 10)
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == qid))
    }
  }

  test("IVF top-k recall@10 vs brute force is reasonable") {
    val brute = VectorQueries.knnBrute(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val ivf = VectorQueries.knnIvf(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      val hit = ivf.getOrElse(q, Set.empty).intersect(brute(q)).size
      hit.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.length
    // k-means coarse quantizer, 4 of 16 buckets probed → ~1/4 of the
    // corpus scanned; measured recall ≈ 0.52–0.64 across SFs
    assert(mean > 0.4, s"mean recall@10 = $mean")
  }

  test("PQ round-trip: codes in range, ADC orders identical vectors first") {
    import graft.vector.ProductQuantizer
    val rnd = new scala.util.Random(7)
    val sample = Array.tabulate(64)(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian())))
    val books = ProductQuantizer.fitCodebooks(sample, m = 4, kCodes = 8)
    assert(books.length == 4 && books.forall(_.length == 8))
    for ((_, v) <- sample) {
      val codes = ProductQuantizer.encode(books, v)
      assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 8))
      // ADC distance of a vector to its own codes is the quantization
      // error — must be <= distance via any other vector's codes
      val table = ProductQuantizer.distanceTable(books, v)
      def adc(cs: Array[Byte]) =
        cs.zipWithIndex.map { case (c, s) => table(s)(c & 0xff) }.sum
      val own = adc(codes)
      assert(sample.forall { case (_, o) =>
        own <= adc(ProductQuantizer.encode(books, o)) + 1e-12 })
    }
  }

  test("PQ ADC recall@10 vs exact squared-L2 passes the gate") {
    val rows = VectorQueries.pqRecallBound(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Boolean]("recall_ok")))
  }

  test("sign-LSH ivfTopK variant returns valid ranked neighbors") {
    val e = Tables.load(spark, sf, "embeddings")
    val res = VectorFunctions.ivfTopK(
      e.filter(col("vec_id") < 3), e,
      "vec_id", "embedding", "vec_id", "embedding", k = 5).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rows) =>
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == qid))
    }
  }

  test("LSH bucket top pairs carry the same sims as the exact ranking") {
    // every bucket-mate pair's sim must equal the brute-force cosine for
    // the same pair (the LSH path prunes candidates, never alters math)
    val exact = VectorQueries.embedTopPairsExact(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("sim")).toMap
    val lsh = VectorQueries.embedTopPairsLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("sim")).toMap
    assert(lsh.nonEmpty)
    val overlap = lsh.keySet.intersect(exact.keySet)
    overlap.foreach(k => assert(lsh(k) == exact(k),
      s"sim mismatch for $k: ${lsh(k)} vs ${exact(k)}"))
  }

  test("label centroids: 10 labels x 64 positions") {
    val c = VectorQueries.labelCentroids(spark, sf)
    assert(c.count() == 640)
  }

  test("cosine_similarity is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, sf, "embeddings").createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) AS s FROM emb_sql LIMIT 5")
      .collect()
    r.foreach(row => assert(math.abs(row.getDouble(0) - 1.0) < 1e-9))
  }

  test("Jacobi eigen: known spectrum, orthonormal vectors, determinism") {
    import graft.vector.Pca
    // [[2,1],[1,2]] → eigenvalues 3, 1; vectors (1,1)/√2 and (1,−1)/√2
    val m2 = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (v2, e2) = Pca.jacobiEigen(m2)
    assert(math.abs(v2(0) - 3.0) < 1e-12 && math.abs(v2(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(e2(0)(0) - s) < 1e-12 && math.abs(e2(0)(1) - s) < 1e-12)
    assert(Pca.orthonormalDefect(e2) < 1e-12)
    assert(Pca.eigenResidual(m2, v2, e2) < 1e-12)
    // a bigger symmetric matrix: residual + orthonormality + trace
    val n = 16
    val big = Array.tabulate(n, n)((i, j) =>
      1.0 / (1 + i + j) + (if (i == j) 2.0 else 0.0))
    val (vals, vecs) = Pca.jacobiEigen(big)
    assert(Pca.orthonormalDefect(vecs) < 1e-10)
    assert(Pca.eigenResidual(big, vals, vecs) < 1e-10)
    assert(vals.toSeq.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(math.abs(vals.sum - (0 until n).map(i => big(i)(i)).sum) < 1e-9)
    // bit-determinism: same input → identical decomposition
    val (vals2, vecs2) = Pca.jacobiEigen(big.map(_.clone()))
    assert(vals.sameElements(vals2))
    assert(vecs.zip(vecs2).forall { case (a, b) => a.sameElements(b) })
  }
}
