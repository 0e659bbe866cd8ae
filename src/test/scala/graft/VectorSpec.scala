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
}
