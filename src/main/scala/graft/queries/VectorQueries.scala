package graft.queries

import graft.Tables
import graft.vector.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Similarity-search queries over `embeddings` (64-dim float
  * vectors). Cosine math runs in sequential double precision on both
  * engines, so similarity values agree to ~1e-15 and 4-decimal rounding
  * is stable; neighbor *ranking* gaps in this corpus are ≥2e-4, far above
  * any float/double divergence.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** q126/q178/q183 all consume the SAME exact ≥ 0.42-cosine pair list
    * (ground truth for clustering and for the SemDeDup gates). Same
    * replay pattern as TextQueries' exactPairCache: the broadcast
    * threshold scan runs once per dataset per JVM and the tiny result
    * (441 pairs at sf0.1) replays as a local frame — bit-identical
    * pairs, one O(n²) pass instead of three. */
  private val embedPairCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType)]()

  private[queries] def exactEmbedPairs(s: SparkSession, dir: String): DataFrame = {
    val key = new java.io.File(dir).getCanonicalPath
    val (rows, schema) = embedPairCache.computeIfAbsent(key, _ => {
      val df = VectorFunctions.thresholdPairsExact(
          emb(s, dir), "vec_id", "embedding", 0.42)
        .select(col("id_a"), col("id_b"))
      (df.collect(), df.schema)
    })
    graft.util.LocalFrame.of(s, rows, schema)
  }

  /** Brute-force cosine top-10 for query vectors vec_id < 5 (the
    * correctness baseline; oracle in DuckDB on double-cast lists). */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    VectorFunctions.bruteForceTopK(
        e.filter(col("vec_id") < 5), e,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF (k-means coarse quantizer, multi-probe) approximate top-10 —
    * the scale path for corpora too big to scan per query (rows-only;
    * recall vs brute force is unit-tested). The sign-LSH variant remains
    * available as [[VectorFunctions.ivfTopK]]. */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.vector.KMeansIvf.topK(s,
        e.filter(col("vec_id") < 5), e,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q61 as an oracle-gated check (q82/q84's promotion pattern): the IVF
    * top-10 list itself isn't SQL-derivable (the coarse quantizer is
    * ours), but everything a BROKEN index would get wrong is — per query
    * the oracle states the SQL-knowable facts (query set, k) and pins
    * four deterministic booleans: exactly k distinct non-self neighbors
    * come back, every reported sim IS the true cosine of that pair
    * (recomputed from the raw vectors — garbage-sim indexes die here),
    * the list is rank-ordered by descending sim, and recall vs the exact
    * brute-force top-10 clears the q84 floor (6-probe: measured ≥ 0.5
    * at every SF, gated ≥ 0.4). The scoring join broadcasts the 50-row result — fit-small /
    * check-wide at any scale. */
  def knnIvfGate(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 5)
    val ivf = graft.vector.KMeansIvf.topK(s, q, e,
      "vec_id", "embedding", "vec_id", "embedding", k = 10, nProbe = 6)
    val rescored = broadcast(ivf)
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))), Seq("query_id"))
      .withColumn("true_sim", VectorFunctions.cosine(col("qe"), col("ce")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rank"))
    val brute = VectorFunctions.bruteForceTopK(q, e,
      "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val hits = broadcast(ivf.select(col("query_id"), col("neighbor_id")))
      .join(brute, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    rescored
      .withColumn("prev_sim", lag(col("sim"), 1).over(w))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_returned"),
        (count(lit(1)) === countDistinct(col("neighbor_id")) &&
          max(col("neighbor_id") === col("query_id")) === lit(false))
          .as("neighbors_ok"),
        min(abs(col("sim") - col("true_sim")) < 1e-9).as("sims_exact_ok"),
        min(coalesce(col("prev_sim") >= col("sim") - lit(1e-12), lit(true)))
          .as("rank_order_ok"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_returned"), col("neighbors_ok"),
        col("sims_exact_ok"), col("rank_order_ok"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / 10.0 >= 0.4)
          .as("recall_ok"))
      .orderBy(col("query_id"))
  }

  /** Top-20 most-similar embedding pairs, exact over all pairs (this
    * corpus has no planted near-dups — max pairwise cosine ≈ 0.5 — so the
    * near-dup surface is expressed as a top-K ranking, which is always
    * non-empty and exercises the same pipeline). */
  def embedTopPairsExact(s: SparkSession, dir: String): DataFrame =
    VectorFunctions.topPairsExactFast(emb(s, dir), "vec_id", "embedding", 20)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))

  /** LSH-bucketed top pairs — the 100 TB path: only bucket-mates are
    * compared (rows-only; sims cross-checked in VectorSpec). */
  def embedTopPairsLsh(s: SparkSession, dir: String): DataFrame =
    VectorFunctions.nearDuplicateEmbeddings(
        emb(s, dir), "vec_id", "embedding", threshold = -1.0)
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(20)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))

  /** q63 as an oracle-gated check: the sign-LSH bucketing is ours, so
    * the bucketed top-20 pair list itself isn't SQL-derivable — but its
    * quality against the exact all-pairs top-20 (which DuckDB CAN
    * compute, q62's oracle) is. One row pins: exactly 20 well-formed
    * pairs (id_a < id_b, distinct), every reported sim equal to the true
    * cosine of its pair, descending sim order, a nonzero intersection
    * with the exact top-20, and the LSH list's min/max sims within the
    * measured fraction of the exact list's (min ratio ≥ 0.84 / ≥ 0.90
    * across SFs on a corpus with NO planted near-dups — the hardest
    * regime for 4-plane sign-LSH, whose buckets hold ~1/16 of all
    * pairs; gated at 0.75/0.80). Everything deterministic → stable
    * booleans (q84's pattern). */
  def lshTopPairsGate(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val lsh = VectorFunctions.nearDuplicateEmbeddings(
        e, "vec_id", "embedding", threshold = -1.0)
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(20)
    val exact = VectorFunctions.topPairsExactFast(e, "vec_id", "embedding", 20)
    val lshRe = broadcast(lsh)
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("va")),
        Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")),
        Seq("id_b"))
      .withColumn("true_sim", VectorFunctions.cosine(col("va"), col("vb")))
      .select(col("id_a"), col("id_b"), col("sim"), col("true_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
    val shaped = lshRe
      .withColumn("prev_sim", lag(col("sim"), 1).over(w))
      .agg(
        count(lit(1)).as("n_pairs"),
        (min(col("id_a") < col("id_b")) &&
          count(lit(1)) === countDistinct(col("id_a"), col("id_b")))
          .as("pairs_wellformed_ok"),
        min(abs(col("sim") - col("true_sim")) < 1e-9).as("sims_exact_ok"),
        min(coalesce(col("prev_sim") >= col("sim") - lit(1e-12), lit(true)))
          .as("order_ok"),
        min(col("sim")).as("lsh_min"), max(col("sim")).as("lsh_max"))
    val nOverlap = lsh.select(col("id_a"), col("id_b"))
      .join(exact.select(col("id_a"), col("id_b")),
        Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_overlap"))
    val exStats = exact.agg(min(col("sim")).as("ex_min"),
      max(col("sim")).as("ex_max"))
    shaped.crossJoin(nOverlap).crossJoin(exStats)
      .select(col("n_pairs"), col("pairs_wellformed_ok"),
        col("sims_exact_ok"), col("order_ok"),
        (col("n_overlap") >= 1).as("overlap_ok"),
        (col("lsh_min") >= col("ex_min") * 0.75 &&
          col("lsh_max") >= col("ex_max") * 0.80).as("sim_quality_ok"))
  }

  /** Per-label centroids via posexplode (oracle: UNNEST WITH ORDINALITY).
    * Double sums of ~50 floats: cross-engine divergence ~1e-16 against a
    * 5e-7 rounding grid — safe. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(round(avg(col("v").cast("double")), 6).as("avg_v"),
        count(lit(1)).as("n"))
      .orderBy(col("label"), col("pos"))

  /** q217: embedding-space outlier filter — the vector-quality gate a
    * curation run applies before similarity search or semantic dedup: a
    * vector far from its label's centroid is mislabeled, corrupt, or
    * out-of-domain, and feeding it to ANN/SemDeDup poisons the buckets.
    * Distance = squared L2 to the 6-dp-rounded per-label centroid
    * (q64's rounding rule pins the centroid cross-engine); each squared
    * term quantizes through DECIMAL(25,12) so the per-vector sum is
    * order-insensitive; the per-label flag threshold is the exact
    * interpolated p95 of those distances (q29's percentile rule).
    *
    * Scale: the centroid frame is labels × dims — broadcast; the
    * per-vector distance pass is then map-side; the per-label exact
    * percentile is the only wide agg (KLL — q97 — is the sketch
    * substitute at 100 TB, same API shape). */
  def embedOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), col("pos"),
        col("v").cast("double").as("v"))
    val cents = e.groupBy(col("label"), col("pos"))
      .agg(round(avg(col("v")), 6).as("c"))
    val d2 = e.join(broadcast(cents), Seq("label", "pos"))
      .select(col("vec_id"), col("label"),
        expr("CAST((v - c) * (v - c) AS DECIMAL(25,12))").as("t"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("t")).cast("double").as("d2"))
    val thr = d2.groupBy(col("label"))
      .agg(expr("percentile(d2, 0.95)").as("p95"))
    d2.join(broadcast(thr), Seq("label"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("d2") > col("p95"), 1L).otherwise(0L))
          .as("n_outliers"),
        round(max(col("p95")), 6).as("p95_d2"))
      .orderBy(col("label"))
  }

  /** ANN quality gate (q47/q79 pattern): IVF top-10 recall against the
    * exact brute-force top-10 per query, asserted ≥ 0.4 (the measured
    * floor for this corpus is 0.52). Both sides are deterministic, so
    * the boolean is stable and the oracle states the exact-side facts
    * plus `true`. */
  def ivfRecallBound(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 5)
    val ivf = graft.vector.KMeansIvf.topK(s, q, e,
      "vec_id", "embedding", "vec_id", "embedding", k = 10, nProbe = 6)
      .select(col("query_id"), col("neighbor_id"))
    val brute = VectorFunctions.bruteForceTopK(q, e,
      "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val hits = ivf.join(brute, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_exact"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_exact") >= 0.4).as("recall_ok"))
      .orderBy(col("query_id"))
  }

  /** q144: int8 scalar quantization of the embedding column — the 4×
    * memory/IO compression an ANN index applies before indexing at
    * scale. Symmetric per-vector scheme: scale = 127/max|v|,
    * q = round(v·scale) ∈ [−127,127], dequant = q/scale. Gates (exact
    * arithmetic, deterministic): quantized codes stay in the int8
    * range, every element's reconstruction error is within the
    * half-step rounding bound max|v|/254, and the top-10 cosine ranking
    * computed ON the dequantized vectors recovers ≥ 0.8 of the exact
    * top-10 per query. Pure HOF arithmetic plus the q60 ranking
    * pipeline — per-row work, no new shuffle shape. */
  def quantizationGate(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val vd = transform(col("embedding"), x => x.cast("double"))
    val mabs = array_max(transform(vd, x => abs(x)))
    val scale = when(mabs > 0, lit(127.0) / mabs).otherwise(lit(1.0))
    val qv = transform(vd, x => round(x * scale).cast("int"))
    val deq = transform(qv, q => q.cast("double") / scale)
    val quant = e.select(col("vec_id"), deq.as("deq"),
      (array_max(zip_with(vd, deq, (a, b) => abs(a - b))) <=
        mabs / lit(254.0) + lit(1e-12)).as("err_ok"),
      (array_min(qv) >= -127 && array_max(qv) <= 127).as("range_ok"))
    val global = quant.agg(
      min(col("err_ok")).as("err_bound_ok"),
      min(col("range_ok")).as("int8_range_ok"))
    val exact = VectorFunctions.bruteForceTopK(
        e.filter(col("vec_id") < 5), e,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val approx = VectorFunctions.bruteForceTopK(
        quant.filter(col("vec_id") < 5), quant,
        "vec_id", "deq", "vec_id", "deq", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left_outer")
      .crossJoin(global)
      .select(col("query_id"), col("n_exact"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_exact") >= 0.8).as("recall_ok"),
        col("err_bound_ok"), col("int8_range_ok"))
      .orderBy(col("query_id"))
  }

  /** q158: product-quantization ANN gate ([[graft.vector.ProductQuantizer]]
    * — PQ-8×256 codes + ADC scan, the memory-bound scale path: 8 bytes
    * per corpus vector instead of 256) in the standard production
    * pipeline shape: ADC prunes the corpus to 10k candidates per query
    * (the usual 10× re-rank factor), then exact squared-L2 re-ranks
    * ONLY those candidates (the original vectors are read for 100 rows
    * per query, not the corpus). Recall@10 of the re-ranked result
    * against the exact top-10, asserted ≥ 0.6 per query (measured floor
    * 0.7 at every SF; random isotropic data is PQ's worst case, planted
    * structure only helps). Both sides deterministic (seeded k-means,
    * sequential double sums, id tiebreaks), so the boolean is stable
    * and the oracle states the exact-side facts plus `true`. */
  def pqRecallBound(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 5)
    val candidates = graft.vector.ProductQuantizer.adcTopK(s, q, e,
      "vec_id", "embedding", "vec_id", "embedding", k = 100)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank of the candidate set: vectors join back by id (a
    // 500-row probe side at k=100 × 5 queries — broadcast), top-10 kept
    val rerankD2 = expr(
      """aggregate(zip_with(qe, ce,
        |  (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |          * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
        |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rd2").asc, col("neighbor_id"))
    val pq = broadcast(candidates)
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))), Seq("query_id"))
      .withColumn("rd2", rerankD2)
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"))
    // exact squared-L2 top-10: HOF arithmetic in the projection
    // (sequential fold — deterministic), window top-k
    val sqd2 = expr(
      """aggregate(zip_with(qe, ce,
        |  (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |          * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
        |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("neighbor_id"))
    val exact = broadcast(
        q.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
      .crossJoin(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", sqd2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"))
    val hits = pq.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_exact"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_exact") >= 0.6).as("recall_ok"))
      .orderBy(col("query_id"))
  }

  /** q171: IVF-PQ gate ([[graft.vector.ProductQuantizer.ivfPqTopK]] —
    * FAISS's IVFPQ: coarse k-means lists + PQ residual codes + per-list
    * ADC): probe 6/16 lists, take 100 candidates, exact re-rank to 10.
    * Same gate shape as q84/q158; the threshold reflects that list
    * probing bounds recall (a true neighbor in an unprobed list is
    * unreachable) — measured floor 0.5 at sf0.001/0.1, gated ≥ 0.3 per
    * query. The per-query scan fraction is what the operator buys:
    * ~nProbe/nCentroids of the codes instead of all of them. */
  def ivfPqRecallBound(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 5)
    val candidates = graft.vector.ProductQuantizer.ivfPqTopK(s, q, e,
      "vec_id", "embedding", "vec_id", "embedding", k = 100, nProbe = 6)
      .select(col("query_id"), col("neighbor_id"))
    val rerankD2 = expr(
      """aggregate(zip_with(qe, ce,
        |  (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |          * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
        |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rd2").asc, col("neighbor_id"))
    val pq = broadcast(candidates)
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))), Seq("query_id"))
      .withColumn("rd2", rerankD2)
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("neighbor_id"))
    val exact = broadcast(
        q.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
      .crossJoin(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", rerankD2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"))
    val hits = pq.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_exact"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_exact") >= 0.3).as("recall_ok"))
      .orderBy(col("query_id"))
  }

  /** q177: MMR diversity re-ranking gate
    * ([[VectorFunctions.mmrSelect]], λ=0.7): the distributed stage
    * produces each query's top-20 cosine pool (q60's pipeline), the
    * bounded greedy picks 10, and the gates pin what MMR guarantees —
    * the selection is 10 distinct pool members led by the most-relevant
    * candidate, and its mean pairwise similarity does not exceed the
    * plain top-10's (strict diversity gain whenever any swap happened).
    * All arithmetic deterministic → the booleans are stable and the
    * oracle states them as constants (q84's pattern). */
  def mmrDiversityGate(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 5)
    val pool = VectorFunctions.bruteForceTopK(q, e,
      "vec_id", "embedding", "vec_id", "embedding", k = 20)
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("nv"))
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"),
        r.getAs[scala.collection.Seq[Float]]("nv").map(_.toDouble).toArray))
        .sortBy(c => (-c._2, c._1)).toSeq).toMap
    def meanPairSim(ids: Seq[Long], all: Map[Long, Array[Double]]): Double = {
      val vs = ids.sorted.map(all)
      val pairs = for {
        i <- vs.indices; j <- (i + 1) until vs.size
      } yield {
        val (a, b) = (vs(i), vs(j))
        var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
        while (d < a.length) {
          dot += a(d) * b(d); na += a(d) * a(d); nb += b(d) * b(d); d += 1
        }
        dot / math.sqrt(na * nb)
      }
      pairs.sum / pairs.size
    }
    import s.implicits._
    pool.keys.toSeq.sorted.map { qid =>
      val cands = pool(qid)
      val byId = cands.map(c => c._1 -> c._3).toMap
      val mmr = VectorFunctions.mmrSelect(cands, k = 10, lambda = 0.7)
      val plain = cands.take(10).map(_._1)
      (qid, mmr.size.toLong,
        mmr.distinct.size == 10 && mmr.forall(byId.contains) &&
          mmr.head == plain.head,
        meanPairSim(mmr, byId) <= meanPairSim(plain, byId) + 1e-12)
    }.toDF("query_id", "n_selected", "selection_ok", "diversity_ok")
      .orderBy(col("query_id"))
  }

  /** q178: embedding-cosine near-dup DEDUP end to end — the embedding
    * modality's analog of q109's text pipeline: exact ≥0.42 cosine
    * pairs (all-pairs here; the LSH-bucketed path is q63's territory),
    * connected components by min-label propagation
    * ([[graft.dedup.Components.connectedComponents]]), and the
    * keep-first rule — a vector survives iff it IS its component's
    * label (unclustered vectors are their own). DuckDB rebuilds the
    * identical clustering with a recursive CTE; both engines compute
    * cosine as sequential double dot products, so the threshold set
    * matches exactly. */
  def embedDedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val pairs = exactEmbedPairs(s, dir)
    val comp = graft.dedup.Components
      .connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("vec_id"), col("lbl").as("component"))
    e.select(col("vec_id"))
      .join(comp, Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("component"),
        (coalesce(col("component"), col("vec_id")) === col("vec_id"))
          .as("survivor"))
      .orderBy(col("vec_id"))
  }

  /** q183: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * dedup that SCALES where q178's exact form can't: k-means the
    * embedding space (deterministic [[graft.vector.KMeansIvf]] fit on a
    * bounded id-ordered sample), then run the ≥0.42-cosine pair search
    * only WITHIN clusters — O(Σ nᵢ²) instead of O(n²), two orders less
    * work at 100 TB with k sized so clusters fit a partition. Dropped
    * docs are within-cluster component members minus their min-label
    * survivor. The oracle pins the SQL-knowable ground truth (exact dup
    * member/ideal-drop counts via the recursive-CTE rebuild) plus three
    * gates: every drop is a true ≥τ duplicate (subset of the exact
    * member set — holds by construction since a within-cluster pair IS
    * an exact pair), every component's survivor is kept, and recall vs
    * ideal drops clears 0.5 (measured: 0.89/0.85/0.81 at
    * sf0.001/0.01/0.1 — k-means is deterministic, so per-SF the value
    * is fixed). Hard single-cluster assignment lost too many boundary-
    * straddling pairs (0.44 recall at sf0.001); each vector therefore
    * joins its TWO nearest clusters (soft assignment, the standard
    * IVF/SemDeDup multi-probe trick) — ≤4× the within-cluster pair
    * work, still orders below n², and the only remaining loss is pairs
    * sharing no cluster at all. */
  def semanticDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val sample = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].orderBy(col("vec_id")).limit(2048)
      .collect().map { case (id, v) => (id, v.map(_.toDouble)) }
    val cents = graft.vector.KMeansIvf.fitCentroids(sample, 8)
    val bc = s.sparkContext.broadcast(cents)
    val clustered = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val c = bc.value
        it.flatMap { case (id, v) =>
          graft.vector.KMeansIvf.nearestN(c, v.map(_.toDouble), 2)
            .map(cl => (id, v, cl))
        }
      }.toDF("vec_id", "v", "cluster")
    val pairs = clustered
      .select(col("cluster"), col("vec_id").as("id_a"), col("v").as("va"))
      .join(clustered.select(col("cluster"), col("vec_id").as("id_b"),
        col("v").as("vb")), Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.cosine(col("va"), col("vb")) >= 0.42)
      .select(col("id_a"), col("id_b")).distinct()
    val comp = graft.dedup.Components
      .connectedComponents(pairs, "id_a", "id_b")
    val dropped = comp.filter(col("id") =!= col("lbl")).select(col("id"))
    // exact ground truth for the gates only (the operator above never
    // leaves its clusters; this is the q84-style bounded baseline,
    // replayed from the shared per-dataset cache)
    val exactPairs = exactEmbedPairs(s, dir)
    val exactMembers = exactPairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val nMembers = exactMembers.count()
    val nComponents = graft.dedup.Components
      .connectedComponents(exactPairs, "id_a", "id_b")
      .select(col("lbl")).distinct().count()
    val nIdeal = nMembers - nComponents
    val nDropped = dropped.count()
    val subsetOk = dropped
      .join(exactMembers, Seq("id"), "left_anti").isEmpty
    val survivorsKept = comp.select(col("lbl").as("id")).distinct()
      .join(dropped, Seq("id"), "left_semi").isEmpty
    val recallOk = nIdeal == 0 || nDropped.toDouble / nIdeal >= 0.5
    Seq((nMembers, nIdeal, subsetOk, survivorsKept, recallOk))
      .toDF("n_exact_members", "n_ideal_drops", "dropped_subset",
        "survivors_kept", "recall_ok")
  }

  /** q248: distributed PCA fit over the embedding corpus — the
    * whitening/dimensionality-reduction step a vector pipeline runs
    * before ANN indexing or SemDeDup (decorrelated dims make IVF/PQ
    * subspaces honest). Fit-small/score-wide split: the SCATTER matrix
    * Σ(v−μ)(v−μ)ᵀ is computed DISTRIBUTED and EXACTLY — per-dim means
    * pinned by the q217 6-dp rounding rule, every cross product
    * quantized through DECIMAL(25,12) so the 64×64 sums are
    * order-insensitive and bit-identical under any partitioning — then
    * collected (d² values, KBs) and eigendecomposed on the driver with
    * fixed-sweep cyclic Jacobi ([[graft.vector.Pca]], deterministic,
    * sign-normalized). The scatter pass is JOIN-FREE: per vector the
    * centered array is one zip_with against the broadcast mean literal,
    * the (i, j ≥ i) upper-triangle products explode map-side, and the
    * partial aggregate absorbs the d²/2-per-vector fan-out — nothing
    * data-sized ever shuffles (the exchange moves ≤ d²/2 partial rows
    * per partition). A vec_id self-join formulation was measured at
    * 6.5 s vs this shape's ~1 s at sf0.1 and rejected. At 100 TB the
    * same plan holds — one data pass, driver state d².
    *
    * Oracle (q84's promotion pattern): the SQL-knowable facts exactly —
    * corpus size, dim, and the DECIMAL-exact scatter TRACE (DuckDB
    * replays the same quantized arithmetic) — plus the deterministic
    * eigen gates pinned to constants: orthonormality defect < 1e-9,
    * eigen residual ‖Sv−λv‖/λmax < 1e-8, descending eigenvalues, eig
    * sum ≡ trace (1e-6 relative), and top-8 variance fraction above the
    * uniform 8/64 floor (ordered eigenvalues make it strict). */
  /** Shared distributed scatter-matrix fit (see [[embedPca]] for the
    * full design notes): returns (6-dp-pinned per-dim means, dense
    * scatter matrix, DECIMAL-exact trace). q248 eigendecomposes it;
    * q250 projects through its eigenvectors. */
  private[queries] def fitScatter(s: SparkSession, dir: String)
      : (Array[Double], Array[Array[Double]], java.math.BigDecimal) = {
    import s.implicits._
    val dim = 64
    val ex = emb(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"), col("v").cast("double").as("v"))
    // 6-dp-pinned per-dim means (q217's rule), broadcast as a literal
    // array — the fit's only pre-pass
    val mArr = ex.groupBy(col("i")).agg(round(avg(col("v")), 6).as("m"))
      .orderBy(col("i")).collect().map(_.getDouble(1))
    // join-free triangular fan-out: per vector, the centered array is
    // one zip_with; (i, j ≥ i) product pairs explode map-side and the
    // partial aggregate absorbs them — NOTHING data-sized shuffles
    // (the exchange carries ≤ d²/2 partial rows per partition)
    // spread the fan-out: the corpus parquet is a handful of input
    // splits, but each row explodes into d²/2 product terms — without
    // this tiny-row shuffle the whole quadratic stage runs in one task.
    // The partition count is EXPLICIT: pre-explode rows are KBs, so
    // AQE's size-based coalescing folds an unsized repartition straight
    // back to one partition (measured: 4.2 s unsized vs 1.3 s explicit
    // at sf0.1 — the generate fan-out is invisible to the size
    // estimator). At real scale input splits are plentiful and this is
    // a no-op-sized exchange.
    val scatterRows = emb(s, dir)
      .repartition(32, col("vec_id"))
      .select(expr(
        "zip_with(embedding, " +
          mArr.mkString("array(", ",", ")") +
          ", (a, b) -> CAST(a AS DOUBLE) - b)").as("cv"))
      .select(posexplode(col("cv")).as(Seq("i", "ci")), col("cv"))
      .select(col("i"), col("ci"),
        posexplode(expr(s"slice(cv, i + 1, $dim - i)")).as(Seq("o", "cj")))
      .select(col("i"), (col("i") + col("o")).as("j"),
        expr("CAST(ci * cj AS DECIMAL(25,12))").as("t"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("t")).as("sij"))
      .collect()
    val mS = Array.ofDim[Double](dim, dim)
    var trace = java.math.BigDecimal.ZERO
    scatterRows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val sij = r.getDecimal(2)
      mS(i)(j) = sij.doubleValue()
      mS(j)(i) = sij.doubleValue()
      if (i == j) trace = trace.add(sij)
    }
    (mArr, mS, trace)
  }

  def embedPca(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, mS, trace) = fitScatter(s, dir)
    val (vals, vecs) = graft.vector.Pca.jacobiEigen(mS)
    val trace6 = trace
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val orthoOk = graft.vector.Pca.orthonormalDefect(vecs) < 1e-9
    val residOk = graft.vector.Pca.eigenResidual(mS, vals, vecs) < 1e-8
    val descOk = vals.toSeq.sliding(2).forall(p => p(0) >= p(1) - 1e-9)
    val traceOk = math.abs(vals.sum - trace.doubleValue()) <=
      1e-6 * math.max(1.0, trace.doubleValue())
    val top8Ok = vals.take(8).sum / vals.sum > 8.0 / 64.0
    val n = emb(s, dir).count()
    Seq((n, 64L, trace6, orthoOk, residOk, descOk, traceOk, top8Ok))
      .toDF("n_vecs", "dim", "trace_6dp", "orthonormal_ok",
        "eig_residual_ok", "eig_descending_ok", "trace_matches_ok",
        "top8_var_ok")
  }

  /** q250: dimensionality-REDUCED projection — the score-wide half of
    * the PCA story (q248 is the fit): every vector projects onto the
    * top-16 eigenvectors in one broadcast + mapPartitions pass (4×
    * smaller working set for everything downstream — ANN indexes,
    * SemDeDup buckets, pairwise scans run on 16 doubles instead of 64).
    * Correctness gates are PCA's own IDENTITIES, checked distributed
    * and deterministically (per-row ‖p‖² quantized through
    * DECIMAL(25,12) before summation): the projected variance must
    * equal the sum of the kept eigenvalues (Σ‖Vₖ(x−μ)‖² ≡ Σλ₁..ₖ for an
    * orthonormal eigenbasis — a wrong basis, a transposed matrix, or a
    * broken projection all break it), the BOTTOM-16 basis must retain
    * strictly less variance than the top-16 (catches reversed
    * ordering), and the retained-variance fraction must beat the
    * uniform 16/64 floor (strict for any non-flat spectrum). A
    * neighbor-recall gate was measured and rejected: this corpus is
    * near-isotropic (max pairwise cosine ≈ 0.5), so 16-dim truncation
    * legitimately scrambles top-10 neighbors — the identity gates are
    * what a correct implementation must guarantee on ANY data. */
  def pcaProjectRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 16
    val (means, mS, trace) = fitScatter(s, dir)
    val (vals, vecs) = graft.vector.Pca.jacobiEigen(mS)
    val varKeptOk = vals.take(k).sum / vals.sum > k.toDouble / 64.0
    val bc = s.sparkContext.broadcast((means, vecs.take(k), vecs.takeRight(k)))
    // one pass: per row, squared norms of the top-16 and bottom-16
    // projections, DECIMAL-quantized so the sums are partitioning-proof
    val sums = emb(s, dir)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (m, vt, vb) = bc.value
        def norm2(v: Array[Array[Double]], c: Array[Double]): Double = {
          var n2 = 0.0; var j = 0
          while (j < v.length) {
            var dot = 0.0; var i = 0
            while (i < c.length) { dot += v(j)(i) * c(i); i += 1 }
            n2 += dot * dot; j += 1
          }
          n2
        }
        it.map { case (_, x) =>
          val c = Array.tabulate(m.length)(i => x(i).toDouble - m(i))
          (norm2(vt, c), norm2(vb, c))
        }
      }.toDF("pt", "pb")
      .agg(
        sum(expr("CAST(pt AS DECIMAL(25,12))")).as("spt"),
        sum(expr("CAST(pb AS DECIMAL(25,12))")).as("spb"),
        count(lit(1)).as("n"))
      .head()
    val sTop = sums.getDecimal(0).doubleValue()
    val sBottom = sums.getDecimal(1).doubleValue()
    val n = sums.getLong(2)
    val tol = 1e-6 * math.max(1.0, trace.doubleValue())
    val identityOk = math.abs(sTop - vals.take(k).sum) <= tol
    val bottomLtTopOk = sBottom < sTop &&
      math.abs(sBottom - vals.takeRight(k).sum) <= tol
    Seq((n, 64L, k.toLong, varKeptOk, identityOk, bottomLtTopOk))
      .toDF("n_vecs", "dim", "k", "var_kept_ok",
        "proj_var_identity_ok", "bottom_lt_top_ok")
  }

  /** q276: CORESET selection by greedy k-center (Gonzalez 1985 — the
    * farthest-point diversity sampler, the geometric core of coreset
    * and active-learning selection for training data): seed with
    * vec_id 0, then 9 rounds of "pick the vector farthest from the
    * chosen set" (max-min squared L2). Every distance term is
    * quantized to DECIMAL(25,12) (q217/q270's rule) so the per-vector
    * min and the global argmax are exact cross-engine; ties break by
    * vec_id. The oracle replays all nine rounds unrolled.
    *
    * Scale shape: each round is one pass — the chosen set (≤ k rows)
    * broadcasts, a per-vector min folds over it map-side, and ONE
    * argmax row reaches the driver (the PageRank bounded-driver-state
    * discipline); k rounds = k linear passes, never a pairwise join.
    * Output: selection order, chosen id, and its distance-to-set at
    * selection time (×10⁶ scaled BIGINT). */
  def coresetKCenter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 10
    val e = emb(s, dir).select(col("vec_id"), col("embedding")).persist()
    e.count()
    val d2Term =
      """CAST((CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |     * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |  AS DECIMAL(25,12))""".stripMargin
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    chosen += ((0L, 0L)) // seed: vec_id 0, distance-to-set 0
    for (_ <- 2 to k) {
      val centers = e.filter(col("vec_id")
          .isin(chosen.map(_._1).toSeq: _*))
        .select(col("vec_id").as("c_id"), col("embedding").as("ce"))
      val next = e.crossJoin(broadcast(centers))
        .select(col("vec_id"),
          expr(s"""aggregate(zip_with(embedding, ce,
            |  (a, b) -> $d2Term),
            |  CAST(0 AS DECIMAL(30,12)),
            |  (acc, x) -> CAST(acc + x AS DECIMAL(30,12)))""".stripMargin)
            .as("d2"))
        .groupBy(col("vec_id")).agg(min(col("d2")).as("dmin"))
        // floor, not a bare cast: Spark truncates decimal→BIGINT where
        // DuckDB rounds (the q265 lesson) — floor is unambiguous, and
        // the argmax + tiebreak runs on this same floored value in
        // BOTH engines so the selection replays exactly
        .select(col("vec_id"),
          expr("CAST(floor(dmin * 1000000) AS BIGINT)").as("dmicro"))
        .orderBy(col("dmicro").desc, col("vec_id")).limit(1)
        .as[(Long, Long)].head()
      chosen += next
    }
    e.unpersist()
    graft.util.LocalFrame.materialize(
      chosen.toSeq.zipWithIndex
        .map { case ((id, d), i) => (i + 1L, id, d) }
        .toDF("sel_rank", "vec_id", "dist_to_set_micro")
        .orderBy(col("sel_rank")))
  }

  /** q287: DISTRIBUTED Lloyd k-means (Lloyd 1957/1982), k = 4, two full
    * assign→update iterations over every vector — the clustering
    * workhorse under IVF training (vector/KMeansIvf.scala trains on a
    * CAPPED sample; this is the uncapped full-corpus variant a
    * training-data pipeline runs when the partition itself is the
    * product), reported as per-cluster size, mean within-cluster d²,
    * and the first two centroid coordinates.
    *
    * Exactness: coordinates quantize ONCE to ×10⁶ micro BIGINTs
    * (floor — both engines' floor on the same IEEE double), after
    * which every step is INTEGER: d² sums (≤ 64·(4·10⁶)² ≈ 10¹⁵,
    * BIGINT-safe per vector), argmin with min-cid tie as
    * min(struct(d2, cid)), centroid means by sign-split truncating
    * division (|Σ| div n with the sign reapplied — the q265/q278
    * truncate-vs-floor rule, since coordinate sums go negative), and
    * accumulator sums ride DECIMAL(38,0)/HUGEINT. The oracle replays
    * both unrolled iterations bit-for-bit.
    *
    * Scale shape: each iteration is (a) one broadcast of k·d centroid
    * integers + a map-side zip_with fold + ONE hash aggregate for the
    * argmin — no explode on the assignment path — and (b) one
    * posexplode'd (cid, dim) aggregate whose k·d = 256-row result is
    * the ONLY thing the driver holds (the PageRank bounded-state
    * discipline). Assignments persist one round deep. */
  def kmeansLloyd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val k = 4
    val vq = emb(s, dir).select(col("vec_id"),
        expr("transform(embedding, v -> " +
          "CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))").as("vq"))
      .persist()
    var cents: Seq[(Long, Seq[Long])] = vq.filter(col("vec_id") < k)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
      .sortBy(_._1).toSeq
    var assign: DataFrame = null
    for (_ <- 1 to 2) {
      val cdf = broadcast(cents.toDF("cid", "cq"))
      val next = vq.crossJoin(cdf).select(col("vec_id"), col("cid"),
          expr("aggregate(zip_with(vq, cq, (a, b) -> (a - b) * (a - b)), " +
            "0L, (acc, x) -> acc + x)").as("d2"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))
        .persist()
      next.count()
      if (assign != null) assign.unpersist()
      assign = next
      cents = assign.join(vq, "vec_id")
        .select(col("cid"), posexplode(col("vq")).as(Seq("i", "v")))
        .groupBy(col("cid"), col("i"))
        .agg(sum(col("v").cast(DecimalType(38, 0))).as("sv"),
          count(lit(1)).as("n"))
        .select(col("cid"), col("i"),
          expr("CAST(CASE WHEN sv >= 0 THEN sv div n " +
            "ELSE -((-sv) div n) END AS BIGINT)").as("cv"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq) }
        .toSeq.sortBy(_._1)
    }
    val cdims = cents.map { case (cid, cq) => (cid, cq(0), cq(1)) }
      .toDF("cid", "c_dim0", "c_dim1")
    val out = graft.util.LocalFrame.materialize(
      assign.groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("d2").cast(DecimalType(38, 0))).as("sd2"))
        .join(broadcast(cdims), Seq("cid"))
        .select(col("cid").as("cluster"), col("n_members"),
          expr("CAST(sd2 div n_members AS BIGINT)").as("mean_d2"),
          col("c_dim0"), col("c_dim1"))
        .orderBy(col("cluster")))
    assign.unpersist(); vq.unpersist()
    out
  }

  /** q292: per-cluster PROTOTYPE and EDGE-CASE selection — for each
    * ground-truth label, the member nearest its centroid (the
    * "prototype" a human reviews, the representative a UI shows, the
    * exemplar few-shot prompts sample) and the member farthest from it
    * (the outlier an audit queue surfaces first). The O(n) companion
    * of the O(n²) true-medoid: at selection time each member needs ONE
    * distance — to its own centroid — not n.
    *
    * Same integer discipline as q287: ×10⁶ micro quantization once,
    * DECIMAL(38,0) coordinate sums, sign-split truncating centroid
    * division, pure-BIGINT zip_with d², argmin/argmax as
    * min(struct(d2, id)) / max(struct(d2, −id)) (ties toward the
    * smaller id in BOTH directions). Scale shape: one posexplode'd
    * (label, dim) aggregate whose k·d-row result is all the driver
    * holds, then one broadcast join + one hash aggregate — no join of
    * data against data, no window. */
  def labelPrototypes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val vq = emb(s, dir).select(col("vec_id"),
        col("label").cast("long").as("lbl"),
        expr("transform(embedding, v -> " +
          "CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))").as("vq"))
      .persist()
    val cents = vq.select(col("lbl"), posexplode(col("vq")).as(Seq("i", "v")))
      .groupBy(col("lbl"), col("i"))
      .agg(sum(col("v").cast(DecimalType(38, 0))).as("sv"),
        count(lit(1)).as("n"))
      .select(col("lbl"), col("i"),
        expr("CAST(CASE WHEN sv >= 0 THEN sv div n " +
          "ELSE -((-sv) div n) END AS BIGINT)").as("cv"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (l, rows) =>
        (l, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq) }
      .toSeq.sortBy(_._1)
    val cdf = broadcast(cents.toDF("lbl", "cq"))
    val out = graft.util.LocalFrame.materialize(
      vq.join(cdf, Seq("lbl"))
        .select(col("lbl"), col("vec_id"),
          expr("aggregate(zip_with(vq, cq, (a, b) -> (a - b) * (a - b)), " +
            "0L, (acc, x) -> acc + x)").as("d2"))
        .groupBy(col("lbl"))
        .agg(count(lit(1)).as("n_members"),
          min(struct(col("d2"), col("vec_id"))).as("mn"),
          max(struct(col("d2"), (-col("vec_id")).as("nid"))).as("mx"))
        .select(col("lbl").as("label"), col("n_members"),
          col("mn.vec_id").as("proto_id"), col("mn.d2").as("proto_d2"),
          (-col("mx.nid")).as("far_id"), col("mx.d2").as("far_d2"))
        .orderBy(col("label")))
    vq.unpersist()
    out
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q292_label_prototypes" -> (labelPrototypes _),
    "q287_kmeans_lloyd"    -> (kmeansLloyd _),
    "q276_coreset_kcenter" -> (coresetKCenter _),
    "q250_pca_project_recall" -> (pcaProjectRecall _),
    "q248_embed_pca"       -> (embedPca _),
    "q183_semantic_dedup"  -> (semanticDedup _),
    "q158_pq_recall_bound" -> (pqRecallBound _),
    "q178_embed_dedup"     -> (embedDedupSurvivors _),
    "q177_mmr_diversity"   -> (mmrDiversityGate _),
    "q171_ivfpq_recall_bound" -> (ivfPqRecallBound _),
    "q144_embed_quantization" -> (quantizationGate _),
    "q84_ivf_recall_bound" -> (ivfRecallBound _),
    "q60_knn_brute"        -> (knnBrute _),
    "q61_knn_ivf"          -> (knnIvfGate _),
    "q62_embed_top_pairs"     -> (embedTopPairsExact _),
    "q63_embed_top_pairs_lsh" -> (lshTopPairsGate _),
    "q64_label_centroids"  -> (labelCentroids _),
    "q217_embed_outliers"  -> (embedOutliers _)
  )

  /** One unrolled greedy k-center round for the q276 oracle: pairwise
    * DECIMAL-quantized d2 to the current chosen set c$n, per-vector
    * min floored to ×10⁶ BIGINT, argmax with the vec_id tiebreak on
    * that same floored value (exactly the engine's comparison), and
    * the pick appended into c${n+1}. */
  private def kcenterRound(n: Int): String =
    s"""d$n AS (
       |  SELECT a.vec_id,
       |         sum(CAST((a.v - b.v) * (a.v - b.v) AS DECIMAL(25,12)))
       |           AS d2
       |  FROM ex a JOIN ex b ON a.i = b.i
       |  WHERE b.vec_id IN (SELECT id FROM c$n)
       |  GROUP BY a.vec_id, b.vec_id),
       |m$n AS (
       |  SELECT vec_id,
       |         CAST(floor(min(d2) * CAST(1000000 AS DECIMAL(19,0)))
       |              AS BIGINT) AS dmicro
       |  FROM d$n GROUP BY vec_id),
       |s$n AS (SELECT vec_id, dmicro FROM m$n
       |        ORDER BY dmicro DESC, vec_id LIMIT 1),
       |c${n + 1} AS (SELECT id FROM c$n
       |              UNION ALL SELECT vec_id FROM s$n)""".stripMargin

  val oracles: Map[String, String] = Map(
    // q292: same micro-quantized centroids (sign-split div), HUGEINT
    // d², argmin/argmax with min-id ties via the max/min-join pattern
    "q292_label_prototypes" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS lbl, r.range AS i,
        |         CAST(floor(CAST(embedding[r.range::INT + 1] AS DOUBLE)
        |                    * 1000000) AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN range(0, 64) r),
        |c AS (SELECT lbl, i,
        |             CAST(CASE WHEN sum(v) >= 0
        |                  THEN CAST(sum(v) AS HUGEINT) // count(*)
        |                  ELSE -((-CAST(sum(v) AS HUGEINT)) // count(*))
        |                  END AS BIGINT) AS cv
        |      FROM ex GROUP BY 1, 2),
        |d AS (SELECT e.vec_id, e.lbl,
        |             CAST(sum((e.v - c.cv) * (e.v - c.cv)) AS HUGEINT)
        |               AS d2
        |      FROM ex e JOIN c ON e.lbl = c.lbl AND e.i = c.i
        |      GROUP BY 1, 2),
        |mn AS (SELECT lbl, min(d2) AS v FROM d GROUP BY 1),
        |mx AS (SELECT lbl, max(d2) AS v FROM d GROUP BY 1),
        |pro AS (SELECT d.lbl, min(vec_id) AS proto_id,
        |               CAST(min(d.d2) AS BIGINT) AS proto_d2
        |        FROM d JOIN mn ON d.lbl = mn.lbl AND d.d2 = mn.v
        |        GROUP BY 1),
        |far AS (SELECT d.lbl, min(vec_id) AS far_id,
        |               CAST(min(d.d2) AS BIGINT) AS far_d2
        |        FROM d JOIN mx ON d.lbl = mx.lbl AND d.d2 = mx.v
        |        GROUP BY 1),
        |nn AS (SELECT CAST(label AS BIGINT) AS lbl,
        |              CAST(count(*) AS BIGINT) AS n_members
        |       FROM embeddings GROUP BY 1)
        |SELECT nn.lbl AS label, n_members, proto_id, proto_d2,
        |       far_id, far_d2
        |FROM nn JOIN pro ON nn.lbl = pro.lbl
        |JOIN far ON nn.lbl = far.lbl
        |ORDER BY label""".stripMargin,
    // q287: both Lloyd iterations replayed — micro-quantized integer
    // coords, HUGEINT interior sums, identical argmin tie (min cid at
    // min d2) and sign-split truncating centroid division
    "q287_kmeans_lloyd" ->
      """WITH ex AS (
        |  SELECT vec_id, r.range AS i,
        |         CAST(floor(CAST(embedding[r.range::INT + 1] AS DOUBLE)
        |                    * 1000000) AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN range(0, 64) r),
        |c0 AS (SELECT vec_id AS cid, i, v FROM ex WHERE vec_id < 4),
        |a1 AS (SELECT e.vec_id, c.cid,
        |              CAST(sum((e.v - c.v) * (e.v - c.v)) AS HUGEINT) AS d2
        |       FROM ex e JOIN c0 c ON e.i = c.i GROUP BY 1, 2),
        |m1 AS (SELECT vec_id, min(d2) AS md FROM a1 GROUP BY 1),
        |s1 AS (SELECT a1.vec_id, min(a1.cid) AS cid, min(a1.d2) AS d2
        |       FROM a1 JOIN m1 ON a1.vec_id = m1.vec_id AND a1.d2 = m1.md
        |       GROUP BY 1),
        |c1 AS (SELECT s1.cid, ex.i,
        |              CAST(CASE WHEN sum(ex.v) >= 0
        |                   THEN CAST(sum(ex.v) AS HUGEINT) // count(*)
        |                   ELSE -((-CAST(sum(ex.v) AS HUGEINT))
        |                          // count(*)) END AS BIGINT) AS v
        |       FROM s1 JOIN ex ON s1.vec_id = ex.vec_id GROUP BY 1, 2),
        |a2 AS (SELECT e.vec_id, c.cid,
        |              CAST(sum((e.v - c.v) * (e.v - c.v)) AS HUGEINT) AS d2
        |       FROM ex e JOIN c1 c ON e.i = c.i GROUP BY 1, 2),
        |m2 AS (SELECT vec_id, min(d2) AS md FROM a2 GROUP BY 1),
        |s2 AS (SELECT a2.vec_id, min(a2.cid) AS cid, min(a2.d2) AS d2
        |       FROM a2 JOIN m2 ON a2.vec_id = m2.vec_id AND a2.d2 = m2.md
        |       GROUP BY 1),
        |c2 AS (SELECT s2.cid, ex.i,
        |              CAST(CASE WHEN sum(ex.v) >= 0
        |                   THEN CAST(sum(ex.v) AS HUGEINT) // count(*)
        |                   ELSE -((-CAST(sum(ex.v) AS HUGEINT))
        |                          // count(*)) END AS BIGINT) AS v
        |       FROM s2 JOIN ex ON s2.vec_id = ex.vec_id GROUP BY 1, 2),
        |rep AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
        |               CAST(sum(d2) AS HUGEINT) AS sd2
        |        FROM s2 GROUP BY 1)
        |SELECT rep.cid AS cluster, n_members,
        |  CAST(sd2 // n_members AS BIGINT) AS mean_d2,
        |  ca.v AS c_dim0, cb.v AS c_dim1
        |FROM rep
        |JOIN c2 ca ON rep.cid = ca.cid AND ca.i = 0
        |JOIN c2 cb ON rep.cid = cb.cid AND cb.i = 1
        |ORDER BY cluster""".stripMargin,
    // q276: all nine selection rounds replayed with the identical
    // floored-micro argmax comparison
    "q276_coreset_kcenter" ->
      s"""WITH ex AS (
         |  SELECT vec_id, r.range AS i,
         |         CAST(embedding[r.range::INT + 1] AS DOUBLE) AS v
         |  FROM embeddings CROSS JOIN range(0, 64) r),
         |c1 AS (SELECT CAST(0 AS BIGINT) AS id),
         |${(1 to 9).map(kcenterRound).mkString(",\n")}
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS sel_rank,
         |         CAST(0 AS BIGINT) AS vec_id,
         |         CAST(0 AS BIGINT) AS dist_to_set_micro
         |${(1 to 9).map(r =>
             s"  UNION ALL SELECT ${r + 1}, vec_id, dmicro FROM s$r")
            .mkString("\n|")}
         |) ORDER BY sel_rank""".stripMargin,
    // q250: corpus facts SQL-knowable; the projection identities are
    // deterministic (DECIMAL scatter + sign-normalized Jacobi +
    // DECIMAL-quantized norm sums) → gates pinned
    "q250_pca_project_recall" ->
      """SELECT count(*) AS n_vecs, CAST(64 AS BIGINT) AS dim,
        |       CAST(16 AS BIGINT) AS k, true AS var_kept_ok,
        |       true AS proj_var_identity_ok, true AS bottom_lt_top_ok
        |FROM embeddings""".stripMargin,
    // q248: SQL-knowable facts exact (count, dim, DECIMAL-quantized
    // scatter trace — the same 6-dp mean + DECIMAL(25,12) product
    // arithmetic as q217); eigen gates deterministic → pinned true
    "q248_embed_pca" ->
      """WITH ex AS (SELECT vec_id, r.range AS i,
        |              CAST(embedding[r.range::INT + 1] AS DOUBLE) AS v
        |            FROM embeddings CROSS JOIN range(0, 64) r),
        |m AS (SELECT i, round(avg(v), 6) AS m FROM ex GROUP BY i),
        |tr AS (SELECT CAST(sum(CAST((v - m) * (v - m)
        |                AS DECIMAL(25,12))) AS DECIMAL(35,12)) AS trace
        |       FROM ex JOIN m USING (i))
        |SELECT (SELECT count(*) FROM embeddings) AS n_vecs,
        |       CAST(64 AS BIGINT) AS dim,
        |       CAST(round(trace, 6) AS DOUBLE) AS trace_6dp,
        |       true AS orthonormal_ok, true AS eig_residual_ok,
        |       true AS eig_descending_ok, true AS trace_matches_ok,
        |       true AS top8_var_ok
        |FROM tr""".stripMargin,
    // q183: ground-truth member/ideal-drop counts from the same
    // recursive-CTE rebuild as q178; the cluster-dependent outcomes pin
    // as gates (subset/survivors by construction, recall by measured
    // floor — deterministic k-means makes each SF's value fixed).
    "q183_semantic_dedup" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |                               b.embedding::DOUBLE[]) >= 0.42),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |n AS (SELECT DISTINCT src AS id FROM e),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM n
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.id),
        |comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
        |SELECT CAST((SELECT count(*) FROM n) AS BIGINT)
        |         AS n_exact_members,
        |       CAST((SELECT count(*) FROM n)
        |         - (SELECT count(DISTINCT component) FROM comp) AS BIGINT)
        |         AS n_ideal_drops,
        |       true AS dropped_subset,
        |       true AS survivors_kept,
        |       true AS recall_ok""".stripMargin,
    "q144_embed_quantization" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_exact,
        |       true AS recall_ok, true AS err_bound_ok,
        |       true AS int8_range_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "q84_ivf_recall_bound" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_exact,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "q158_pq_recall_bound" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_exact,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "q171_ivfpq_recall_bound" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_exact,
        |       true AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "q177_mmr_diversity" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_selected,
        |       true AS selection_ok, true AS diversity_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    // identical clustering rebuilt with a recursive CTE; survivors are
    // the component labels (min id), unclustered ids their own
    "q178_embed_dedup" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |                               b.embedding::DOUBLE[]) >= 0.42),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |n AS (SELECT DISTINCT src AS id FROM e),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM n
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.id),
        |comp AS (SELECT id AS vec_id, min(lbl) AS component
        |         FROM reach GROUP BY id)
        |SELECT emb.vec_id,
        |       CAST(coalesce(comp.component, emb.vec_id) AS BIGINT)
        |         AS component,
        |       coalesce(comp.component, emb.vec_id) = emb.vec_id
        |         AS survivor
        |FROM embeddings emb LEFT JOIN comp ON emb.vec_id = comp.vec_id
        |ORDER BY emb.vec_id""".stripMargin,
    "q60_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 5),
        |p AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |             list_cosine_similarity(q.qe::DOUBLE[],
        |                                    e.embedding::DOUBLE[]) AS sim,
        |             row_number() OVER (PARTITION BY q.query_id
        |                 ORDER BY list_cosine_similarity(q.qe::DOUBLE[],
        |                     e.embedding::DOUBLE[]) DESC, e.vec_id) AS rank
        |      FROM q JOIN embeddings e ON e.vec_id != q.query_id)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        |       round(sim, 4) AS sim
        |FROM p WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // q61/q63: the approximate structures (coarse quantizer / sign-LSH
    // planes) are ours, so the oracle pins their deterministic quality
    // gates to constants; the SQL-knowable facts (query set, k) are
    // stated exactly (q82/q84's promotion pattern).
    "q61_knn_ivf" ->
      """SELECT CAST(vec_id AS BIGINT) AS query_id,
        |       CAST(10 AS BIGINT) AS n_returned,
        |       true AS neighbors_ok, true AS sims_exact_ok,
        |       true AS rank_order_ok, true AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "q63_embed_top_pairs_lsh" ->
      """SELECT CAST(20 AS BIGINT) AS n_pairs,
        |       true AS pairs_wellformed_ok, true AS sims_exact_ok,
        |       true AS order_ok, true AS overlap_ok,
        |       true AS sim_quality_ok""".stripMargin,
    "q62_embed_top_pairs" ->
      """SELECT id_a, id_b, round(sim, 4) AS sim FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         list_cosine_similarity(a.embedding::DOUBLE[],
        |                                b.embedding::DOUBLE[]) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
        |ORDER BY sim DESC, id_a, id_b LIMIT 20""".stripMargin,
    "q64_label_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, r.range AS pos,
        |       round(avg(embedding[r.range::INT + 1]::DOUBLE), 6) AS avg_v,
        |       count(*) AS n
        |FROM embeddings CROSS JOIN range(0, 64) r
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    // q217: same 6-dp centroid, DECIMAL-quantized squared terms, exact
    // interpolated p95 (quantile_cont ≡ Spark percentile, q29's rule)
    "q217_embed_outliers" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, r.range AS pos,
        |         CAST(embedding[r.range::INT + 1] AS DOUBLE) AS v
        |  FROM embeddings CROSS JOIN range(0, 64) r),
        |c AS (SELECT label, pos, round(avg(v), 6) AS c
        |      FROM e GROUP BY label, pos),
        |d AS (SELECT vec_id, label,
        |             CAST(sum(CAST((v - c) * (v - c) AS DECIMAL(25,12)))
        |               AS DOUBLE) AS d2
        |      FROM e JOIN c USING (label, pos) GROUP BY vec_id, label),
        |t AS (SELECT label, quantile_cont(d2, 0.95) AS p95
        |      FROM d GROUP BY label)
        |SELECT label, count(*) AS n_vecs,
        |       CAST(sum(CASE WHEN d2 > p95 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers,
        |       round(max(p95), 6) AS p95_d2
        |FROM d JOIN t USING (label)
        |GROUP BY label ORDER BY label""".stripMargin
  )
}
