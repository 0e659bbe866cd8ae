package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vector.{KMeansIvf, ProductQuantizer}

/** Persisted IVF-PQ approximate-nearest-neighbor index for a lake-format
  * table — the committed twin of [[ProductQuantizer.ivfPqTopK]], which
  * retrains and re-encodes per query. This turns vector search into a
  * TABLE capability: train/encode ONCE, commit the artifacts as
  * immutable `_index/` sidecars via the metadata-only commit pattern the
  * bloom index proved ([[LakeTable.indexBloom]]), and serve every later
  * probe from the committed codes.
  *
  * Layout (all under the table root, referenced from the manifest):
  * {{{
  *   _index/annmodel-<col>-<uuid>.bin       coarse centroids + PQ codebooks
  *   _index/anncodes-<dir>-<col>/           (id, bucket, codes) parquet,
  *                                          one sidecar per data dir
  *   manifest:  #annmodel:<col>=<model sidecar>
  *              #anncodes:<data dir>:<col>=<codes sidecar>
  * }}}
  *
  * Invalidation contract (mirrors the bloom sidecars):
  *  - codes sidecars are keyed by the COW-immutable DATA DIR, so an
  *    entry can never silently describe changed rows;
  *  - appends carry the model and every existing codes entry — old
  *    groups stay indexed, the new group is simply UNCOVERED until the
  *    next [[indexIvfPq]] run, which encodes ONLY uncovered groups
  *    (incremental re-index: O(churn), not O(table));
  *  - row-churning rewrites drop the entries with the dirs they replace
  *    (UPDATE/MERGE keep surviving groups' codes; a full COW
  *    compact/merge drops everything — the index is invalid and the
  *    next [[indexIvfPq]] rebuilds);
  *  - [[annTopK]] stays CORRECT across all of this: coded groups are
  *    ADC-scanned through the probed inverted lists, uncovered groups
  *    are exact-scanned, and the merged candidates are exact re-ranked
  *    against the live (delete-masked) snapshot — a deleted or rewritten
  *    row can never surface because the re-rank join is against
  *    [[LakeTable.read]]. Degradation is performance-only.
  *
  * Scale notes (100 TB): the model is KBs (k×dim + m×kCodes×subDim
  * doubles) — broadcast; encoding streams each data dir once with no
  * shuffle (codes ride along); a probe reads ~nProbe/nCentroids of the
  * 8-byte-per-vector codes plus only the appended-uncovered tail, and
  * the exact re-rank touches kCand rows per query. Everything is seeded
  * and iteration-capped — bit-deterministic across runs/partitionings.
  */
object LakeAnnIndex {

  /** Trained artifacts: coarse centroids + per-subspace PQ codebooks
    * over RESIDUALS (v − centroid), FAISS's IVFPQ composition. */
  final case class AnnModel(centroids: Array[Array[Double]],
                            codebooks: Array[Array[Array[Double]]])

  private def modelKey(col: String) = s"annmodel:$col"
  private def codesKey(dir: String, col: String) = s"anncodes:$dir:$col"

  // ---- model sidecar (manual binary: magic, dims, doubles) ----------

  private val MAGIC = 0x47414E31 // "GAN1"

  private def writeModel(spark: SparkSession, root: String, rel: String,
                         m: AnnModel): Unit = {
    val f = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(f.create(new Path(root, rel), true)))
    try {
      out.writeInt(MAGIC)
      out.writeInt(m.centroids.length)
      out.writeInt(m.centroids.head.length)
      m.centroids.foreach(_.foreach(out.writeDouble))
      out.writeInt(m.codebooks.length)
      out.writeInt(m.codebooks.head.length)
      out.writeInt(m.codebooks.head.head.length)
      m.codebooks.foreach(_.foreach(_.foreach(out.writeDouble)))
    } finally out.close()
  }

  /** Model sidecars are immutable (fresh uuid per train) — cache per
    * (root, sidecar) like the bloom filters. */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnnModel]()

  private[sources] def loadModel(spark: SparkSession, root: String,
                                 rel: String): AnnModel =
    modelCache.computeIfAbsent(s"$root/$rel", _ => {
      val f = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(f.open(new Path(root, rel))))
      try {
        require(in.readInt() == MAGIC, s"not an ANN model sidecar: $rel")
        val k = in.readInt(); val dim = in.readInt()
        val cents = Array.fill(k)(Array.fill(dim)(in.readDouble()))
        val m = in.readInt(); val kc = in.readInt(); val sd = in.readInt()
        val books = Array.fill(m)(Array.fill(kc)(Array.fill(sd)(in.readDouble())))
        AnnModel(cents, books)
      } finally in.close()
    })

  /** The committed model sidecar path for `vecCol`, if any — exposed so
    * callers can verify re-index runs reuse the model (incremental, not
    * retrain). */
  def modelSidecar(spark: SparkSession, root: String,
                   vecCol: String): Option[String] =
    LakeTable.latestVersion(spark, root)
      .flatMap(v => LakeTable.manifestMetaAt(spark, root, v)
        .get(modelKey(vecCol)))

  /** (coded dirs, uncovered dirs) of the latest snapshot for `vecCol` —
    * exposed for tests/inspection; [[annTopK]] is the read path. */
  def coverage(spark: SparkSession, root: String,
               vecCol: String): (Seq[String], Seq[String]) = {
    val v = LakeTable.latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no table at $root"))
    val meta = LakeTable.manifestMetaAt(spark, root, v)
    LakeTable.dataDirsAt(spark, root, v)
      .partition(d => meta.contains(codesKey(d, vecCol)))
  }

  /** Build (or incrementally extend) the committed IVF-PQ index for
    * `vecCol`, id'd by integral `idCol`. Trains the model on a bounded
    * id-ordered sample of the live snapshot ONLY if no model is
    * committed yet; encodes ONLY data dirs without a codes entry (so
    * re-running after appends indexes just the new groups); publishes
    * everything as one metadata-only commit (op=index-ann, same file
    * groups). No-ops (same version) when the index is already complete.
    * Returns the committed (or current) version. */
  def indexIvfPq(spark: SparkSession, root: String, idCol: String,
                 vecCol: String, nCentroids: Int = 16, m: Int = 8,
                 kCodes: Int = 256, maxTrainSample: Int = 4096): Int = {
    import spark.implicits._
    val v = LakeTable.latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no table at $root"))
    val meta = LakeTable.manifestMetaAt(spark, root, v)
    // encoding reads per-dir RAW (physical) frames — a renamed id or
    // vector column must be materialized (compact) before indexing
    LakeTable.requireNotRenamed(meta, idCol, "ANN indexing")
    LakeTable.requireNotRenamed(meta, vecCol, "ANN indexing")
    val dirs = LakeTable.dataDirsAt(spark, root, v)
    val uncovered = dirs.filterNot(d => meta.contains(codesKey(d, vecCol)))

    val (model, modelAdded) = meta.get(modelKey(vecCol)) match {
      case Some(rel) => (loadModel(spark, root, rel), Map.empty[String, String])
      case None =>
        // delete-masked read: purged rows must not shape the model
        val train = LakeTable.read(spark, root)
          .select(col(idCol).cast("long"), col(vecCol))
          .as[(Long, Array[Float])]
          .orderBy(col(idCol)).limit(maxTrainSample).collect()
          .map { case (id, vec) => (id, vec.map(_.toDouble)) }
        val cents = KMeansIvf.fitCentroids(train, nCentroids)
        val residuals = train.map { case (id, vec) =>
          val c = cents(KMeansIvf.nearest(cents, vec))
          (id, Array.tabulate(vec.length)(i => vec(i) - c(i)))
        }
        val mm = AnnModel(cents,
          ProductQuantizer.fitCodebooks(residuals, m, kCodes))
        val rel = s"_index/annmodel-$vecCol-${java.util.UUID.randomUUID()}.bin"
        writeModel(spark, root, rel, mm)
        (mm, Map(modelKey(vecCol) -> rel))
    }
    if (modelAdded.isEmpty && uncovered.isEmpty) return v

    val bc = spark.sparkContext.broadcast(model)
    val added = uncovered.map { dir =>
      // per-dir RAW read: codes are keyed by the immutable dir, so a
      // row MOR-deleted later is masked at re-rank, not here
      val rel = s"_index/anncodes-${dir.replace('/', '_')}-$vecCol"
      spark.read.parquet(new Path(root, dir).toString)
        .select(col(idCol).cast("long"), col(vecCol))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val mdl = bc.value
          it.map { case (id, vec) =>
            val vd = vec.map(_.toDouble)
            val b = KMeansIvf.nearest(mdl.centroids, vd)
            val cent = mdl.centroids(b)
            val res = Array.tabulate(vd.length)(i => vd(i) - cent(i))
            (id, b, ProductQuantizer.encode(mdl.codebooks, res))
          }
        }.toDF("ann_id", "ann_bucket", "ann_codes")
        .write.parquet(new Path(root, rel).toString)
      codesKey(dir, vecCol) -> rel
    }.toMap
    LakeTable.commitVersion(spark, root, v + 1, dirs,
      LakeTable.carryMeta(meta) ++ modelAdded ++ added + ("op" -> "index-ann"))
  }

  /** Serve approximate top-k neighbors from the COMMITTED index: probe
    * `nProbe` inverted lists per query over the coded groups (ADC on the
    * 8-byte codes — no corpus vectors read), exact-scan any uncovered
    * groups (appends since the last index run), then exact re-rank the
    * merged `kCand` candidates per query against the live delete-masked
    * snapshot. Distances are squared L2; ties resolve by neighbor id —
    * fully deterministic. Queries are the bounded side (collected +
    * broadcast, the [[ProductQuantizer.ivfPqTopK]] contract).
    * Output: (query_id, rank, neighbor_id, d2). */
  def annTopK(spark: SparkSession, root: String, queries: DataFrame,
              qId: String, qVec: String, idCol: String, vecCol: String,
              k: Int, nProbe: Int = 6, kCand: Int = 100): DataFrame = {
    import spark.implicits._
    val v = LakeTable.latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no table at $root"))
    val meta = LakeTable.manifestMetaAt(spark, root, v)
    val modelRel = meta.getOrElse(modelKey(vecCol),
      throw new IllegalStateException(
        s"no committed ANN index for $vecCol at $root — run indexIvfPq"))
    // the uncovered-tail scan reads raw physical frames by these names
    LakeTable.requireNotRenamed(meta, idCol, "ANN probing")
    LakeTable.requireNotRenamed(meta, vecCol, "ANN probing")
    val model = loadModel(spark, root, modelRel)
    val dirs = LakeTable.dataDirsAt(spark, root, v)
    val (coded, uncovered) = dirs.partition(d =>
      meta.contains(codesKey(d, vecCol)))

    val qLocal = queries.select(col(qId).cast("long"), col(qVec))
      .as[(Long, Array[Float])].collect()
      .map { case (id, vec) => (id, vec.map(_.toDouble)) }
    def residual(vd: Array[Double], c: Int): Array[Double] = {
      val cent = model.centroids(c)
      Array.tabulate(vd.length)(i => vd(i) - cent(i))
    }
    val probes = qLocal.flatMap { case (id, vd) =>
      KMeansIvf.nearestN(model.centroids, vd, nProbe).map { b =>
        (id, b, ProductQuantizer.distanceTable(model.codebooks,
          residual(vd, b)))
      }
    }
    val bcProbes = spark.sparkContext.broadcast(probes)
    val bcQ = spark.sparkContext.broadcast(qLocal)

    val approx =
      if (coded.isEmpty) spark.emptyDataset[(Long, Long, Double)]
      else spark.read.parquet(coded.map(d =>
          new Path(root, meta(codesKey(d, vecCol))).toString): _*)
        .as[(Long, Int, Array[Byte])]
        .mapPartitions { it =>
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
        }
    val fresh =
      if (uncovered.isEmpty) spark.emptyDataset[(Long, Long, Double)]
      else spark.read.parquet(uncovered.map(d =>
          new Path(root, d).toString): _*)
        .select(col(idCol).cast("long"), col(vecCol))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val qs = bcQ.value
          it.flatMap { case (nid, vec) =>
            val vd = vec.map(_.toDouble)
            qs.iterator.collect { case (qid, qv) if qid != nid =>
              var d2 = 0.0; var d = 0
              while (d < vd.length) {
                val x = qv(d) - vd(d); d2 += x * x; d += 1
              }
              (qid, nid, d2)
            }
          }
        }
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("score").asc, col("neighbor_id"))
    val cands = approx.union(fresh)
      .toDF("query_id", "neighbor_id", "score")
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= kCand)
      .select(col("query_id"), col("neighbor_id"))
      // dedup before the exact re-rank: duplicate idCol values are
      // legal (the lake has no PK) and one id can appear in both a
      // coded dir and an uncovered append, so without this a repeated
      // (query_id, neighbor_id) pair would occupy two consecutive
      // ranks after the join and displace a genuine neighbor; bounded
      // by kCand rows per query, so the distinct is negligible
      .distinct()

    // exact re-rank against the LIVE snapshot (delete masks + schema
    // evolution applied) — a purged/rewritten row can't surface
    val qFrame = qLocal.toSeq.toDF("query_id", "qe")
    val d2Expr = expr(
      """aggregate(zip_with(qe, ce,
        |  (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |          * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
        |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("neighbor_id"))
    broadcast(cands)
      .join(LakeTable.read(spark, root)
        .select(col(idCol).cast("long").as("neighbor_id"),
          col(vecCol).as("ce")), Seq("neighbor_id"))
      .join(broadcast(qFrame), Seq("query_id"))
      .withColumn("d2", d2Expr)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("d2"))
  }
}
