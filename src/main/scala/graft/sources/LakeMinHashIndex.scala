package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Committed MinHash-LSH band index over a lake table's text column —
  * the INGEST-TIME dedup primitive a 100 TB corpus needs: "is this new
  * batch near-duplicating anything already in the corpus?" answered in
  * O(batch), never by re-pairing the corpus.
  *
  * Layout (the [[LakeAnnIndex]] sidecar pattern):
  * {{{
  *   _index/minhash-<col>-<uuid>/   (id, band, bucket) parquet
  *   manifest keys:  mhidx:<col>    sidecar relpath
  *                   mhparams:<col> shingleN,bands,rowsPerBand
  *                   mhver:<col>    the snapshot version the index covers
  * }}}
  *
  * Freshness is explicit, never silent: appends CARRY the index keys
  * but not the version stamp's advance, so a post-append probe refuses
  * with the version-mismatch message ("stale — reindex"); rewrites
  * (delete/compact/overwrite) drop the keys entirely and a probe
  * refuses as "no index".
  * Probing is candidates-only exact: the LSH bands PRUNE (the batch's
  * band hashes equi-join ~the collision buckets), the drop DECISION is
  * exact Jaccard on the candidate pairs — the index can only cost
  * recall, never precision, and the q85 recall gate bounds that.
  *
  * Scale shape: the index is |corpus| × bands small rows (ids +
  * hashes, no text); a batch probe shuffles |batch| × bands band
  * entries + reads only the candidate corpus docs' text back (bounded
  * by collisions, not corpus size). */
object LakeMinHashIndex {

  private def idxKey(c: String) = s"mhidx:$c"
  private def paramsKey(c: String) = s"mhparams:$c"
  private def verKey(c: String) = s"mhver:$c"

  /** (id, band, bucket) band entries of `docs` — shared by the index
    * build and the batch probe, so both sides hash identically. */
  private def bandEntries(docs: DataFrame, idCol: String, textCol: String,
                          shingleN: Int, bands: Int,
                          rowsPerBand: Int): DataFrame =
    graft.dedup.MinHash
      .signatureDataset(docs, idCol, textCol, shingleN, bands * rowsPerBand)
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1,
              lit(rowsPerBand))).as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))

  /** Build (or rebuild) the band index for the CURRENT snapshot: one
    * signature pass over the corpus, one sidecar write, one
    * metadata-only commit recording it. */
  def indexMinHash(spark: SparkSession, root: String, idCol: String,
                   textCol: String, shingleN: Int = 2, bands: Int = 16,
                   rowsPerBand: Int = 4): Int = {
    val v = LakeTable.latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no table at $root"))
    val meta = LakeTable.manifestMetaAt(spark, root, v)
    LakeTable.requireNotRenamed(meta, idCol, "MinHash indexing")
    LakeTable.requireNotRenamed(meta, textCol, "MinHash indexing")
    val docs = LakeTable.read(spark, root)
      .select(col(idCol).as("id"), col(textCol).as("text"))
    val rel = s"_index/minhash-$textCol-${java.util.UUID.randomUUID()}"
    bandEntries(docs, "id", "text", shingleN, bands, rowsPerBand)
      .write.parquet(new Path(root, rel).toString)
    val nv = LakeTable.commitVersion(spark, root, v + 1,
      LakeTable.dataDirsAt(spark, root, v),
      LakeTable.carryMeta(meta) +
        (idxKey(textCol) -> rel) +
        (paramsKey(textCol) -> s"$shingleN,$bands,$rowsPerBand") +
        (verKey(textCol) -> (v + 1).toString) +
        ("op" -> "index-minhash"))
    nv
  }

  /** Near-dup-screen a NEW batch against the indexed corpus: returns
    * the batch rows whose text does NOT near-duplicate (exact Jaccard
    * ≥ `threshold` on word shingles) any corpus document. Probing is
    * O(batch): the batch's band hashes equi-join the committed index,
    * only candidate corpus docs' text is read back for the exact
    * verification. Refuses when the index is missing or STALE (the
    * table moved past the indexed snapshot — reindex first; silent
    * staleness would quietly stop deduping new-vs-new corpus). */
  def dedupNewBatch(spark: SparkSession, root: String, batch: DataFrame,
                    idCol: String, textCol: String,
                    threshold: Double = 0.3): DataFrame = {
    val v = LakeTable.latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no table at $root"))
    val meta = LakeTable.manifestMetaAt(spark, root, v)
    val rel = meta.getOrElse(idxKey(textCol),
      throw new IllegalStateException(
        s"no MinHash index on '$textCol' at $root — run indexMinHash"))
    val indexedV = meta(verKey(textCol)).toInt
    require(indexedV == v,
      s"MinHash index on '$textCol' at $root covers version $indexedV " +
        s"but the table is at $v — reindex before probing (a stale " +
        "index silently under-dedups)")
    val Array(shingleN, bands, rowsPerBand) =
      meta(paramsKey(textCol)).split(",").map(_.trim.toInt)
    val idx = spark.read.parquet(new Path(root, rel).toString)
    val probe = bandEntries(
      batch.select(col(idCol).as("id"), col(textCol).as("text")),
      "id", "text", shingleN, bands, rowsPerBand)
    val candidates = probe.alias("p")
      .join(idx.alias("i"),
        col("p.band") === col("i.band") &&
          col("p.bucket") === col("i.bucket"))
      .select(col("p.id").as("bid"), col("i.id").as("cid"))
      .dropDuplicates("bid", "cid")
    // exact verification: shingle sets for the batch side + ONLY the
    // candidate corpus docs (semi-join read, bounded by collisions)
    val k = bands * rowsPerBand
    def shingles(docs: DataFrame): DataFrame =
      graft.dedup.MinHash
        .signatureDataset(docs, "id", "text", shingleN, k)
        .select(col("id"), col("sh"))
    val corpusCand = LakeTable.read(spark, root)
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .join(candidates.select(col("cid").as("id")).distinct(), Seq("id"),
        "left_semi")
    val dropIds = candidates
      .join(shingles(batch.select(col(idCol).as("id"),
          col(textCol).as("text")))
        .select(col("id").as("bid"), col("sh").as("sh_b")), Seq("bid"))
      .join(shingles(corpusCand)
        .select(col("id").as("cid"), col("sh").as("sh_c")), Seq("cid"))
      .filter(graft.dedup.MinHash.exactJaccard(col("sh_b"), col("sh_c"))
        >= threshold)
      .select(col("bid").as(idCol)).distinct()
    batch.join(dropIds, Seq(idCol), "left_anti")
  }
}
