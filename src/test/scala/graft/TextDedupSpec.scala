package graft

import graft.dedup.{MinHash, SimHash}
import graft.queries.TextQueries
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("langid confusion matrix is total over the corpus") {
    val total = TextQueries.langIdConfusion(spark, sf)
      .agg(sum("n")).head().getLong(0)
    assert(total == docs.count())
  }

  test("Column-form langId and qualityScore agree with the JVM fast paths") {
    val sample = docs.limit(50)
    val viaCols = sample
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("l"),
        TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    val viaLocal = sample.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> (TextFunctions.langIdLocal(r.getString(1)),
        TextFunctions.qualityScoreLocal(r.getString(1)))
    }.toMap
    viaLocal.foreach { case (id, (lang, q)) =>
      assert(viaCols(id)._1 == lang, s"langId mismatch doc $id")
      assert(math.abs(viaCols(id)._2 - q) < 1e-9, s"quality mismatch doc $id")
    }
  }

  test("quality scores are in [0,1]") {
    val bad = TextQueries.docQuality(spark, sf)
      .filter(col("quality") < 0 || col("quality") > 1).count()
    assert(bad == 0)
  }

  test("vocab fingerprint: identical word sets collide, different don't") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "fox brown quick the the"),   // same vocab, reordered+dup
      (3L, "a completely different doc")
    ).toDF("id", "text")
      .withColumn("fp", TextFunctions.vocabFingerprint(col("text")))
    val fps = df.select("fp").collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("Hash64.xxhash64String is bit-identical to Spark's xxhash64") {
    import spark.implicits._
    val strings = Seq("", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh",
      "exactly-sixteen_b", "twenty-one chars here",
      "thirty-two bytes of input text!!",
      "a much longer string that exceeds the thirty-two byte stripe " +
        "threshold of the xxh64 algorithm by a comfortable margin",
      "unicode: héllo wörld ünïcödé 日本語 🎉")
    val viaSpark = strings.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strings.foreach { s =>
      assert(graft.functions.Hash64.xxhash64String(s) == viaSpark(s),
        s"xxhash64 mismatch for '$s'")
    }
  }

  test("JVM signatureDataset equals the Column signature form") {
    import spark.implicits._
    val sample = docs.limit(30)
    val k = 16
    val viaJvm = MinHash.signatureDataset(sample, "doc_id", "text",
        shingleN = 2, k = k)
      .select(col("id"), col("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCols = sample
      .select(col("doc_id"),
        MinHash.signature(MinHash.wordShingles(col("text"), 2), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    viaJvm.foreach { case (id, sig) =>
      assert(sig == viaCols(id), s"signature mismatch doc $id")
    }
  }

  test("JVM simhashLocal equals the Column simhash64 form") {
    val sample = docs.limit(30)
    val viaCols = sample
      .select(col("doc_id"), SimHash.simhash64(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.select("doc_id", "text").collect().foreach { r =>
      assert(SimHash.simhashLocal(r.getString(1)) == viaCols(r.getLong(0)),
        s"simhash mismatch doc ${r.getLong(0)}")
    }
  }

  test("minhash estimate tracks exact jaccard on controlled pairs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val half = ((1 to 20).map(i => s"tok$i") ++
      (1 to 20).map(i => s"other$i")).mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, half)).toDF("id", "text")
      .withColumn("sh", MinHash.wordShingles(col("text"), 1))
      .withColumn("sig", MinHash.signature(col("sh"), 64))
    val rows = df.select("id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree12 = rows(1L).zip(rows(2L)).count(p => p._1 == p._2) / 64.0
    val agree13 = rows(1L).zip(rows(3L)).count(p => p._1 == p._2) / 64.0
    assert(agree12 == 1.0, s"identical docs must have identical sigs")
    // true jaccard(1,3) = 20/60 = 0.333; 64 hashes → s.e. ~0.06
    assert(agree13 > 0.13 && agree13 < 0.53, s"agree13=$agree13")
  }

  test("minhash-LSH finds the vocabulary-identical near-dup pairs") {
    // ground truth: pairs with identical vocab fingerprints (exist in
    // this corpus by construction) have word-shingle jaccard high enough
    // for a 2-token shingle run at threshold 0.3 to surface some pairs
    val pairs = TextQueries.minhashNearDups(spark, sf).collect()
    assert(pairs.nonEmpty, "expected at least one verified near-dup pair")
    pairs.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.3)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("minhash-LSH recall: contains every pair with exact jaccard >= 0.6") {
    // brute-force exact jaccard on 2-shingles over the sf0.001 corpus
    val sh = docs.select(col("doc_id"),
      MinHash.wordShingles(col("text"), 2).as("sh"))
    val l = sh.select(col("doc_id").as("id_a"), col("sh").as("sha"))
    val r = sh.select(col("doc_id").as("id_b"), col("sh").as("shb"))
    val truth = l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("j", MinHash.exactJaccard(col("sha"), col("shb")))
      .filter(col("j") >= 0.6)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val found = TextQueries.minhashNearDups(spark, sf).collect()
      .map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"))).toSet
    val missed = truth -- found
    assert(missed.isEmpty,
      s"LSH missed ${missed.size} of ${truth.size} high-jaccard pairs")
  }

  test("jaccardThresholdPairs equals brute-force exact pairs at 0.9") {
    val sh = docs.select(col("doc_id"),
      MinHash.wordShingles(col("text"), 2).as("sh"))
    val l = sh.select(col("doc_id").as("id_a"), col("sh").as("sha"))
    val r = sh.select(col("doc_id").as("id_b"), col("sh").as("shb"))
    val truth = l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("j", MinHash.exactJaccard(col("sha"), col("shb")))
      .filter(col("j") >= 0.9)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = MinHash.jaccardThresholdPairs(docs, "doc_id", "text", 2, 0.9)
      .collect().map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"))).toSet
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }

  test("q85 recall gate: every exact >=0.9 pair is recovered by LSH") {
    val rows = TextQueries.lshRecallBound(spark, sf).collect()
    assert(rows.nonEmpty, "corpus should contain >=0.9 pairs")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("found"),
        s"LSH missed pair (${r.getAs[Long]("id_a")}, ${r.getAs[Long]("id_b")})")
    }
  }

  test("winnowing: substring >= w+k-1 chars guarantees a shared fingerprint") {
    import graft.dedup.Winnow
    val k = 8; val w = 4
    val shared = "a common run of characters long enough to span windows"
    val d1 = "prefix one " + shared + " suffix alpha"
    val d2 = "totally different head " + shared + " other tail"
    val f1 = Winnow.fingerprintsLocal(d1, k, w).toSet
    val f2 = Winnow.fingerprintsLocal(d2, k, w).toSet
    assert(shared.length >= w + k - 1)
    assert((f1 & f2).nonEmpty, "guaranteed shared fingerprint missing")
    // identical docs → identical fingerprint sets
    assert(Winnow.fingerprintsLocal(d1, k, w).sameElements(
      Winnow.fingerprintsLocal(d1, k, w)))
    // disjoint alphabets → disjoint fingerprints
    val fA = Winnow.fingerprintsLocal("aaaa bbbb cccc dddd eeee", k, w).toSet
    val fB = Winnow.fingerprintsLocal("zzzz yyyy xxxx wwww vvvv", k, w).toSet
    assert((fA & fB).isEmpty)
    // short text degenerates to a single whole-string hash
    assert(Winnow.fingerprintsLocal("tiny", k, w).length == 1)
  }

  test("q89 winnow gate: every exact >=0.9 pair shares a fingerprint") {
    val rows = TextQueries.winnowRecallBound(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("shares_fp"),
        s"pair (${r.getAs[Long]("id_a")}, ${r.getAs[Long]("id_b")}) " +
          "shares no winnow fingerprint")
    }
  }

  test("simhash: identical docs → distance 0; unrelated docs far") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("id", "text")
      .withColumn("sig", SimHash.simhash64(col("text")))
    val sigs = df.select("id", "sig").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 10)
  }

  test("simhash pigeonhole join returns only pairs within maxDist") {
    val pairs = TextQueries.simhashNearDups(spark, sf).collect()
    pairs.foreach(r => assert(r.getAs[Integer]("hamming") <= 3))
  }

  test("simhash pigeonhole finds planted near-identical docs") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val perturbed = ((1 to 59).map(i => s"token$i") :+ "tokenX").mkString(" ")
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, perturbed), (4L, far))
      .toDF("doc_id", "text")
    val pairs = graft.dedup.SimHash
      .nearDuplicatePairs(df, "doc_id", "text", maxDist = 3, nChunks = 4)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)), s"identical docs not found: $pairs")
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L),
      s"unrelated doc matched: $pairs")
  }

  test("q219 source matrix cells are normalized and total the pair count") {
    val cells = TextQueries.sourceDupMatrix(spark, sf).collect()
    cells.foreach(r =>
      assert(r.getString(0) <= r.getString(1), s"unnormalized cell $r"))
    val totalPairs = graft.dedup.MinHash.nearDuplicatePairs(
      Tables.load(spark, sf, "documents"), "doc_id", "text",
      shingleN = 2, bands = 16, rowsPerBand = 4, threshold = 0.3).count()
    assert(cells.map(_.getLong(2)).sum == totalPairs,
      "matrix cells must partition the pair list")
  }

  test("q220 savings: survivors <= docs, kept <= total, one per component") {
    val rows = TextQueries.dedupSavings(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"survivors > docs in $r")
      assert(r.getLong(4) <= r.getLong(3), s"kept > total in $r")
    }
    // corpus-wide: survivors = unclustered docs + one per component
    val nDocs = Tables.load(spark, sf, "documents").count()
    val comp = graft.queries.TextQueries
      .neardupComponents(spark, sf).select("component").distinct().count()
    val clustered = graft.queries.TextQueries
      .neardupComponents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs - clustered + comp)
  }

  test("q221 incremental probe: dup subset of batch, pairs cross-only") {
    val r = TextQueries.incrementalDedupProbe(spark, sf).head()
    val (nNew, nDup, nPairs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nNew > 0 && nDup <= nNew)
    assert(nPairs >= nDup, "each dup doc needs at least one cross pair")
  }

  test("q222 chunking: overlap inflates tokens, bounded by window/stride") {
    val rows = TextQueries.ragChunking(spark, sf).collect()
    rows.foreach { r =>
      val of = r.getDouble(4)
      // stride 20, window 30: inflation can't exceed 30/20 = 1.5, and
      // overlap can't shrink the corpus below 1.0
      assert(of >= 1.0 && of <= 1.5, s"overlap factor $of out of bounds")
      assert(r.getLong(2) >= r.getLong(1), "fewer chunks than docs")
    }
  }

  test("q247 CDC chunking re-synchronizes after an insertion; " +
    "fixed-width chunking loses every boundary") {
    val base = docs.select(col("doc_id"), col("source"), col("text"))
    // a 3-token prefix insertion — the edit fixed-width chunking can't absorb
    val perturbed = base.withColumn("text",
      concat(lit("zzz0 zzz1 zzz2 "), col("text")))
    val orig = TextQueries.cdcChunkStream(base)
    val pert = TextQueries.cdcChunkStream(perturbed)
    val cdcShared = pert
      .join(orig, Seq("doc_id", "h"), "left_semi").count().toDouble /
      pert.count()
    // CDC boundaries depend only on window CONTENT: cuts inside the
    // original text land at the same content positions, so everything
    // past the first chunk dedups against the unperturbed original
    assert(cdcShared >= 0.5, s"CDC shared-chunk fraction $cdcShared < 0.5")
    // fixed-width 8-token chunks: the 3-token shift moves every
    // boundary, so (near-)zero chunks survive the insertion
    def fixedChunks(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws), 8), " +
          "i -> md5(concat_ws(' ', slice(ws, i, 8))))")).as("h"))
    val fOrig = fixedChunks(base)
    val fPert = fixedChunks(perturbed)
    val fixedShared = fPert
      .join(fOrig, Seq("doc_id", "h"), "left_semi").count().toDouble /
      fPert.count()
    assert(fixedShared < cdcShared / 2,
      s"fixed-width shared $fixedShared not clearly worse than CDC $cdcShared")
  }

  test("q223 weighted sample: exactly 200 kept, size-biased") {
    val rows = graft.queries.PipelineQueries
      .weightedSample(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == 200L)
    val keptMean = rows.map(_.getLong(2)).sum.toDouble / 200.0
    val corpusMean = Tables.load(spark, sf, "documents")
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    assert(keptMean > corpusMean,
      s"size-biased sample should favor long docs: $keptMean <= $corpusMean")
  }
}
