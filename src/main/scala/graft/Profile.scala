package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main: times sub-steps of the slowest bench queries so
  * optimization targets measurements, not guesses. Not part of the
  * driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()

    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    sys.env.get("SPARK_GRAFT_PROFILE_QUERY").foreach { name =>
      val df = t(name)(
        { val d = SparkEntry.queries(name)(spark, sfDir); d.count(); d })
      val shown = sys.env.get("SPARK_GRAFT_PROFILE_FILTER")
        .map(df.filter).getOrElse(df)
      println(s"rows=${shown.count()}")
      shown.show(50, truncate = false)
      spark.stop(); sys.exit(0)
    }

    if (sys.env.contains("SPARK_GRAFT_PROFILE_Q42")) {
      println("== q42 variants ==")
      val ev = Tables.load(spark, sfDir, "events")
      t("warm scan")(ev.count())
      def agg(d: org.apache.spark.sql.DataFrame) = d
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .count()
      t("get_json_object")(agg(ev.withColumn("k",
        get_json_object(col("props"), "$.k").cast("long"))))
      t("get_json_object again")(agg(ev.withColumn("k",
        get_json_object(col("props"), "$.k").cast("long"))))
      t("from_json struct")(agg(ev.withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("k BIGINT"))("k"))))
      t("from_json struct again")(agg(ev.withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("k BIGINT"))("k"))))
      t("json_tuple")(agg(ev.select(col("event_type"),
        json_tuple(col("props"), "k").as("ks")).withColumn("k",
        col("ks").cast("long"))))
      spark.stop(); sys.exit(0)
    }

    if (sys.env.contains("SPARK_GRAFT_PROFILE_Q43")) {
      println("== q43 variants ==")
      val ev = Tables.load(spark, sfDir, "events")
      t("warm scan")(ev.count())
      t("q43 as-is")(SparkEntry.queries("q43_props_map_stats")(spark, sfDir).count())
      t("q43 again")(SparkEntry.queries("q43_props_map_stats")(spark, sfDir).count())
      val mapTy = org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")
      t("from_json+map_entries")(
        ev.select(explode(map_entries(from_json(col("props"), mapTy))).as("e"))
          .groupBy(col("e.key")).agg(count(lit(1)), sum(col("e.value"))).count())
      t("from_json no explode")(
        ev.select(from_json(col("props"), mapTy).as("m"))
          .select(element_at(col("m"), "k").as("v"))
          .agg(count(lit(1)), sum(col("v"))).count())
      t("explode only no groupBy")(
        ev.select(explode(from_json(col("props"), mapTy)).as(Seq("key", "v")))
          .count())
      spark.stop(); sys.exit(0)
    }

    import graft.clv._
    println("== q83 components ==")
    val rfm = ClvPipeline.rfm(spark, sfDir, nGroups = 1)
    t("rfm count")(rfm.count())
    val local = t("rfm collect 4000")(
      rfm.orderBy(col("custkey")).limit(4000).collect().toIndexedSeq.sortBy(_.custkey))
    val bg = t("BetaGeo fit 4000")(
      BetaGeoModel.fit(local.map(r => (r.frequency, r.recency, r.t_weeks))))
    val repeat = local.filter(r => r.frequency > 1 && r.avg_monetary > 0)
    val gg = t("GammaGamma fit")(
      GammaGammaModel.fit(repeat.map(r => (r.frequency, r.avg_monetary))))
    t("scoreAll count")(ClvColumns.scoreAll(rfm.toDF(), bg, gg).count())

    println("== q80 components ==")
    t("ClvPipeline.run count")(ClvPipeline.run(spark, sfDir, 20).count())

    println("== q55 components ==")
    val docs = Tables.load(spark, sfDir, "documents")
    t("signatureDataset k=64 count")(
      graft.dedup.MinHash.signatureDataset(docs, "doc_id", "text", 2, 64).count())
    locally {
      val prepared = graft.dedup.MinHash.signatureDataset(docs, "doc_id", "text", 2, 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("  prepared materialize")(prepared.count())
      val entries = prepared.select(
        col("id"),
        explode(transform(sequence(lit(0), lit(15)), b =>
          struct(b.as("band"),
            xxhash64(slice(col("sig"), b * 4 + 1, lit(4))).as("bucket"))))
          .as("bb"))
        .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      t("  entries count")(entries.count())
      val a = entries.alias("a"); val b = entries.alias("b")
      val candidates = a.join(b,
          col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      t("  candidates count")(candidates.count())
      val shingles = prepared.select(col("id"), col("sh"))
      val verified = candidates
        .join(shingles.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(shingles.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jaccard", graft.dedup.MinHash.exactJaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.3)
      t("  verify count")(verified.count())
      prepared.unpersist()
    }
    t("nearDuplicatePairs full")(
      graft.dedup.MinHash.nearDuplicatePairs(docs, "doc_id", "text",
        2, 16, 4, 0.3).count())

    println("== q58 components ==")
    t("signatureDataset k=1 (shingle sets)")(
      graft.dedup.MinHash.signatureDataset(docs, "doc_id", "text", 1, 1).count())
    t("jaccardTopPairs full")(
      graft.dedup.MinHash.jaccardTopPairs(docs, "doc_id", "text", 1, 20).count())

    println("== q26 / q21 / q33 / q59 ==")
    t("q26_string_funcs")(SparkEntry.queries("q26_string_funcs")(spark, sfDir).count())
    t("q21_region_revenue")(SparkEntry.queries("q21_region_revenue")(spark, sfDir).count())
    t("q33_nation_revenue_rank")(SparkEntry.queries("q33_nation_revenue_rank")(spark, sfDir).count())
    t("q59_clean_pipeline")(SparkEntry.queries("q59_clean_pipeline")(spark, sfDir).count())
    spark.stop()
  }
}
