package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footers, JIT) on every query
    // shape at the smallest SF so the timed pass measures the queries,
    // not one-time janino compilation (cold codegen is ~0.5-1 s per
    // distinct plan shape — it would dominate sub-second queries).
    // A different SF directory is used so no data computed during
    // warm-up can be reused by the timed pass; the explicit clearCache
    // drops anything the queries persisted.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Only warm on the sibling sf0.001 directory (canonical-path compare
    // so a trailing slash can't alias it to the timed dir). If it's
    // absent, skip the full warm-up rather than silently running the
    // whole suite twice on the timed dataset.
    val warmDir = {
      val tgt = new java.io.File(sfDir).getCanonicalFile
      val p = new java.io.File(tgt.getParent, "sf0.001").getCanonicalFile
      if (p.isDirectory && p != tgt) Some(p.getPath) else None
    }
    // Dev-only filter: SPARK_GRAFT_ONLY=q137,q55 times just those query
    // prefixes (and warms just them). Absent in driver runs → full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (name, _) => only.forall(_.exists(name.startsWith))
    }
    warmDir.foreach { wd =>
      selected.foreach { case (_, fn) =>
        try fn(spark, wd).count() catch { case _: Throwable => () }
      }
    }
    spark.sharedState.cacheManager.clearCache()
    // Deterministic order for run-to-run comparability. Each query is
    // timed TWICE and the minimum reported: the min is the robust
    // estimator against external load spikes on a shared machine (a
    // single pass has been observed to read 1.5-2x high when an
    // unrelated process grabs the cores mid-run). The two iterations
    // run as two FULL PASSES over the suite (not back-to-back per
    // query): back-to-back min-of-2 cannot defeat a contention window
    // longer than one query — rounds 6-8 each saw a contiguous block
    // of sub-second queries read 3-7x high with unchanged code, and the
    // same block measured clean minutes later (PLANS.md, round-8
    // postmortem). With the passes ~90s apart, a spike must span the
    // WHOLE run to poison a min. Same total cost as before.
    val times = scala.collection.mutable.Map.empty[String, Double]
    (1 to 2).foreach { _ =>
      selected.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val d = (System.nanoTime() - t0) / 1e9
        // queries that persist internal frames (q55/q56/q59/q83) would
        // otherwise pin them for the rest of the run, skewing later
        // timings; the drop happens after the timed action
        spark.sharedState.cacheManager.clearCache()
        times(name) = times.get(name).fold(d)(math.min(_, d))
      }
    }
    val results = selected.map { case (name, _) => name -> times(name) }
    // The driver captures only the last ~2000 chars of output; keep the
    // JSON line well under that (short qNN keys, 3-decimal seconds) so it
    // survives the tail window intact and parses.
    def f(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // short keys must stay unique or one query's timing silently
    // shadows another in the driver's JSON parse
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    require(shortKeys.distinct.size == results.size,
      s"duplicate short bench keys: ${shortKeys.diff(shortKeys.distinct).mkString(",")}")
    val qs = results.map { case (k, v) => s"\"" + k.takeWhile(_ != '_') + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // The driver tail-captures only the last ~2000 chars of output; with
    // 200+ queries the per-query dict alone exceeds that and truncates
    // away the headline metric above. Re-emit a compact total as the LAST
    // line so the tail window always carries a parseable headline.
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size}}""")
    spark.stop()
  }
}
