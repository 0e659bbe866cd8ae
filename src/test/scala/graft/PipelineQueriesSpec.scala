package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Invariants for the training-data curation pack (q123-q129); the
  * value-level checks run under the DuckDB oracle. */
class PipelineQueriesSpec extends SparkSpec {

  test("q123 hash split partitions the corpus (counts sum, ratios sane)") {
    val out = PipelineQueries.hashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.load(spark, sf, "documents").count()
    assert(out.values.sum == total, "every doc lands in exactly one split")
    assert(out.getOrElse("train", 0L) > out.getOrElse("valid", 0L),
      "80% bucket must dominate 10% bucket")
  }

  test("q123 split assignment is stable across recomputation") {
    val a = PipelineQueries.hashSplit(spark, sf).collect().toSeq
    val b = PipelineQueries.hashSplit(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("q124 mixture keeps a per-source subset, never more than the source") {
    PipelineQueries.sourceMixture(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"kept > population for ${r.getString(0)}")
    }
  }

  test("q125 repetition removal: n_after <= n_before, idempotent word sets") {
    val rows = PipelineQueries.dedupRepetition(spark, sf)
    val bad = rows.filter(col("n_after") > col("n_before")).count()
    assert(bad == 0)
    // spot-check one doc end-to-end against a driver-side reference
    val doc = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .head()
    val words = doc.getString(1).trim.split("\\s+")
    val expected = words.distinct.mkString(" ")
    val got = rows.filter(col("doc_id") === doc.getLong(0))
      .select(col("clean_md5")).head().getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == md, "cleaned text must equal first-occurrence order dedup")
  }

  test("q126 components: every member pair reachable, labels are min ids") {
    val out = PipelineQueries.embedNeardupComponents(spark, sf).collect()
    val byComp = out.groupBy(_.getLong(1))
    byComp.foreach { case (lbl, members) =>
      assert(members.map(_.getLong(0)).min == lbl,
        "component label must be the minimum member id")
      assert(members.forall(_.getLong(2) == members.length))
    }
  }

  test("q127 contamination: eval docs never appear; fracs in (0,1]") {
    PipelineQueries.contamination(spark, sf).collect().foreach { r =>
      assert(r.getLong(0) % 97 != 0, "eval docs are excluded from output")
      val frac = r.getDouble(3)
      assert(frac > 0.0 && frac <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("q128 packing gates all hold at test SF") {
    val rows = PipelineQueries.packSequences(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"overflowed bin for ${r.getString(0)}")
      assert(r.getBoolean(4), s"bins below LP lower bound for ${r.getString(0)}")
      assert(r.getBoolean(5), s"bins above first-fit bound for ${r.getString(0)}")
    }
  }

  test("q129 stratified sample within 4-sigma for every stratum") {
    val rows = PipelineQueries.stratifiedSample(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("en", "de", "es", "fr", "zh"))
    rows.foreach(r => assert(r.getBoolean(3),
      s"stratum ${r.getString(0)} outside tolerance"))
  }
}
