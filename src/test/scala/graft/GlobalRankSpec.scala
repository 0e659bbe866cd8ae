package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.functions._

/** [[graft.operators.GlobalRank]] — the distributed two-pass
  * row-number. The law: for a duplicate-free key, withGlobalRank equals
  * `row_number() OVER (ORDER BY key)` regardless of input partitioning.
  */
class GlobalRankSpec extends SparkSpec {

  test("ranks are contiguous 1..n in key order, any input partitioning") {
    import spark.implicits._
    for (parts <- Seq(1, 3, 16)) {
      val df = (1 to 500).map(i => (i.toLong, s"k${501 - i}%05d"))
        .toDF("id", "k").repartition(parts)
      val ranked = GlobalRank.withGlobalRank(df, "k", "rank")
        .select("k", "rank").collect()
      assert(ranked.length == 500)
      val byRank = ranked.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to 500L),
        s"ranks not contiguous at parts=$parts")
      val keysInRankOrder = byRank.map(_.getString(0)).toSeq
      assert(keysInRankOrder == keysInRankOrder.sorted,
        s"rank order disagrees with key order at parts=$parts")
    }
  }

  test("matches a single-partition row_number window on md5 keys") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("k"))
    val ours = GlobalRank.withGlobalRank(docs, "k", "rank")
      .select(col("doc_id"), col("rank"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
    val theirs = docs.select(col("doc_id"),
      row_number().over(w).cast("long").as("rank"))
    assert(ours.except(theirs).isEmpty && theirs.except(ours).isEmpty)
  }

  test("q228 mixture: fractions sum to ~1, sqrt damping flattens shares") {
    val rows = graft.queries.PipelineQueries.mixtureWeights(spark, sf)
      .collect()
    val fracSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(fracSum - 1.0) < 1e-4, s"weight fractions sum $fracSum")
    assert(rows.map(_.getLong(3)).sum <= 100000L, "allocs exceed budget")
    // sqrt damping: the weight ratio between the largest and smallest
    // source must be milder than the raw token ratio
    val (maxT, minT) = (rows.map(_.getLong(1)).max, rows.map(_.getLong(1)).min)
    val (maxW, minW) = (rows.map(_.getDouble(2)).max, rows.map(_.getDouble(2)).min)
    assert(maxW / minW < maxT.toDouble / minT + 1e-9)
  }

  test("q229 balanced eval keeps exactly 20 per label") {
    val rows = graft.queries.PipelineQueries.balancedEvalSet(spark, sf)
      .collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(1) == 20L))
  }

  test("q227 drift: KS in [0,1], md5 halves of one corpus show no drift") {
    val r = graft.queries.PipelineQueries.distributionDrift(spark, sf).head()
    val ks = r.getDouble(2)
    assert(ks >= 0.0 && ks <= 1.0, s"KS $ks out of range")
    assert(!r.getBoolean(3), "md5 halves of one corpus must not drift")
    assert(r.getLong(0) + r.getLong(1) ==
      Tables.load(spark, sf, "documents").count())
  }

  test("q224 novelty: batch 0 is all-novel, fractions in (0,1], decaying") {
    val rows = graft.queries.PipelineQueries.batchNovelty(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    assert(rows.head.getDouble(3) == 1.0, "batch 0 must be fully novel")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"novel > total in $r")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    // a shuffled order keeps contributing: the LAST batch still has
    // some novelty (a sorted-by-duplicate order would hit ~0)
    assert(rows.last.getDouble(3) > 0.1)
  }

  test("q218 batches are full except the ragged last") {
    val rows = graft.queries.PipelineQueries
      .shuffleBatches(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum // n_batches summed
    assert(total >= 1)
    // every histogram row's max batch size is <= 64
    assert(rows.forall(_.getLong(3) <= 64L))
  }

  test("q215 DSIR: top docs skew toward the target language") {
    val top = graft.queries.PipelineQueries.dsirWeights(spark, sf)
      .join(Tables.load(spark, sf, "documents"), "doc_id")
      .select("lang").collect().map(_.getString(0))
    // the scorer upweights en-like unigrams; the top-15 should be
    // majority-en (the target slice is ~40% of the corpus)
    assert(top.count(_ == "en") > top.length / 2,
      s"expected en-majority top-15, got ${top.mkString(",")}")
  }

  test("q216 buckets partition the scored corpus into near-equal terciles") {
    val rows = graft.queries.TextQueries.pplBuckets(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val ns = rows.map(_.getLong(1))
    assert(ns.max - ns.min <= 1, s"ntile imbalance: ${ns.mkString(",")}")
    // head bucket (1) must score no worse than tail bucket (3)
    val best = rows.map(r => r.getDouble(3))
    assert(best.head >= best.last)
  }

  test("q217 outlier counts are ~5% per label and never exceed 50%") {
    val rows = graft.queries.VectorQueries.embedOutliers(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (n, out) = (r.getLong(1), r.getLong(2))
      assert(out >= 0 && out * 2 <= n, s"label ${r.getLong(0)}: $out of $n")
    }
  }
}
