package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed running (prefix) aggregate —
  * `sum(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` without the
  * single-partition window.
  *
  * A global running sum is the other operator (beside `row_number`,
  * [[GlobalRank]]) that SQL can only phrase as an un-partitioned
  * window — the shape PlanLint fails the build on, because it funnels
  * every row through one task. The scalable form is the same two-pass
  * range-exchange:
  *
  *   1. `repartitionByRange(k)` + `sortWithinPartitions(k)` — the
  *      partition-major traversal IS the total order by `k`.
  *   2. one reduce pass collapses each partition to a SINGLE long (its
  *      value total — numPartitions longs reach the driver, never
  *      rows); the exclusive prefix over those totals is each
  *      partition's offset; a second pass over the same sorted shuffle
  *      output stamps offset + local running sum.
  *
  * This is textbook parallel scan (Blelloch 1990) on top of Spark's
  * range exchange, and the second place (after GlobalRank) where the
  * RDD API earns its keep: per-partition carry arithmetic has no
  * Catalyst equivalent.
  *
  * Values ride LONGs — the scaled-integer discipline. An exact integer
  * prefix sum is partitioning-invariant because integer addition is
  * associative on every path; float partials would make the result
  * depend on where the range boundaries fall.
  *
  * REUSE CONTRACT: both passes run over the SAME materialized `.rdd`
  * of the range-partitioned frame — one lineage, one shuffle id — so
  * the range exchange's map output is written once (pass 1) and pass
  * 2's result stage reads those shuffle files (Spark skips map stages
  * whose shuffle output exists); the upstream lineage is never
  * recomputed per-pass. Calling `.rdd` twice would silently break
  * this (two shuffle ids, two upstream executions). The upstream does
  * evaluate twice WITHIN pass 1 — RangePartitioner samples it for the
  * range boundaries before the shuffle write; that cost is inherent
  * to `repartitionByRange`, not to the two-pass scan. PrefixScanSpec
  * asserts both halves: exactly one range exchange in the plan, and
  * via accumulator that upstream partition-passes stay at
  * sample + write (a per-pass recompute would add more).
  */
object PrefixScan {

  /** Append `outCol` = INCLUSIVE running sum of `valueCol` under
    * `ORDER BY orderCols`. `orderCols` must be a TOTAL order (end with
    * a unique column) — with ties the within-tie accumulation order is
    * partition-placement-dependent, exactly like a windowed running
    * sum over a non-total order. `valueCol` must cast to a non-null
    * BIGINT for every row. */
  def withRunningSum(df: DataFrame, orderCols: Seq[Column],
                     valueCol: Column, outCol: String): DataFrame =
    scan(df, orderCols, Seq(valueCol -> outCol), rankCol = None)

  /** As [[withRunningSum]], additionally stamping `rankCol` = the
    * 1-based global position under the same order — both from the ONE
    * range exchange (the per-partition reduce pass carries a row count
    * next to the value total for free). rank + a self-equi-join on
    * rank+1 is the distributed form of `lead()`/`lag()` — q262
    * composes it with the running sum for interval-union sweeps. */
  def withRunningSumAndRank(df: DataFrame, orderCols: Seq[Column],
                            valueCol: Column, outCol: String,
                            rankCol: String): DataFrame =
    scan(df, orderCols, Seq(valueCol -> outCol), Some(rankCol))

  /** N running sums from the SAME single range exchange — the
    * multi-measure form (a two-sample ECDF needs cum(a) and cum(b)
    * at every order position; two single-value scans would pay the
    * range shuffle twice and could not even guarantee the same tie
    * placement across the two orders). Per-partition reduce carries
    * one long per measure; everything else is the [[withRunningSum]]
    * contract verbatim. */
  def withRunningSums(df: DataFrame, orderCols: Seq[Column],
                      valueCols: Seq[(Column, String)]): DataFrame =
    scan(df, orderCols, valueCols, rankCol = None)

  private def scan(df: DataFrame, orderCols: Seq[Column],
                   valueCols: Seq[(Column, String)],
                   rankCol: Option[String]): DataFrame = {
    val spark = df.sparkSession
    val nv = valueCols.size
    require(nv >= 1, "at least one value column")
    val vCols = valueCols.indices.map(i => s"_ps_v$i")
    df.columns.find(_.startsWith("_ps_v")).foreach { c =>
      require(requirement = false,
        s"input must not contain reserved internal column $c " +
          "(the _ps_v prefix is PrefixScan's)")
    }
    (valueCols.map(_._2) ++ rankCol.toList).foreach { c =>
      require(!df.columns.contains(c),
        s"output column $c already exists in the input")
    }
    // appended LAST, so dropRight(nv) strips them again after stamping
    val withV = valueCols.zip(vCols).foldLeft(df) {
      case (d, ((vc, _), name)) => d.withColumn(name, vc.cast(LongType))
    }
    val parted = withV.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    var schema = StructType(df.schema.fields)
    valueCols.foreach { case (_, out) =>
      schema = schema.add(out, LongType, nullable = false) }
    rankCol.foreach { c => schema = schema.add(c, LongType, nullable = false) }
    val rdd = parted.rdd
    val vIdx = vCols.map(parted.schema.fieldIndex).toArray
    // pass 1: nv+1 longs per partition (the shuffle files written by the
    // range exchange are reused by pass 2 — the sort runs once)
    val partials = rdd
      .mapPartitionsWithIndex { (i, it) =>
        val s = new Array[Long](nv)
        var n = 0L
        it.foreach { r =>
          var j = 0
          while (j < nv) { s(j) += r.getLong(vIdx(j)); j += 1 }
          n += 1
        }
        Iterator((i, s, n))
      }
      .collect().sortBy(_._1)
    val offsets = partials.map(_._2)
      .scanLeft(new Array[Long](nv)) { (a, b) =>
        Array.tabulate(nv)(j => a(j) + b(j)) }
    val rankOffsets = partials.map(_._3).scanLeft(0L)(_ + _)
    val scanned = rdd.mapPartitionsWithIndex { (pi, it) =>
      val acc = offsets(pi).clone()
      var rk = rankOffsets(pi)
      it.map { r =>
        var j = 0
        while (j < nv) { acc(j) += r.getLong(vIdx(j)); j += 1 }
        rk += 1
        val base = r.toSeq.dropRight(nv) ++ acc
        Row.fromSeq(rankCol.fold(base)(_ => base :+ rk))
      }
    }
    spark.createDataFrame(scanned, schema)
  }
}
