package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed interval (range) containment join.
  *
  * A naive `left.join(right, ts >= start && ts < end)` has no equi-key,
  * so Spark plans a broadcast-nested-loop join — O(|L|·|R|) comparisons
  * and a broadcast requirement that breaks at cluster scale. Bucketing
  * both sides by a time bin turns it into a shuffle *equi*-join on the
  * bin: each left row lands in exactly one bin; each right interval is
  // exploded into the bins it overlaps; the exact range predicate then
  * filters within the (tiny) bin-collision groups.
  *
  * Scale design (100 TB): shuffle volume is |L| + |R|·(avg interval
  * width / bin width) — linear, never quadratic. Pick `binSeconds` near
  * the typical interval length so intervals explode into O(1) bins.
  * Skewed bins (everything in one hour) are split further by AQE.
  */
object RangeJoin {

  /** Join `left` rows whose `leftTs` timestamp falls in
    * `[right.startCol, right.endCol)`. Column names must be disjoint
    * across the two sides. A left row matching k intervals appears k
    * times (standard join semantics); rows matching none are dropped
    * (inner join).
    *
    * @param binSeconds bucket width — must be > 0; intervals spanning
    *                   many bins multiply the right side's row count
    */
  def binnedContainment(
      left: DataFrame, leftTs: String,
      right: DataFrame, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(!left.columns.contains("_rj_bin") &&
        !right.columns.contains("_rj_bin"),
      "inputs must not contain the reserved column name _rj_bin")
    val w = lit(binSeconds)
    val lb = left.withColumn("_rj_bin",
      floor(unix_timestamp(col(leftTs)) / w))
    // inclusive end bin: one extra bin when `end` sits exactly on a
    // boundary — harmless, the exact predicate filters it
    val rb = right.withColumn("_rj_bin",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / w),
        floor(unix_timestamp(col(endCol)) / w))))
    lb.join(rb,
        lb("_rj_bin") === rb("_rj_bin") &&
        col(leftTs) >= col(startCol) && col(leftTs) < col(endCol))
      .drop(lb("_rj_bin")).drop(rb("_rj_bin"))
  }
}
