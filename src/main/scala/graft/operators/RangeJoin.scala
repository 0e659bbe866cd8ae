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

  /** KEYED BAND JOIN — the telemetry-enrichment shape: match left and
    * right rows sharing an equi-key whose timestamps lie within
    * `toleranceSeconds` of each other (|lt − rt| ≤ tol, inclusive).
    * Complements [[binnedContainment]] (no key, explicit intervals) and
    * the as-of family (nearest ONE match): a band join keeps EVERY match
    * in the window.
    *
    * Same bin trick, compounded with the key: both sides bucket time
    * into bins of the tolerance width; a pair within tolerance is
    * always in the same or adjacent bins, so the LEFT side explodes
    * into its bin and both neighbors (exactly 3 rows) and the join is a
    * plain shuffle equi-join on (key, bin) with the exact |Δt| ≤ tol
    * predicate filtering inside the collision groups. Shuffle volume
    * 3|L| + |R| — linear; never the key-only join's per-key cross
    * product, never a theta join. Join keys co-partition, so AQE splits
    * skewed (key, bin) cells like any other shuffle join. */
  def keyedBand(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds > 0, "toleranceSeconds must be positive")
    require(!left.columns.contains("_rj_bin") &&
        !right.columns.contains("_rj_bin"),
      "inputs must not contain the reserved column name _rj_bin")
    val w = lit(toleranceSeconds)
    val lb = left.withColumn("_rj_bin", explode(sequence(
      floor(unix_timestamp(col(leftTs)) / w) - 1,
      floor(unix_timestamp(col(leftTs)) / w) + 1)))
    val rb = right.withColumn("_rj_bin",
      floor(unix_timestamp(col(rightTs)) / w))
    lb.join(rb,
        col(leftKey) === col(rightKey) &&
        lb("_rj_bin") === rb("_rj_bin") &&
        abs(unix_timestamp(col(leftTs)) - unix_timestamp(col(rightTs)))
          <= toleranceSeconds)
      .drop(lb("_rj_bin")).drop(rb("_rj_bin"))
  }
}
