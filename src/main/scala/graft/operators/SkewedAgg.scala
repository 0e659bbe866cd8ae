package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation for skewed grouping keys.
  *
  * A single hot key (the classic power-law user/url/token) turns a plain
  * `groupBy(key)` into one straggler task at cluster scale. Salting
  * splits each key into `salts` sub-keys for the first (heavy) partial
  * aggregation, then combines the partials in a second, tiny shuffle on
  * the bare key. Works for any algebraic aggregate (sum/count/min/max —
  * anything with an associative combine).
  *
  * AQE's skew handling covers *join* skew automatically; aggregation
  * skew with a hash-agg that can't split a key is where explicit salting
  * still earns its keep. The salt hashes a per-row ordinal
  * (monotonically_increasing_id) — hashing row *content* would send
  * identical rows (the classic hot key: millions of identical
  * (url, 1) pairs) to a single salt bucket and flatten nothing. The
  * ordinal is partitioning-dependent, but only the salt assignment is;
  * the second-stage re-aggregation makes the final result invariant, and
  * a task retry re-executes with the same partition's ordinals.
  */
object SkewedAgg {

  /** `groupBy(key).agg(sum(valueCol))` with an intermediate salted stage.
    *
    * @param salts number of sub-keys per key (≈ max skew factor to flatten)
    */
  def saltedSum(df: DataFrame, key: String, valueCol: Column,
                resultName: String, salts: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(hash(monotonically_increasing_id()),
        lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
    salted
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(resultName))
  }
}
