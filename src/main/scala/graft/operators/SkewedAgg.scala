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
  * still earns its keep. The salt is `pmod(hash(entire row), salts)` —
  * deterministic per row content, no rand() (rand would break retry
  * idempotency and oracle determinism).
  */
object SkewedAgg {

  /** `groupBy(key).agg(sum(valueCol))` with an intermediate salted stage.
    *
    * @param salts number of sub-keys per key (≈ max skew factor to flatten)
    */
  def saltedSum(df: DataFrame, key: String, valueCol: Column,
                resultName: String, salts: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(hash(struct(df.columns.map(col): _*)),
        lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
    salted
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(resultName))
  }
}
