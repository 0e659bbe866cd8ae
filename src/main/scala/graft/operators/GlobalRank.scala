package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed global row numbering — `row_number() OVER (ORDER BY k)`
  * without the single-partition window.
  *
  * A plain `Window.orderBy(k)` funnels the whole dataset through ONE
  * task (Spark emits a warning for exactly this); at 100 TB that is not
  * slow, it is impossible. The scalable shape is the classic two-pass
  * enumeration:
  *
  *   1. `repartitionByRange(k)` — sampled range boundaries put every row
  *      in a partition whose key interval is globally ordered;
  *      `sortWithinPartitions(k)` orders rows inside each interval, so
  *      the partition-major traversal IS the total order by `k`.
  *   2. `zipWithIndex` — one lightweight count job over the partitions
  *      computes per-partition offsets (a prefix sum of partition sizes,
  *      driver-side over numPartitions longs, not rows), then a map
  *      stamps offset+i per row. No row ever moves again.
  *
  * The result is identical to `row_number()` for a total (tie-free)
  * ordering key regardless of how the sampled boundaries fall, because
  * range partitions are themselves ordered. Callers must pass a
  * duplicate-free key (e.g. `md5(unique_id)`): with ties the assignment
  * within the tie is partition-placement-dependent, same as the
  * nondeterminism of `row_number` over a non-total order.
  *
  * This is the one place the RDD API earns its keep: the per-partition
  * offset arithmetic of `zipWithIndex` has no Catalyst equivalent (
  * `monotonically_increasing_id` is non-contiguous by design, q25).
  */
object GlobalRank {

  /** Append `rankCol` = 1-based dense global position of each row under
    * `ORDER BY orderCol` (which must be a total order — no duplicates). */
  def withGlobalRank(df: DataFrame, orderCol: String,
                     rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val parted = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val schema = StructType(parted.schema.fields)
      .add(rankCol, LongType, nullable = false)
    val ranked = parted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
