package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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
                     rankCol: String): DataFrame =
    withGlobalRank(df, Seq(col(orderCol)), rankCol)

  /** Multi-column form: `orderCols` are sort expressions (`.desc`
    * allowed) that together must be a TOTAL order — end with a unique
    * tiebreak column (e.g. the key) or ranks within a tie are
    * partition-placement-dependent, exactly like `row_number` over a
    * non-total order. */
  def withGlobalRank(df: DataFrame, orderCols: Seq[Column],
                     rankCol: String): DataFrame =
    enumerate(df, orderCols, rankCol, countCol = None)

  /** As [[withGlobalRank]], but also appends `countCol` = the total row
    * count n. The count is free: the two-pass enumeration already
    * computes every partition's size for the prefix-sum of offsets, and
    * n is the last offset. Callers that need (rank, n) together — ntile
    * arithmetic, percentile cuts — get both from the single pass instead
    * of a second count scan over the input lineage. */
  def withGlobalRankAndCount(df: DataFrame, orderCols: Seq[Column],
                             rankCol: String, countCol: String): DataFrame =
    enumerate(df, orderCols, rankCol, Some(countCol))

  private def enumerate(df: DataFrame, orderCols: Seq[Column],
                        rankCol: String, countCol: Option[String]): DataFrame = {
    val spark = df.sparkSession
    // Opt-in guard for the documented precondition: with duplicate keys
    // the within-tie assignment is partition-placement-dependent. Off by
    // default (it costs an aggregate pass over the input); set
    // graft.globalRank.validate=true in tests / while developing a new
    // caller to fail fast instead of silently ranking nondeterministically.
    if (spark.conf.getOption("graft.globalRank.validate").contains("true")) {
      val Row(n: Long, d: Long) =
        try df.agg(count(lit(1)).cast(LongType),
              countDistinct(struct(orderCols: _*)).cast(LongType)).head()
        catch {
          // struct() can't wrap direction-bearing sort expressions
          // (.desc) — SortOrder is unevaluable, surfacing as an
          // AnalysisException or a codegen-time SparkException — and
          // direction can't be stripped from a public Column. Fall back
          // to full-row distinctness: weaker (key ties across differing
          // rows are missed) but sound for every caller that ends the
          // key with a unique column, which the scaladoc already
          // requires.
          case scala.util.control.NonFatal(_) =>
            df.agg(count(lit(1)).cast(LongType),
              countDistinct(struct(df.columns.map(col).toSeq: _*))
                .cast(LongType)).head()
        }
      require(n == d,
        s"GlobalRank order key is not a total order: $n rows but only $d " +
          s"distinct keys — ranks within a tie would be nondeterministic")
    }
    val parted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    var schema = StructType(parted.schema.fields)
      .add(rankCol, LongType, nullable = false)
    countCol.foreach { c => schema = schema.add(c, LongType, nullable = false) }
    val rdd = parted.rdd
    // zipWithIndex's count job, done by hand so the total survives: one
    // lightweight pass collects per-partition sizes (numPartitions longs
    // on the driver, never rows), the prefix sum gives each partition its
    // offset, and the stamping map re-reads the sorted shuffle output.
    val sizes = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = sizes.scanLeft(0L)(_ + _)
    val total = offsets.last
    val ranked = rdd.mapPartitionsWithIndex { (pi, it) =>
      var i = offsets(pi)
      it.map { r =>
        i += 1
        val base = r.toSeq :+ i
        Row.fromSeq(countCol.fold(base)(_ => base :+ total))
      }
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Exact SQL `ntile(k)` bucket from a 1-based global rank `i` over `n`
    * rows — the first `n % k` buckets hold `ceil(n/k)` rows, the rest
    * `floor(n/k)` (the ANSI larger-buckets-first rule, matched to both
    * Spark's and DuckDB's ntile). Pure arithmetic on (i, n): combined
    * with [[withGlobalRankAndCount]] it replaces a single-partition
    * `ntile(k) OVER (ORDER BY …)` window with a range-partitioned
    * two-pass enumeration plus a map-side expression. */
  def ntileFromRank(i: Column, n: Column, k: Int): Column = {
    val q = floor(n / k)
    val r = n % k
    when(i <= r * (q + lit(1)), floor((i - 1) / (q + lit(1))) + lit(1))
      .otherwise(
        r + floor((i - lit(1) - r * (q + lit(1))) / greatest(q, lit(1)))
          + lit(1))
      .cast("long")
  }
}
