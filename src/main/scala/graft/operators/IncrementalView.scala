package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate materialized view from a CDC
  * feed ([[graft.sources.LakeTable.changes]]): instead of recomputing
  * `SELECT keys, count(*), sum(x)… GROUP BY keys` over the whole table on
  * every refresh, fold the change feed's signed deltas into the previous
  * view state. COUNT and SUM are self-maintainable — inserts and update
  * postimages contribute +1/+x, deletes and update preimages −1/−x — so
  * a refresh costs O(churn), not O(table): at 100 TB a day's churn is
  * typically orders of magnitude smaller than the table, and both the
  * delta aggregation and the outer-join merge shuffle only |keys-touched|
  * rows.
  *
  * Sums run in exact DECIMAL(18,2): delta refresh re-orders the
  * additions (and introduces subtraction), which double arithmetic does
  * NOT commute over — decimal does, so an incrementally-maintained view
  * is bit-identical to a from-scratch recompute, refresh order be damned.
  */
object IncrementalView {

  /** Aggregate `table` into the view shape: one row per `groupCols` with
    * `n` (count) and one exact decimal sum per (outName → sourceCol). */
  def initial(table: DataFrame, groupCols: Seq[String],
              sums: Seq[(String, String)]): DataFrame =
    table.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map { case (out, src) =>
          sum(col(src).cast("decimal(18,2)")).as(out)
        }: _*)

  /** Fold one CDC batch (rows tagged `_change_type`) into `view`.
    * Groups whose count reaches zero drop out, so the refreshed view is
    * exactly `initial(newSnapshot, …)`. */
  def applyChanges(view: DataFrame, changes: DataFrame,
                   groupCols: Seq[String],
                   sums: Seq[(String, String)]): DataFrame = {
    val sign: Column =
      when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
        .otherwise(lit(-1L))
    val delta = changes.withColumn("_sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_sign")).as("d_n"),
        sums.map { case (out, src) =>
          sum((col(src).cast("decimal(18,2)") * col("_sign"))
            .cast("decimal(18,2)")).as(s"d_$out")
        }: _*)
    view.join(delta, groupCols, "full_outer")
      .select(
        groupCols.map(col) ++
          Seq((coalesce(col("n"), lit(0L)) +
            coalesce(col("d_n"), lit(0L))).as("n")) ++
          sums.map { case (out, _) =>
            (coalesce(col(out), lit(0).cast("decimal(18,2)")) +
              coalesce(col(s"d_$out"), lit(0).cast("decimal(18,2)")))
              .cast("decimal(18,2)").as(out)
          }: _*)
      .filter(col("n") > 0)
  }
}
