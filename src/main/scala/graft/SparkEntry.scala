package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator pack's named queries and their DuckDB
  * oracle SQL. Query names are stable API: `q<nn>_<slug>`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-per-nation: scan → shuffle agg → broadcast join → sort, the
    * whole execution spine (SURVEY.md §7 step 1). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RefQueries.revenueByNation(spark, "/root/testdata/sf0.001")

  private val queryPacks: Seq[(Map[String, (SparkSession, String) => DataFrame],
                               Map[String, String])] = Seq(
    (graft.queries.RefQueries.all, graft.queries.RefQueries.oracles),
    (graft.queries.JoinQueries.all, graft.queries.JoinQueries.oracles),
    (graft.queries.WindowQueries.all, graft.queries.WindowQueries.oracles),
    (graft.queries.EventQueries.all, graft.queries.EventQueries.oracles),
    (graft.queries.ExtAggQueries.all, graft.queries.ExtAggQueries.oracles),
    (graft.queries.MiscQueries.all, graft.queries.MiscQueries.oracles),
    (graft.queries.MultimodalQueries.all, graft.queries.MultimodalQueries.oracles),
    (graft.queries.ClvQueries.all, graft.queries.ClvQueries.oracles),
    (graft.queries.TextQueries.all, graft.queries.TextQueries.oracles),
    (graft.queries.VectorQueries.all, graft.queries.VectorQueries.oracles),
    (graft.queries.LakeQueries.all, graft.queries.LakeQueries.oracles),
    (graft.queries.SqlQueries.all, graft.queries.SqlQueries.oracles),
    (graft.queries.PipelineQueries.all, graft.queries.PipelineQueries.oracles)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryPacks.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    queryPacks.map(_._2).reduce(_ ++ _)
}
