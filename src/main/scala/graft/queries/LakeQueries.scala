package graft.queries

import graft.sources.LakeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Table-format surface as an oracle-checked query: drive the
  * versioned LakeTable through create → append → DELETE WHERE → MERGE
  * and read every version back via time travel. Each version's row
  * count is derivable from the source `orders` table with plain SQL, so
  * the DuckDB oracle checks the whole copy-on-write commit chain —
  * snapshot isolation, three-valued DELETE semantics, upsert-as-insert —
  * by value, not just "it ran".
  */
object LakeQueries {

  /** Version ordinal → row count across the four-commit history. The
    * table lives in a per-run temp dir; counts are materialized before
    * cleanup so the returned frame owns its data. */
  def lakeVersionCounts(s: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.load(s, dir, "orders")
    val counts = graft.util.Tmp.withTempDir("graft_lake_q91") { rootPath =>
      val root = rootPath.toString
      // v1: snapshot of pre-2000 orders
      LakeTable.create(s, root,
        orders.filter(to_date(col("o_orderdate")) < lit("2000-01-01")))
      // v2: append the rest — full table
      LakeTable.append(s, root,
        orders.filter(to_date(col("o_orderdate")) >= lit("2000-01-01")))
      // v3: DELETE WHERE status = 'F' (TRUE-only removal)
      LakeTable.deleteWhere(s, root, col("o_orderstatus") === "F")
      // v4: MERGE of rows with shifted keys — pure inserts (no real
      // o_orderkey reaches 10⁹ at any test SF)
      LakeTable.merge(s, root,
        orders.filter(col("o_custkey") % 97 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L)),
        "o_orderkey")
      LakeTable.versions(s, root).sorted.zipWithIndex.map {
        case (v, i) =>
          ((i + 1).toLong, LakeTable.read(s, root, Some(v)).count())
      }
    }
    import s.implicits._
    counts.toDF("version_ord", "n_rows").orderBy(col("version_ord"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_lake_versions" -> (lakeVersionCounts _)
  )

  val oracles: Map[String, String] = Map(
    // the four version counts, each restated from the source table
    "q91_lake_versions" ->
      """SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS version_ord,
        |         (SELECT count(*) FROM orders
        |          WHERE o_orderdate < '2000-01-01') AS n_rows
        |  UNION ALL SELECT 2, (SELECT count(*) FROM orders)
        |  UNION ALL SELECT 3, (SELECT count(*) FROM orders
        |                       WHERE o_orderstatus <> 'F')
        |  UNION ALL SELECT 4, (SELECT count(*) FROM orders
        |                       WHERE o_orderstatus <> 'F')
        |                    + (SELECT count(*) FROM orders
        |                       WHERE o_custkey % 97 = 0)
        |) t ORDER BY version_ord""".stripMargin
  )
}
