package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Damped power iteration (PageRank, Page & Brin 1998) over an edge
  * DataFrame, in scaled-BIGINT integer arithmetic so the result is
  * bit-identical under any partitioning — and exactly replayable by an
  * oracle's unrolled SQL rounds (float ranks would drift with partial-
  * aggregation order).
  *
  * Per iteration: one equi-join of the (persisted, out-weight-
  * annotated) edge table with the current ranks on `src`, one hash
  * aggregate on `dst` — O(|E|) shuffle per round. The rank frame is
  * partitioned by node and never leaves the cluster; driver state is
  * the loop counter and the node-count scalar. Each round's ranks are
  * persisted and the previous round's cache dropped only after the
  * next materializes (lineage stays one round deep). Rank mass is
  * conserved up to integer-floor loss plus leakage at dangling nodes
  * (no out-edges) — the documented simple-variant semantics.
  */
object PageRankIter {

  val Scale = 1000000000000L
  val DampNum = 85L // damping 0.85 as an exact 85/100 rational

  /** Ranks plus a `release` that drops the caches the run still holds
    * (call after materializing whatever derives from `ranks`). */
  final case class Ranked(ranks: DataFrame, release: () => Unit)

  /** `nodes`: one column `v` (the complete node set — isolated nodes
    * keep the base rank). `edges`: `src`, `dst`, `w` positive longs;
    * (src, dst) must be distinct rows. Returns (v, r) after `iters`
    * rounds, r = ×10¹² scaled BIGINT. The per-edge contribution
    * product r·w runs through DECIMAL(38,0), so `w` may be any
    * positive long; the remaining BIGINT products (damping × csum,
    * csum itself) are bounded by Scale·|V| ≈ 10¹²·|V| — safe below
    * ~9.2e6 nodes, the documented contract. */
  def run(s: SparkSession, nodes: DataFrame, edges: DataFrame,
          iters: Int): Ranked = {
    val ew = edges
      .join(edges.groupBy(col("src")).agg(sum(col("w")).as("wout")),
        Seq("src"))
      .persist()
    val n = nodes.count()
    val base = Scale * (100 - DampNum) / (100 * n)
    var ranks = nodes.withColumn("r", lit(Scale / n)).persist()
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"),
          // r·w rides DECIMAL(38,0): ranks scale at 10¹², so a BIGINT
          // product overflows once any edge weight passes ~9.2e6
          // (plausible for q253's nation-pair line counts and q257's
          // co-occurrence counts at large SF); `div` lands back on
          // BIGINT and the oracles' unrolled rounds ride HUGEINT, so
          // both engines stay bit-identical at every scale
          expr("CAST(r AS DECIMAL(38,0)) * w div wout").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("csum"))
      val next = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"), (lit(base) +
          expr(s"($DampNum * coalesce(csum, 0L)) div 100")).as("r"))
        .persist()
      next.count() // materialize before dropping the round it reads
      prev.foreach(_.unpersist())
      prev = Some(ranks)
      ranks = next
    }
    val last = ranks
    val toDrop = prev
    Ranked(last, () => { toDrop.foreach(_.unpersist()); last.unpersist(); ew.unpersist() })
  }
}
