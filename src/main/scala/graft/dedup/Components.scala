package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation — the dedup
  * CLUSTERING step a training-data pipeline runs on top of a near-dup
  * pair list (q55's output): each component is one group of mutual
  * near-duplicates, its minimum doc id the canonical representative to
  * keep.
  *
  * Algorithm: every node starts labeled with its own id; each round
  * joins labels onto the (undirected) edge list and takes the min label
  * reachable in one hop; converged when the (monotonically decreasing,
  * integral) label sum stops changing. Pure DataFrame joins/aggregations
  * — per round one shuffle of the edge list by src plus one by dst-group
  * — so the same code distributes at cluster scale; rounds needed =
  * graph diameter (near-dup components are near-cliques, so 2–3 in
  * practice). For adversarially deep graphs at 100 TB, checkpoint every
  * few rounds to truncate lineage and switch to the large-star/small-star
  * contraction (O(log d) rounds); the corpus here converges before
  * lineage depth matters.
  */
object Components {

  /** @param pairs undirected edge list, one row per pair
    * @return (id, lbl) — every node appearing in `pairs`, labeled with
    *         the minimum id of its component */
  def connectedComponents(pairs: DataFrame, aCol: String,
                          bCol: String): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (labels.head(1).isEmpty) {
      edges.unpersist()
      return labels // empty, correctly-schemed
    }

    var prevSum = labels.agg(sum(col("lbl"))).head.getLong(0)
    var converged = false
    while (!converged) {
      val prop = edges
        .join(labels.select(col("id").as("src"), col("lbl").as("slbl")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("slbl")).as("plbl"))
      // lineage MUST be truncated every round: `labels` feeds the plan
      // twice (propagation join + keep-old fallback), so without a
      // checkpoint the logical plan doubles per round — 2^rounds nodes —
      // and plan stringification alone OOMs on deep graphs. Local
      // checkpoint is the iterative-algorithm idiom (cluster runs with
      // an unreliable-executor profile would use reliable checkpointing).
      val next = labels.join(prop, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val s = next.agg(sum(col("lbl"))).head.getLong(0)
      converged = s == prevSum
      prevSum = s
      labels.unpersist()
      labels = next
    }
    edges.unpersist()
    labels
  }
}
