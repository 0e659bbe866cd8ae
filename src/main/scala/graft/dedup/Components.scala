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
  import graft.util.LocalFrame.unpersistCheckpoint

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
      labels.unpersist()          // round 1: the persist()ed seed frame
      unpersistCheckpoint(labels) // later rounds: the checkpointed frame
      labels = next
    }
    edges.unpersist()
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the 100 TB path for graphs whose diameter is
    * NOT tiny: min-label propagation ([[connectedComponents]]) needs
    * diameter-many rounds (a 1M-link chain = 1M shuffles), while star
    * contraction converges in O(log²) rounds regardless of shape.
    *
    * Each round is two window-min passes over the edge list:
    *  - large-star: per node u, connect every strictly-larger neighbor
    *    to m(u) = min(Γ(u) ∪ {u});
    *  - small-star: orient edges large→small, then per node u connect
    *    its smaller neighbors AND u itself to their minimum.
    * Both preserve connectivity and strictly shrink the potential; the
    * fixpoint is a star forest rooted at each component's minimum id.
    * One shuffle per pass (window partition by u), lineage truncated
    * every round — identical distributed shape at cluster scale.
    *
    * Returns the same (id, lbl) frame as [[connectedComponents]]; the
    * two are asserted equivalent in ComponentsSpec, and q138 pins this
    * implementation to the exact-Jaccard recursive-CTE oracle. */
  def connectedComponentsStar(pairs: DataFrame, aCol: String,
                              bCol: String): DataFrame =
    starContraction(pairs, aCol, bCol)._1

  /** @return (labels, rounds) — rounds exposed for the O(log d)
    *         convergence assertion in ComponentsSpec */
  private[graft] def starContraction(pairs: DataFrame, aCol: String,
                                     bCol: String): (DataFrame, Int) = {
    import org.apache.spark.sql.expressions.Window

    val spark = pairs.sparkSession
    // canonical big→small orientation; self-loops dropped
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

    val allNodes = edges.select(col("u").as("id"))
      .union(edges.select(col("v").as("id")))
      .distinct()
      .localCheckpoint(true)

    def stable(a: DataFrame, b: DataFrame): Boolean =
      // exact set equality: counts first (cheap), then an anti-join.
      // Both sides are distinct canonical sets and already checkpointed,
      // so the except is one small shuffle — and unlike a hash
      // signature it cannot collide into a silent early exit with
      // wrong labels.
      a.count() == b.count() && b.except(a).head(1).isEmpty

    var rounds = 0
    var converged = edges.head(1).isEmpty
    while (!converged) {
      rounds += 1
      // large-star: neighbors in both directions; connect v > u to
      // m(u) = min(Γ(u) ∪ {u}). Emitted edges already satisfy v > m.
      val nbrs = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val wU = Window.partitionBy(col("u"))
      val large = nbrs
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)

      // small-star on the (already big→small) orientation: per u,
      // m = min smaller-neighbor; attach the other small neighbors and
      // u itself to m.
      val withMin = large
        .withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
      val next = withMin.filter(col("v") =!= col("m"))
        .select(greatest(col("v"), col("m")).as("u"),
          least(col("v"), col("m")).as("v"))
        .union(withMin.select(col("u"), col("m").as("v")).distinct())
        .distinct()
        .localCheckpoint(true)

      converged = stable(edges, next)
      // `next` is materialized (eager checkpoint) and the convergence
      // check has consumed the old round — free its blocks now rather
      // than letting O(rounds) dead edge lists pile up in storage
      unpersistCheckpoint(large)
      unpersistCheckpoint(edges)
      edges = next
    }

    // fixpoint is a star forest: (child, root) edges; roots label
    // themselves, and any node of the original graph absent from the
    // final edge list (fully contracted into its root) keeps its root
    // via the left join's child entry — at the fixpoint every non-root
    // appears as exactly one child.
    val labels = allNodes
      .join(edges.select(col("u").as("id"), col("v").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("lbl"))
    (labels, rounds)
  }
}
