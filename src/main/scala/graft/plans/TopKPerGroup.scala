package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-group bounded top-k as a WHOLE custom operator — the §2 extension
  * mechanism (c): a logical node, a planner [[SparkStrategy]], and a
  * physical [[SparkPlan]], registered at runtime via
  * `spark.experimental.extraStrategies`.
  *
  * Semantics: for each distinct value of `keys`, the first `k` rows of
  * the group under `ordering` (which must be a TOTAL order within a
  * group for a deterministic result — pass a tiebreak column).
  * Equivalent to `row_number() OVER (PARTITION BY keys ORDER BY
  * ordering) <= k`, but the physical operator keeps a bounded k-row
  * heap per key instead of fully sorting every group: memory is
  * O(distinct-keys-per-partition × k) and no sort of the whole
  * partition happens — the window-function plan sorts ALL rows of every
  * group before discarding everything past rank k. At 100 TB that's
  * the difference between a bounded-state streaming-style aggregation
  * and a full shuffle-sort of the fact table.
  */
object TopKPerGroup {

  /** Top-k rows per group. `orderCols` are (column, ascending) pairs and
    * must totally order rows within a group. */
  def topK(df: DataFrame, groupCols: Seq[String],
           orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(",")}"))
    val keys = groupCols.map(attr)
    val ordering = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending) }
    ColumnBridge.ofRows(spark, TopKPerGroupNode(keys, ordering, k, analyzed))
  }
}

/** Logical node: pure annotation of the semantics; the analyzer passes
  * it through because it is constructed fully resolved. */
case class TopKPerGroupNode(
    keys: Seq[Attribute],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroupNode = copy(child = newChild)
}

/** Planner strategy: one-to-one mapping to the physical operator. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(keys, ordering, k, child) =>
      TopKPerGroupExec(keys, ordering, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical operator: declares a clustered distribution on the keys (so
  * EnsureRequirements inserts the hash exchange — co-location comes from
  * the framework, not hand-rolled), then keeps one bounded k-row heap
  * per key within each partition. */
case class TopKPerGroupExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // keys are untouched, so the child's hash partitioning survives —
  // a downstream group-by on the same keys needs no further exchange
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val ordSeq = ordering
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection: children normally emit UnsafeRows, but a
      // row-based child (codegen off, custom sources) may not — the
      // HashMap keying below relies on UnsafeRow byte-equality
      val toUnsafe = UnsafeProjection.create(
        childOutput.map(_.asInstanceOf[Expression]), childOutput)
      val baseOrd = GenerateOrdering.generate(ordSeq, childOutput)
      val rowOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
        override def compare(x: UnsafeRow, y: UnsafeRow): Int =
          baseOrd.compare(x, y)
      }
      // max-heap per key: head = worst kept row under the total order;
      // a new row enters only if it beats the worst (strictly — the
      // order is total, so equality cannot occur across distinct rows)
      val heaps = new java.util.HashMap[
        UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = it.next() match {
          case u: UnsafeRow => u
          case r => toUnsafe(r) // buffer reused; copied below before keeping
        }
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](rowOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (baseOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        h.toArray.sorted(rowOrd).iterator.map(_.asInstanceOf[InternalRow])
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}
