package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule — the §2 extension mechanism the strategy/expression
  * packs don't cover: a `Rule[LogicalPlan]` that rewrites the ubiquitous
  * window-top-k idiom
  *
  * {{{
  *   SELECT <cols ∉ {rn}> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY p ORDER BY o) rn FROM t)
  *   WHERE rn <= k
  * }}}
  *
  * into [[TopKPerGroupNode]] whenever the rank column itself is
  * discarded. The window plan shuffle-sorts EVERY row of every group
  * before throwing away everything past rank k; the rewritten plan keeps
  * a bounded k-row heap per key ([[TopKPerGroupExec]]) — no sort of the
  * group's tail at all. Same rewrite family as Spark's own
  * `InferWindowGroupLimit`, taken one step further for the
  * rank-discarding shape (Spark's version must keep the Window to emit
  * the rank; this one may delete it).
  *
  * Ties: `row_number` numbers order-ties arbitrarily, and the heap keeps
  * an arbitrary tied subset — identical nondeterminism contract; pass a
  * tiebreak column for a deterministic result (exactly as with the
  * window form).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** cond must be PRECISELY the rank limit (no other conjuncts — those
    * could legally reference the rank column). Returns k. */
  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = {
    def lim(e: Expression): Option[Int] = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lim(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) =>
        lim(l).map(_ - 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lim(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) =>
        lim(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rn) =>
        lim(l).filter(_ == 1)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rn) =>
        lim(l).filter(_ == 1)
      case _ => None
    }
  }

  private def isRowNumberOverPartition(we: WindowExpression): Boolean =
    we match {
      case WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))) =>
        true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList,
        Filter(cond, w @ Window(Seq(al @ Alias(we: WindowExpression, _)),
          partitionSpec, orderSpec, wChild, _)))
        if isRowNumberOverPartition(we) &&
          orderSpec.nonEmpty &&
          // the rank column must be dropped by the projection…
          !projList.exists(_.references.contains(al.toAttribute)) &&
          // …and the projection must only need the window child's output
          projList.forall(_.references.subsetOf(wChild.outputSet)) &&
          // the operator hash-partitions on attribute keys
          partitionSpec.forall(_.isInstanceOf[Attribute]) =>
      rankLimit(cond, al.toAttribute) match {
        case Some(k) if k > 0 =>
          // Spark's InferWindowGroupLimit may already have slid a
          // WindowGroupLimit under the Window; TopK subsumes it
          val child = wChild match {
            case WindowGroupLimit(ps, os, _, limit, c)
                if ps == partitionSpec && os == orderSpec && limit >= k => c
            case c => c
          }
          Project(projList, TopKPerGroupNode(
            partitionSpec.map(_.asInstanceOf[Attribute]),
            orderSpec, k, child))
        case Some(k) if k <= 0 =>
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation(p.output)
        case None => p
      }
  }

  /** Enable the rewrite (and the strategy that plans its target node) on
    * a live session. Sessions built with [[graft.functions.GraftExtensions]]
    * get both automatically. */
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(WindowTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ WindowTopKRewrite
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }
}
