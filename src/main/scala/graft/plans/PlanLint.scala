package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Physical-plan shape lint — the guard against the scale-killer shapes
  * the round-6 audit found (q36/q206/q216): operators that funnel a
  * data-proportional frame through ONE task. Walks the executed
  * SparkPlan tree (not its string rendering, which can't distinguish an
  * empty partition spec from a populated one) and reports:
  *
  *  - `global-window`: a Window / WindowGroupLimit with an EMPTY
  *    partition spec — `row_number()/ntile() OVER (ORDER BY …)` with no
  *    PARTITION BY, the single-task global sort.
  *  - `cartesian-product`: a CartesianProductExec — an un-broadcast
  *    cross join (broadcast 1-row scalar joins plan as
  *    BroadcastNestedLoopJoin and are NOT flagged).
  *  - `single-partition-exchange`: a shuffle to ONE partition whose
  *    input is not already an aggregate/limit (a global agg's final
  *    stage moves one partial row per task — bounded and fine; anything
  *    else funnels rows).
  *  - `unbounded-collect`: a collect_list / collect_set aggregate —
  *    per-group state proportional to group size, the bucket-explode
  *    pattern's failure mode when its df-band cap is missing (one hot
  *    key OOMs its task at scale). Allowlisted sites must argue the
  *    collected group is BOUNDED (a capped posting list, a value
  *    domain, a df-band).
  *
  * Used by PlanShapeLintSpec, which sweeps every SparkEntry query and
  * fails on any finding outside its adjudicated allowlist — so a new
  * query that re-introduces the shape breaks the build, not the next
  * round's audit.
  */
object PlanLint {

  final case class Finding(kind: String, detail: String) {
    override def toString: String = s"$kind($detail)"
  }

  def lint(df: DataFrame): Seq[Finding] =
    findings(df.queryExecution.executedPlan)

  private def strip(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => strip(w.child)
    case i: InputAdapter          => strip(i.child)
    case _                        => p
  }

  def findings(root: SparkPlan): Seq[Finding] = {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case w: WindowExec if w.partitionSpec.isEmpty =>
          out += Finding("global-window",
            s"orderBy=${w.orderSpec.map(_.sql).mkString(",")}")
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
          out += Finding("global-window",
            s"groupLimit orderBy=${w.orderSpec.map(_.sql).mkString(",")}")
        case c: CartesianProductExec =>
          out += Finding("cartesian-product", c.nodeName)
        // collect_list/collect_set accumulate whole groups as state;
        // flag once per logical aggregate (Final/Complete mode — the
        // Partial stage carries the same expression)
        case a: BaseAggregateExec =>
          import org.apache.spark.sql.catalyst.expressions.aggregate._
          a.aggregateExpressions.foreach { ae =>
            val unbounded = ae.aggregateFunction match {
              case c: CollectList => Some(s"collect_list(${c.child.sql})")
              case c: CollectSet  => Some(s"collect_set(${c.child.sql})")
              case _              => None
            }
            unbounded.foreach { d =>
              if (ae.mode == Final || ae.mode == Complete)
                out += Finding("unbounded-collect", d)
            }
          }
        // SinglePartition (planner-required, e.g. under a global window)
        // or an explicit 1-partition repartition both funnel rows; a
        // RangePartitioning that HAPPENS to sample one partition at toy
        // scale is not flagged — it scales its partition count with data.
        case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition ||
              (e.outputPartitioning.numPartitions == 1 &&
                !e.outputPartitioning
                  .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]) =>
          strip(e.child) match {
            case _: BaseAggregateExec => () // 1 partial row per task
            case _: BaseLimitExec     => () // already limited
            case other =>
              out += Finding("single-partition-exchange",
                s"child=${other.nodeName}")
          }
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(root)
    out.toList
  }
}
