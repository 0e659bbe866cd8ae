package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave of two non-negative 32-bit
  * coordinates — the clustering key behind multi-dimensional data
  * skipping (`OPTIMIZE ZORDER BY` in Delta terms): sorting by the
  * interleaved key places rows close in BOTH dimensions into the same
  * file groups, so per-group min/max stats prune scans filtered on
  * either column. A native codegen expression (not a UDF): the key is
  * computed in the write path over every row of the table, exactly where
  * per-row closure dispatch would hurt most.
  *
  * Inputs are masked to their low 32 bits; callers normalize coordinates
  * to a bounded non-negative scale first (see q133 — rank-scaling to 16
  * bits is the usual move, keeping the interleaved key well inside a
  * positive long).
  */
case class ZOrderInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "zorder_interleave expects two longs")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderInterleave.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderInterleave.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression): Expression = copy(left = a, right = b)
}

object ZOrderInterleave {

  /** Spread the low 32 bits of `x` to the even bit positions of a long
    * (classic magic-mask doubling). */
  def spread(x: Long): Long = {
    var v = x & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** z = a's bits on even positions, b's bits on odd positions. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrderInterleave(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
