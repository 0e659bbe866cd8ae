package graft.functions

import graft.clv.SpecialFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Gaussian hypergeometric ₂F₁(a,b;c;z) as a Catalyst expression, so the
  * BG/NBD conditional-expectation closed form can run as a *column* over
  * billions of customers inside whole-stage codegen (fit the four model
  * parameters on summarized data, then score the full table with pure
  * expression arithmetic — no per-row JVM closure dispatch, no shuffle).
  * The generated code calls the same series implementation used by the
  * driver-side math ([[graft.clv.SpecialFunctions.hyp2f1]]), so column
  * scoring is bit-identical to pipeline scoring.
  */
case class Hyp2F1Expr(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("hyp2f1 expects four doubles")

  override def nullSafeEval(a: Any, b: Any, c: Any, z: Any): Any =
    SpecialFunctions.hyp2f1(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], z.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, z) =>
      s"${ev.value} = graft.clv.SpecialFunctions.hyp2f1($a, $b, $c, $z);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

object Hyp2F1Expr {
  def apply(a: Column, b: Column, c: Column, z: Column): Column =
    ColumnBridge.column(Hyp2F1Expr(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      ColumnBridge.expression(c), ColumnBridge.expression(z)))
}
