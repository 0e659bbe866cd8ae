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

  /** Bits kept per coordinate for a k-way interleave: 16 for 2–3
    * columns (matching the classic 2-col scale), 15 for 4 (k·bits must
    * stay inside a positive long). */
  def bitsFor(k: Int): Int = math.min(16, 63 / k)

  /** k-way Morton interleave: bit j of coordinate i lands at position
    * j·k + i — for k = 2 this is bit-identical to [[interleave]]. Used
    * once per row in the rewrite job, not a per-query hot path, but
    * still codegen'd ([[ZOrderInterleaveK]]). */
  def interleaveN(xs: Array[Long], bits: Int): Long = {
    val k = xs.length
    var z = 0L
    var j = 0
    while (j < bits) {
      var i = 0
      while (i < k) {
        z |= ((xs(i) >>> j) & 1L) << (j * k + i)
        i += 1
      }
      j += 1
    }
    z
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrderInterleave(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** k-way Morton interleave (2 ≤ k ≤ 4) — the clustering key behind
  * `OPTIMIZE ZORDER BY (a, b, c, …)`: contiguous z-ranges are
  * axis-aligned boxes in k-space, so per-group min/max stats prune
  * range probes on ANY of the k columns (each extra column costs bits
  * of resolution per dimension — 16 for 2–3 columns, 15 for 4 — the
  * inherent Morton trade). Native codegen expression; inputs are the
  * caller-scaled non-negative coordinates. */
case class ZOrderInterleaveK(children: Seq[Expression])
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 4)
      TypeCheckResult.TypeCheckFailure(
        s"zorder_interleave_k takes 2 to 4 columns, got ${children.size}")
    else if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "zorder_interleave_k expects long inputs")

  private val bits = ZOrderInterleave.bitsFor(children.size)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var i = 0
    while (i < xs.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderInterleave.interleaveN(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zxs")
    val anyNull = ctx.freshName("zAnyNull")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |if (${e.isNull}) { $anyNull = true; }
         |else { $arr[$i] = ${e.value}; }""".stripMargin
    }.mkString("\n")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        |long[] $arr = new long[${children.size}];
        |boolean $anyNull = false;
        |$fill
        |boolean ${ev.isNull} = $anyNull;
        |long ${ev.value} = ${ev.isNull} ? -1L :
        |  graft.functions.ZOrderInterleave.interleaveN($arr, $bits);
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderInterleaveK {
  def apply(cols: Seq[Column]): Column =
    ColumnBridge.column(new ZOrderInterleaveK(
      cols.map(ColumnBridge.expression)))
}
