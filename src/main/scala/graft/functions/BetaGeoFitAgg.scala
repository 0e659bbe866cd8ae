package graft.functions

import scala.collection.mutable.ArrayBuffer

import graft.clv.BetaGeoModel
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** BG/NBD maximum-likelihood fit packaged as a SQL aggregate
  * (SURVEY.md §2.11 U9): `SELECT group_key, fit_bgnbd(x, t_x, T) ...
  * GROUP BY group_key` fits one model per group inside the aggregation
  * operator itself — partial buffers collect (x, t_x, T) triples on the
  * map side, merge concatenates, and the MLE runs once per group at
  * final eval. Buffer rows are sorted before fitting so the result is
  * independent of partial-aggregation merge order (same determinism rule
  * as the flatMapGroups pipeline).
  *
  * Buffer size ∝ customers per group (the summarized rows, not raw
  * orders) — the same state the grouped-map fit shuffles; this form just
  * rides the aggregate codepath instead of flatMapGroups.
  */
case class BetaGeoFitAgg(
    xExpr: Expression, txExpr: Expression, tExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Array[Double]]] {

  override def children: Seq[Expression] = Seq(xExpr, txExpr, tExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("r", DoubleType), StructField("alpha", DoubleType),
    StructField("a", DoubleType), StructField("b", DoubleType)))

  override def createAggregationBuffer(): ArrayBuffer[Array[Double]] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Array[Double]], input: InternalRow)
      : ArrayBuffer[Array[Double]] = {
    val x = xExpr.eval(input); val tx = txExpr.eval(input)
    val t = tExpr.eval(input)
    if (x != null && tx != null && t != null) {
      buf += Array(toD(x), toD(tx), toD(t))
    }
    buf
  }

  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.toString.toDouble
  }

  override def merge(b1: ArrayBuffer[Array[Double]],
                     b2: ArrayBuffer[Array[Double]])
      : ArrayBuffer[Array[Double]] = { b1 ++= b2; b1 }

  override def eval(buf: ArrayBuffer[Array[Double]]): Any = {
    if (buf.isEmpty) return null
    val sorted = buf.sortBy(a => (a(0), a(1), a(2)))
    val fitted = BetaGeoModel.fit(
      sorted.map(a => (a(0), a(1), a(2))).toIndexedSeq)
    InternalRow(fitted.r, fitted.alpha, fitted.a, fitted.b)
  }

  override def serialize(buf: ArrayBuffer[Array[Double]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 24)
    bb.putInt(buf.length)
    buf.foreach { a => bb.putDouble(a(0)); bb.putDouble(a(1)); bb.putDouble(a(2)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Array[Double]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Array[Double]](n)
    var i = 0
    while (i < n) {
      buf += Array(bb.getDouble, bb.getDouble, bb.getDouble)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BetaGeoFitAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BetaGeoFitAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(xExpr = c(0), txExpr = c(1), tExpr = c(2))
}

object BetaGeoFitAgg {
  /** Column entry point: `df.groupBy(k).agg(fitBgnbd($"x", $"tx", $"t"))`. */
  def fitBgnbd(x: Column, tx: Column, t: Column): Column =
    ColumnBridge.column(
      BetaGeoFitAgg(ColumnBridge.expression(x), ColumnBridge.expression(tx),
        ColumnBridge.expression(t)).toAggregateExpression())
}
