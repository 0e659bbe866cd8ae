package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters buffer: at most k−1 counters. */
final class MGBuffer(val counts: scala.collection.mutable.HashMap[String, Long])

/** Misra–Gries frequent-items sketch (Misra & Gries 1982) as a
  * distributed, MERGEABLE aggregate — the deterministic counterpart of
  * the Count-Min sketch (q88): at most k−1 counters, and every counter
  * underestimates its term's true count by AT MOST n/k (n = stream
  * length). Any term with true frequency above n/k is GUARANTEED to
  * survive — no hashing, no probability.
  *
  * Update is the textbook rule (hit → +1; room → insert; else
  * decrement every counter, dropping zeros). Merge is the mergeable-
  * summaries construction (Agarwal et al., PODS'12): sum counters
  * pointwise, then subtract the k-th largest value from all and drop
  * the non-positives — the n/k error bound survives ANY merge tree,
  * which is exactly what a map-side-combined Spark aggregation needs.
  *
  * The SET of surviving sub-threshold counters (and their exact
  * residues) is partition-placement-dependent — like any MG deployment
  * — so consumers must gate on the guaranteed facts (presence above
  * n/k, est ≤ true, undercount ≤ n/k; q259's pattern), never on raw
  * sketch internals. Eval orders entries (est desc, term) for a
  * deterministic rendering of whatever the buffer holds.
  */
case class MisraGriesAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  private def cap = k - 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries child must be STRING, got ${child.dataType.catalogString}")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure("misra_gries k must be >= 2")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MGBuffer =
    new MGBuffer(scala.collection.mutable.HashMap.empty[String, Long])

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v == null) return buf // count(col)'s null rule
    val s = v.asInstanceOf[UTF8String].toString
    val c = buf.counts
    c.get(s) match {
      case Some(n) => c.update(s, n + 1)
      case None if c.size < cap => c.update(s, 1L)
      case None =>
        // decrement-all: one stream item cancels k distinct items
        val dead = c.iterator.collect { case (t, 1L) => t }.toList
        c.mapValuesInPlace((_, n) => n - 1)
        dead.foreach(c.remove)
    }
    buf
  }

  override def merge(b1: MGBuffer, b2: MGBuffer): MGBuffer = {
    val c = b1.counts
    b2.counts.foreach { case (t, n) => c.update(t, c.getOrElse(t, 0L) + n) }
    if (c.size > cap) {
      // subtract the k-th largest counter from all, drop non-positives
      val m = c.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val dead = c.iterator.collect { case (t, n) if n <= m => t }.toList
      dead.foreach(c.remove)
      c.mapValuesInPlace((_, n) => n - m)
    }
    b1
  }

  override def eval(buf: MGBuffer): Any = {
    val sorted = buf.counts.toArray.sortBy { case (t, n) => (-n, t) }
    new GenericArrayData(sorted.map { case (t, n) =>
      InternalRow(UTF8String.fromString(t), n)
    }.toArray[Any])
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (t, n) => out.writeUTF(t); out.writeLong(n) }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val t = in.readUTF(); val c = in.readLong()
      buf.counts.update(t, c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
}
