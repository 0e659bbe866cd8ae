package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer for [[BandedCollectAgg]]: occurrence pairs plus
  * the distinct-key set that enforces the band ceiling. Once `dead`,
  * the collections are CLEARED — a hot key's buffer costs a boolean
  * from that point on, which is the whole point of the operator. */
final class BandedBuffer(
    var dead: Boolean,
    val docs: scala.collection.mutable.HashSet[Long],
    val pairs: scala.collection.mutable.ArrayBuffer[(Long, Int)]) {
  def kill(): Unit = { dead = true; docs.clear(); pairs.clear() }
}

/** Banded collect — the bounded form of `collect_list` the
  * bucket-explode dedup operators need (q231's seed join; the shape
  * PlanLint's `unbounded-collect` class polices): collect
  * `(key, pos)` occurrence pairs per group, but the moment the group
  * exceeds `maxKeys` DISTINCT keys, mark the buffer dead, FREE its
  * state, and evaluate to NULL.
  *
  * Semantically identical to
  * `collect_list(struct(key, pos))` followed by a distinct-key band
  * filter — but the plain form materializes a hot group's entire
  * occurrence list before the filter discards it, which at 100 TB is
  * an OOM on the task that draws the boilerplate gram shared by
  * millions of documents. Here the per-group state is capped at
  * `maxKeys` distinct keys' occurrences by construction: a hot gram
  * costs one boolean, not its fanout. Merge of partial buffers
  * re-checks the ceiling, so the cap holds under any partitioning;
  * output order is partition-dependent exactly like `collect_list`
  * (downstream consumers must be order-insensitive, as q231's
  * diagonal-island windows are).
  */
case class BandedCollectAgg(
    key: Expression, pos: Expression, maxKeys: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BandedBuffer] {

  override def children: Seq[Expression] = Seq(key, pos)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("i", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "banded_collect"

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"banded_collect key must be BIGINT, got ${key.dataType.catalogString}")
    else if (pos.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"banded_collect pos must be INT, got ${pos.dataType.catalogString}")
    else if (maxKeys < 1)
      TypeCheckResult.TypeCheckFailure("banded_collect maxKeys must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BandedBuffer =
    new BandedBuffer(dead = false,
      scala.collection.mutable.HashSet.empty[Long],
      scala.collection.mutable.ArrayBuffer.empty[(Long, Int)])

  override def update(buf: BandedBuffer, input: InternalRow): BandedBuffer = {
    if (buf.dead) return buf
    val k = key.eval(input)
    val p = pos.eval(input)
    if (k == null || p == null) return buf // collect_list's null rule
    buf.docs += k.asInstanceOf[Long]
    if (buf.docs.size > maxKeys) buf.kill()
    else buf.pairs += ((k.asInstanceOf[Long], p.asInstanceOf[Int]))
    buf
  }

  override def merge(b1: BandedBuffer, b2: BandedBuffer): BandedBuffer = {
    if (b1.dead || b2.dead) { b1.kill(); return b1 }
    b1.docs ++= b2.docs
    if (b1.docs.size > maxKeys) b1.kill()
    else b1.pairs ++= b2.pairs
    b1
  }

  override def eval(buf: BandedBuffer): Any =
    if (buf.dead) null
    else new GenericArrayData(buf.pairs.map { case (k, p) =>
      InternalRow(k, p)
    }.toArray[Any])

  override def serialize(buf: BandedBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.dead)
    out.writeInt(buf.pairs.length)
    buf.pairs.foreach { case (k, p) => out.writeLong(k); out.writeInt(p) }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BandedBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.dead = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k = in.readLong(); val p = in.readInt()
      buf.docs += k
      buf.pairs += ((k, p))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BandedCollectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BandedCollectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BandedCollectAgg =
    copy(key = newChildren(0), pos = newChildren(1))
}
