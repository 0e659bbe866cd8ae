package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Per-group sketch aggregates (SURVEY.md §2.11 U9 mechanism; extends the
  * q87/q88 sketch surface). `df.stat.bloomFilter`/`countMinSketch` build
  * ONE sketch per DataFrame on the driver; these `TypedImperativeAggregate`s
  * put the same sketches on the aggregate codepath instead, so
  * `groupBy(k).agg(bloom_agg(col))` builds one mergeable sketch per group
  * in a single shuffle — partial sketches accumulate map-side (bit-OR /
  * counter addition, both commutative ⇒ the result bytes are independent
  * of partition count and merge order) and only kilobyte summaries move.
  *
  * Scale role: this is the runtime-filter build shape — at 100 TB the
  * per-partition partials are the only state exchanged, and the finished
  * per-group sketches are small enough to broadcast back as join
  * pre-filters (q95 pattern) without ever shuffling the key space.
  */
private[graft] object SketchKeys {
  /** Shared key normalization so build and probe always hash the same
    * representation: integrals widen to Long, strings stay UTF-8 bytes. */
  def checkKeyType(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects an integral or string key, got ${other.catalogString}")
  }
}

/** `bloom_agg(key, expectedItems, fpp)` → BINARY (the serialized filter).
  * All groups share one sizing, so their buffers are merge-compatible;
  * size for the expected max group cardinality (at cluster scale, from
  * table stats / parquet row counts — an oversized filter only wastes
  * bits, but per-partition partials scale with it, which is exactly the
  * q87 lesson: don't guess a 4M sizing against a 150k build side). */
case class BloomBuildAgg(
    child: Expression, expectedItems: Long, fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    SketchKeys.checkKeyType(child.dataType, prettyName)

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buf.putLong(l)
      case i: Int => buf.putLong(i.toLong)
      case s: Short => buf.putLong(s.toLong)
      case b: Byte => buf.putLong(b.toLong)
      case u: UTF8String => buf.putBinary(u.getBytes)
      case other => buf.putString(other.toString)
    }
    buf
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
    b1.mergeInPlace(b2)

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

/** `cms_agg(key, depth, width, seed)` → BINARY (serialized Count-Min
  * sketch). Fixed seed ⇒ deterministic for fixed data; counters are
  * summed on merge, so `totalCount` is exact and per-key estimates never
  * undercount regardless of how partials combined. */
case class CmsBuildAgg(
    child: Expression, depth: Int, width: Int, seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    SketchKeys.checkKeyType(child.dataType, prettyName)

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buf.addLong(l)
      case i: Int => buf.addLong(i.toLong)
      case s: Short => buf.addLong(s.toLong)
      case b: Byte => buf.addLong(b.toLong)
      case u: UTF8String => buf.addBinary(u.getBytes)
      case other => buf.addString(other.toString)
    }
    buf
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
    b1.mergeInPlace(b2)

  override def eval(buf: CountMinSketch): Any = serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

/** Base for the probe-side scalars: deserializing a sketch per row would
  * be O(sketch bytes) per probe, so a one-entry cache (cheap memcmp of
  * the incoming bytes against the last-seen serialization) makes runs of
  * probes against the same sketch — the per-group join shape — pay
  * deserialization once per distinct sketch per task. Probes belong on
  * aggregated/small row sets (per-group top-k, bounded probe lists); for
  * a full-table probe, broadcast the deserialized sketches and use
  * `mapPartitions` (q87/q95 shape) so no binary column is copied per row.
  */
abstract class SketchProbe[S] extends BinaryExpression with CodegenFallback {
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: S = _

  protected def parse(bytes: Array[Byte]): S

  protected final def sketchFor(bytes: Array[Byte]): S = {
    if (cachedBytes == null || !java.util.Arrays.equals(cachedBytes, bytes)) {
      cachedBytes = bytes
      cachedSketch = parse(bytes)
    }
    cachedSketch
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BINARY sketch, got ${left.dataType.catalogString}")
    else SketchKeys.checkKeyType(right.dataType, prettyName)
}

/** `bloom_might_contain(bloomBinary, key)` — no false negatives ever;
  * false positives at the configured fpp. */
case class BloomMightContain(left: Expression, right: Expression)
    extends SketchProbe[BloomFilter] {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override protected def parse(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(bloom: Any, key: Any): Any = {
    val f = sketchFor(bloom.asInstanceOf[Array[Byte]])
    key match {
      case l: Long => f.mightContainLong(l)
      case i: Int => f.mightContainLong(i.toLong)
      case s: Short => f.mightContainLong(s.toLong)
      case b: Byte => f.mightContainLong(b.toLong)
      case u: UTF8String => f.mightContainBinary(u.getBytes)
      case other => f.mightContainString(other.toString)
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `cms_estimate(cmsBinary, key)` — point frequency estimate; ≥ the true
  * count always, ≤ true + eps·N with the sketch's confidence. */
case class CmsEstimate(left: Expression, right: Expression)
    extends SketchProbe[CountMinSketch] {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override protected def parse(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(cms: Any, key: Any): Any = {
    val sk = sketchFor(cms.asInstanceOf[Array[Byte]])
    key match {
      case l: Long => sk.estimateCount(java.lang.Long.valueOf(l))
      case i: Int => sk.estimateCount(java.lang.Long.valueOf(i.toLong))
      case s: Short => sk.estimateCount(java.lang.Long.valueOf(s.toLong))
      case b: Byte => sk.estimateCount(java.lang.Long.valueOf(b.toLong))
      case u: UTF8String => sk.estimateCount(u.getBytes)
      case other => sk.estimateCount(other.toString)
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object SketchAggs {
  /** `df.groupBy(k).agg(bloomAgg($"key", n, 0.01))` */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column =
    ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expression(key), expectedItems, fpp)
        .toAggregateExpression())

  /** `df.groupBy(k).agg(cmsAgg($"key", 5, 8192, 42))` */
  def cmsAgg(key: Column, depth: Int, width: Int, seed: Int): Column =
    ColumnBridge.column(
      CmsBuildAgg(ColumnBridge.expression(key), depth, width, seed)
        .toAggregateExpression())

  def bloomMightContain(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(key)))

  def cmsEstimate(cms: Column, key: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(cms), ColumnBridge.expression(key)))
}
