package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator (UDTF-shaped expression): emits one row per
  * word n-gram of a text column — completes graft's expression trio
  * (scalar [[CosineSimilarity]], aggregate [[BetaGeoFitAgg]], generator
  * here). Used as `select(ngrams($"text", 3))` → rows of
  * (pos, ngram).
  *
  * Generators run outside whole-stage codegen in Spark (GenerateExec) —
  * CodegenFallback is the normal citizen here, not a penalty. Tokens are
  * split on whitespace; documents shorter than n emit a single
  * whole-document gram (same convention as MinHash.wordShingles).
  */
case class NGramsGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "n must be >= 1")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngrams expects a string column, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val grams: Iterator[String] =
      if (toks.length >= n) toks.sliding(n).map(_.mkString(" "))
      else Iterator(toks.mkString(" "))
    grams.zipWithIndex.map { case (g, i) =>
      InternalRow(i, UTF8String.fromString(g))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NGramsGenerator {
  def ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(NGramsGenerator(ColumnBridge.expression(text), n))
}
