package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity (Winkler 1990) as a native codegen
  * expression — the fuzzy-match primitive entity resolution and
  * record-linkage dedup run over every candidate pair (Spark ships
  * `levenshtein` but nothing for the Jaro family; a Scala UDF here
  * would sit exactly in the hottest per-pair loop). Semantics match
  * DuckDB's `jaro_winkler_similarity` (the oracle): match window
  * `max(|a|,|b|)/2 - 1`, transpositions = half the out-of-order
  * matches, prefix boost `min(l,4)·0.1·(1-jaro)` applied only when
  * jaro exceeds the 0.7 boost threshold, and empty input → 0 (even
  * for two empties — checked against the oracle's edge cases).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "jaro_winkler expects two strings")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerExpr.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression): Expression = copy(left = a, right = b)
}

object JaroWinklerExpr {

  def similarity(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions floor to an integer (t/2 in INT division — the
    // oracle's rule; an odd mismatch count arises when the greedy
    // window match pairs chars asymmetrically, e.g. "blue anvil" vs
    // "large bolt", and t/2.0 would under-score those pairs)
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
