package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.Decimal

/** Registration of graft's native Catalyst expressions as SQL functions,
  * both on a live session (temp functions) and via
  * `SparkSessionExtensions` for `SparkSession.builder().withExtensions`
  * (the production wiring: `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` works too, since the class is
  * zero-arg constructible).
  */
object GraftFunctions {

  private def arity(name: String, exprs: Seq[Expression], ns: Int*): Unit =
    if (!ns.contains(exprs.length))
      throw new IllegalArgumentException(
        s"$name requires ${ns.mkString(" or ")} arguments, got ${exprs.length}")

  /** Sketch sizings arrive as SQL literals (`bloom_agg(k, 20000, 0.01)`);
    * the parser types `20000` as INT and `0.01` as DECIMAL(2,2), so fold
    * and widen rather than pattern-match a single literal type. */
  /** Integral sizings (items/depth/width/seed) must BE integral and fit
    * the target width — a truncated 5.9 or an Int-saturated 3e9 would
    * otherwise run with a silently different (or absurdly allocated)
    * sketch instead of failing analysis. */
  private def litIntegral(name: String, e: Expression, lo: Long,
                          hi: Long): Long = {
    val v = litNum(name, e)
    if (v != math.floor(v) || v.isInfinite)
      throw new IllegalArgumentException(
        s"$name sizing arguments must be integral, got $v")
    if (v < lo || v > hi)
      throw new IllegalArgumentException(
        s"$name sizing argument $v out of range [$lo, $hi]")
    v.toLong
  }

  private def litNum(name: String, e: Expression): Double = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$name sizing arguments must be literals")
    e.eval() match {
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: Double => d
      case f: Float => f.toDouble
      case d: Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$name sizing arguments must be numeric literals, got $other")
    }
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (exprs => {
      arity("cosine_similarity", exprs, 2)
      CosineSimilarity(exprs(0), exprs(1))
    }),
    "hyp2f1" -> (exprs => {
      arity("hyp2f1", exprs, 4)
      Hyp2F1Expr(exprs(0), exprs(1), exprs(2), exprs(3))
    }),
    "bloom_agg" -> (exprs => {
      arity("bloom_agg", exprs, 3)
      BloomBuildAgg(exprs(0),
        litIntegral("bloom_agg", exprs(1), 1L, 1L << 40),
        litNum("bloom_agg", exprs(2)))
    }),
    "cms_agg" -> (exprs => {
      arity("cms_agg", exprs, 4)
      CmsBuildAgg(exprs(0),
        litIntegral("cms_agg", exprs(1), 1L, 64L).toInt,
        litIntegral("cms_agg", exprs(2), 1L, 1L << 24).toInt,
        litIntegral("cms_agg", exprs(3), Int.MinValue.toLong,
          Int.MaxValue.toLong).toInt)
    }),
    "bloom_might_contain" -> (exprs => {
      arity("bloom_might_contain", exprs, 2)
      BloomMightContain(exprs(0), exprs(1))
    }),
    "cms_estimate" -> (exprs => {
      arity("cms_estimate", exprs, 2)
      CmsEstimate(exprs(0), exprs(1))
    }),
    "strip_accents" -> (exprs => {
      arity("strip_accents", exprs, 1)
      StripAccentsExpr(exprs(0))
    }),
    "unicode_normalize" -> (exprs => {
      arity("unicode_normalize", exprs, 2)
      NormalizeExpr(exprs(0), litString("unicode_normalize", exprs(1)))
    }),
    "jaro_winkler" -> (exprs => {
      arity("jaro_winkler", exprs, 2)
      JaroWinklerExpr(exprs(0), exprs(1))
    })
  )

  /** Form selectors arrive as SQL string literals and must fold at
    * analysis time — a per-row form would defeat the static dispatch. */
  private def litString(name: String, e: Expression): String = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$name form must be a literal")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$name form must be a string literal, got $other")
    }
  }

  /** Register on an existing session (temp functions, this session only). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }
}

/** Extension entry point: injects graft functions into every session
  * built with these extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        b))
    }
    // window-top-k rewrite + the strategy planning its target node
    e.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // lake-maintenance SQL verbs (OPTIMIZE / VACUUM / DESCRIBE HISTORY /
    // RESTORE / INSERT INTO … REPLACE WHERE) — a pure superset of the
    // session parser
    e.injectParser((_, parser) =>
      new graft.sources.GraftSqlParser(parser))
    // CDC table-valued function: FROM table_changes('cat.t', v1, v2, 'k')
    e.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft.sources.GraftTableFunctions",
        "table_changes"),
      exprs => graft.sources.GraftTableFunctions.tableChanges(exprs)))
  }
}
