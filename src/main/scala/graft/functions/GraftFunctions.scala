package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native Catalyst expressions as SQL functions,
  * both on a live session (temp functions) and via
  * `SparkSessionExtensions` for `SparkSession.builder().withExtensions`
  * (the production wiring: `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` works too, since the class is
  * zero-arg constructible).
  */
object GraftFunctions {

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (exprs => {
      if (exprs.length != 2)
        throw new IllegalArgumentException(
          s"cosine_similarity requires exactly 2 arguments, got ${exprs.length}")
      CosineSimilarity(exprs(0), exprs(1))
    })
  )

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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.CosineSimilarity", name),
        b))
    }
}
