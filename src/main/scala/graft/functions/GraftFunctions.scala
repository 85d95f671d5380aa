package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's native expressions, so the Spark SQL
  * surface (not just the Column API) can call them:
  *
  *   SELECT array_dot(a, b) FROM ...
  *
  * Two entry points: `register(spark)` for an existing session, and
  * `GraftExtensions` for spark.sql.extensions / withExtensions wiring at
  * session build time.
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "array_dot" -> { exprs => ArrayDotProduct(exprs(0), exprs(1)) },
    "sorted_intersect_count" -> { exprs => SortedLongArrayIntersect(exprs(0), exprs(1)) },
    "jaro_winkler_similarity" -> { exprs => JaroWinkler(exprs(0), exprs(1)) })

  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  private[functions] def injections
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    fns.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[ArrayDotProduct].getName, name),
        builder)
    }
}

/** Use via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.injections.foreach { case (id, info, builder) =>
      extensions.injectFunction((id, info, builder))
    }
}
