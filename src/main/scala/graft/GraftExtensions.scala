package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import graft.functions.DotProduct

/** SparkSessionExtensions module: makes the engine's native functions
  * available to SQL users (`spark.sql.extensions=graft.GraftExtensions`).
  * For an already-running session use `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))
    ),
    (
      // cosine similarity composed from the native dot product — same
      // sequential folds as the Column API, so SQL users get bit-identical
      // values to DataFrame users
      "graft_cosine",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        val (a, b) = (children(0), children(1))
        Divide(DotProduct(a, b), Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      }
    )
  )

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftColumns.registerFunction(spark, name, builder)
    }
}
