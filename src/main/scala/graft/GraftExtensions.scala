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

  private def arity2(name: String)(f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != 2)
        throw new IllegalArgumentException(s"$name requires exactly 2 arguments, got ${children.length}")
      f(children(0), children(1))
    }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      arity2("graft_dot")(DotProduct(_, _))
    ),
    (
      // cosine similarity composed from the native dot product — same
      // sequential folds as the Column API, so SQL users get bit-identical
      // values to DataFrame users
      "graft_cosine",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
      arity2("graft_cosine")((a, b) =>
        Divide(DotProduct(a, b), Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      )
    )
  )

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftColumns.registerFunction(spark, name, builder)
    }
}
