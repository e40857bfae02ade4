package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProduct

/** Optimizer rule (injected via `GraftExtensions` /
  * `spark.experimental.extraOptimizations`): rewrites the higher-order
  * squared-norm idiom
  *
  * {{{ aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[graft.functions.DotProduct]] kernel. Spark
  * evaluates higher-order functions interpreted per element
  * (CodegenFallback), so a user writing the plain-SQL norm pays an
  * order-of-magnitude penalty on the corpus-scan hot path; with this rule
  * they get the fused primitive loop automatically — the same result, the
  * same left-to-right IEEE summation order, inside whole-stage codegen.
  *
  * Soundness requires the rewrite to fire ONLY where the two formulations
  * are bit-equivalent, which restricts it to the SELF-dot:
  *  - the two `zip_with` children must be the same (canonicalized)
  *    deterministic expression — a self-zip can never be ragged, whereas
  *    `zip_with(a, b)` on different-length arrays null-pads and the HOF
  *    yields NULL where a min-length dot yields a number;
  *  - the element type must be non-nullable `double`
  *    (`containsNull = false`, e.g. a typed `Dataset`'s `Seq[Double]`
  *    encoder): a null element makes the HOF fold NULL, which the dense
  *    kernel would silently read as garbage;
  *  - the fold must be exactly `·` then `+` over the lambda variables
  *    (either operand order — both are commutative on doubles bitwise)
  *    with a literal `0.0` zero and an identity finish.
  *
  * A NULL input array yields NULL on both sides (DotProduct is
  * null-safe), so nullability is preserved.
  */
object KernelFusion extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _                                                => false
  }

  private def isProductOfVars(f: Expression, args: Seq[NamedExpression]): Boolean =
    (f, args) match {
      case (m: Multiply, Seq(x, y)) =>
        (sameVar(m.left, x) && sameVar(m.right, y)) ||
        (sameVar(m.left, y) && sameVar(m.right, x))
      case _ => false
    }

  private def isSumOfVars(f: Expression, args: Seq[NamedExpression]): Boolean =
    (f, args) match {
      case (a: Add, Seq(x, y)) =>
        (sameVar(a.left, x) && sameVar(a.right, y)) ||
        (sameVar(a.left, y) && sameVar(a.right, x))
      case _ => false
    }

  private def isIdentity(f: Expression, args: Seq[NamedExpression]): Boolean =
    args.length == 1 && sameVar(f, args.head)

  private def denseDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, false) => true
    case _                            => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul, margs, _)),
            Literal(zero, DoubleType),
            LambdaFunction(add, aargs, _),
            LambdaFunction(fin, fargs, _)
          )
          if zero == 0.0 &&
            a.deterministic &&
            a.canonicalized == b.canonicalized &&
            denseDoubleArray(a) && denseDoubleArray(b) &&
            isProductOfVars(mul, margs) &&
            isSumOfVars(add, aargs) &&
            isIdentity(fin, fargs) =>
        DotProduct(a, b)
    }
}
