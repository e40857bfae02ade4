package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native dot product over two array<double> columns, with whole-stage
  * codegen (`doGenCode` emits a tight primitive loop). This replaces the
  * `zip_with` + `aggregate` higher-order-function formulation, which Spark
  * evaluates interpreted per element — the difference is ~an order of
  * magnitude on the all-pairs similarity paths (SURVEY §2.9 E14), where the
  * dot product dominates the 100 TB cost profile.
  *
  * Summation is a sequential left-to-right fold, matching both the HOF
  * formulation and DuckDB's list_dot_product, so oracle results are
  * bit-identical pre-rounding.
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** All random-hyperplane sign bits in one expression: returns a string of
  * '1'/'0' chars, one per plane, for an array<double> embedding against a
  * row-major flattened plane matrix. One tight two-level loop under
  * whole-stage codegen replaces numPlanes separate literal-array dot
  * expressions — with 128 planes × 64 dims the literal-array form is 8192
  * leaf literals, whose analysis/codegen cost dominated small benchmarks and
  * whose generated code blows past JIT inlining limits.
  *
  * Per-plane accumulation is the same sequential left-to-right fold as
  * DotProduct, so sign bits are bit-identical to the per-plane formulation
  * (and to the DuckDB oracle's list_sum).
  *
  * `planes` is a Seq (not Array) so case-class equality is structural —
  * identical signatures canonicalize equal, enabling subexpression
  * elimination and cache reuse.
  */
final case class HyperplaneSigns(child: Expression, planes: Seq[Double], dim: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_hyperplane_signs"

  private val numPlanes: Int = planes.length / dim

  @transient private lazy val flat: Array[Double] = planes.toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Char](numPlanes)
    var p = 0
    while (p < numPlanes) {
      val off = p * dim
      var s = 0.0
      var j = 0
      while (j < n) {
        s += flat(off + j) * v.getDouble(j)
        j += 1
      }
      out(p) = if (s >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val m = ctx.addReferenceObj("planes", flat, "double[]")
        val p = ctx.freshName("p")
        val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        s"""
           |int $n = java.lang.Math.min($dim, $a.numElements());
           |char[] $out = new char[$numPlanes];
           |for (int $p = 0; $p < $numPlanes; $p++) {
           |  double $s = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    $s += $m[$p * $dim + $j] * $a.getDouble($j);
           |  }
           |  $out[$p] = $s >= 0.0 ? '1' : '0';
           |}
           |${ev.value} = UTF8String.fromString(new String($out));
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  import org.apache.spark.sql.functions.sqrt

  def dot(a: Column, b: Column): Column =
    GraftColumns.lift(DotProduct(GraftColumns.unlift(a), GraftColumns.unlift(b)))

  def hyperplaneSigns(emb: Column, planes: Seq[Double], dim: Int): Column =
    GraftColumns.lift(HyperplaneSigns(GraftColumns.unlift(emb), planes, dim))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
