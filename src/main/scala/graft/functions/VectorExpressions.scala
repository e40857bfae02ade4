package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
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

/** [[HyperplaneSigns]] packed into an array<long>: word k holds the sign
  * bits of planes [64k, 64k+64), MSB-first (plane 64k at bit 63). The
  * banded-LSH candidate path ships this signature through the posting
  * shuffle instead of a '1'/'0' string — 8× smaller rows on the shuffle
  * that dominates candidate generation at scale, and the downstream
  * band-key / first-equal-band algebra becomes integer ops instead of
  * per-character work.
  */
final case class HyperplaneSignsPacked(child: Expression, planes: Seq[Double], dim: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_hyperplane_signs_packed"

  private val numPlanes: Int = planes.length / dim
  private val numWords: Int = (numPlanes + 63) / 64

  @transient private lazy val flat: Array[Double] = planes.toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val w = new Array[Long](numWords)
    var p = 0
    while (p < numPlanes) {
      val off = p * dim
      var s = 0.0
      var j = 0
      while (j < n) {
        s += flat(off + j) * v.getDouble(j)
        j += 1
      }
      if (s >= 0) w(p >>> 6) |= 1L << (63 - (p & 63))
      p += 1
    }
    new GenericArrayData(w)
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
        val w = ctx.freshName("w")
        s"""
           |int $n = java.lang.Math.min($dim, $a.numElements());
           |long[] $w = new long[$numWords];
           |for (int $p = 0; $p < $numPlanes; $p++) {
           |  double $s = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    $s += $m[$p * $dim + $j] * $a.getDouble($j);
           |  }
           |  if ($s >= 0.0) $w[$p >>> 6] |= 1L << (63 - ($p & 63));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Band join keys from a packed sign signature: element b of the result is
  * `(b << bandBits) | band_b`, where band_b is the b-th bandBits-wide bit
  * group of the signature (MSB-first). Two vectors share band b iff their
  * keys at index b are equal, so `explode` of this array feeds the LSH
  * candidate equi-join with small int keys. `bandBits` must divide 64
  * (bands never straddle words).
  */
final case class BandKeys(child: Expression, bandBits: Int)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(64 % bandBits == 0, s"bandBits must divide 64, got $bandBits")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_band_keys"

  private val perWord: Int = 64 / bandBits
  private val mask: Long = (1L << bandBits) - 1

  override def nullSafeEval(a: Any): Any = {
    val sig = a.asInstanceOf[ArrayData]
    val nWords = sig.numElements()
    val out = new Array[Int](nWords * perWord)
    var w = 0
    while (w < nWords) {
      val word = sig.getLong(w)
      var k = 0
      while (k < perWord) {
        val b = w * perWord + k
        val nib = (word >>> (64 - (k + 1) * bandBits)) & mask
        out(b) = (b << bandBits) | nib.toInt
        k += 1
      }
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val w = ctx.freshName("w")
        val k = ctx.freshName("k")
        val b = ctx.freshName("b")
        val word = ctx.freshName("word")
        val out = ctx.freshName("out")
        val nW = ctx.freshName("nWords")
        s"""
           |int $nW = $a.numElements();
           |int[] $out = new int[$nW * $perWord];
           |for (int $w = 0; $w < $nW; $w++) {
           |  long $word = $a.getLong($w);
           |  for (int $k = 0; $k < $perWord; $k++) {
           |    int $b = $w * $perWord + $k;
           |    $out[$b] = ($b << $bandBits) | (int) (($word >>> (64 - ($k + 1) * $bandBits)) & ${mask}L);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Index of the first bandBits-wide bit group (MSB-first) on which the two
  * packed signatures agree, or -1 if none. The LSH candidate self-join
  * filters on `FirstEqualBand(sigA, sigB) === band`, which makes each
  * candidate pair survive from exactly ONE of its shared bands — replacing
  * the `distinct()` (a full shuffle of the candidate set, the widest
  * intermediate in the whole pipeline) with a codegen'd filter evaluated
  * inside the join.
  */
final case class FirstEqualBand(left: Expression, right: Expression, bandBits: Int)
    extends BinaryExpression
    with ExpectsInputTypes {
  require(64 % bandBits == 0, s"bandBits must divide 64, got $bandBits")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_first_equal_band"

  private val perWord: Int = 64 / bandBits
  private val mask: Long = (1L << bandBits) - 1

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var w = 0
    while (w < n) {
      val diff = x.getLong(w) ^ y.getLong(w)
      if (diff == 0L) return w * perWord
      var k = 0
      while (k < perWord) {
        if (((diff >>> (64 - (k + 1) * bandBits)) & mask) == 0L) return w * perWord + k
        k += 1
      }
      w += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val w = ctx.freshName("w")
        val k = ctx.freshName("k")
        val n = ctx.freshName("n")
        val diff = ctx.freshName("diff")
        val res = ctx.freshName("res")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $res = -1;
           |outer:
           |for (int $w = 0; $w < $n; $w++) {
           |  long $diff = $a.getLong($w) ^ $b.getLong($w);
           |  for (int $k = 0; $k < $perWord; $k++) {
           |    if ((($diff >>> (64 - ($k + 1) * $bandBits)) & ${mask}L) == 0L) {
           |      $res = $w * $perWord + $k;
           |      break outer;
           |    }
           |  }
           |}
           |${ev.value} = $res;
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Per-row worker for [[ScaledSqDist]] (one virtual call from codegen, so
  * the JIT compiles the loops once and can auto-vectorize them).
  *
  * `compute` proves exactness from element bounds before running the
  * unchecked fused loop: with mq = max|qᵢ|, my = max|sumᵢ|, every term
  * satisfies |ccnt·qᵢ − sumᵢ| ≤ |ccnt|·mq + my = dmax and the sum is
  * ≤ n·dmax², so if n·dmax² fits in int64 no intermediate can wrap. The
  * bounds pre-pass is branch-free min/max reductions (vectorizable); only
  * rows whose bounds admit overflow take the per-element `Math.*Exact`
  * path, which raises instead of wrapping.
  */
final class ScaledSqDistHelper extends Serializable {
  def compute(x: ArrayData, y: ArrayData, cnt: Long): Double = {
    val n = Math.min(x.numElements(), y.numElements())
    var minQ = 0L; var maxQ = 0L; var minY = 0L; var maxY = 0L
    var i = 0
    while (i < n) {
      val q = x.getLong(i); val s = y.getLong(i)
      minQ = Math.min(minQ, q); maxQ = Math.max(maxQ, q)
      minY = Math.min(minY, s); maxY = Math.max(maxY, s)
      i += 1
    }
    val safe =
      try {
        val mq = Math.max(Math.absExact(minQ), Math.absExact(maxQ))
        val my = Math.max(Math.absExact(minY), Math.absExact(maxY))
        val dmax = Math.addExact(Math.multiplyExact(Math.absExact(cnt), mq), my)
        Math.multiplyExact(Math.multiplyExact(dmax, dmax), n.toLong)
        true
      } catch { case _: ArithmeticException => false }
    var acc = 0L
    if (safe) {
      var j = 0
      while (j < n) {
        val d = cnt * x.getLong(j) - y.getLong(j)
        acc += d * d
        j += 1
      }
    } else {
      var j = 0
      while (j < n) {
        val d = Math.subtractExact(Math.multiplyExact(cnt, x.getLong(j)), y.getLong(j))
        acc = Math.addExact(acc, Math.multiplyExact(d, d))
        j += 1
      }
    }
    acc.toDouble / Math.multiplyExact(cnt, cnt).toDouble
  }
}

/** Scaled squared distance to a running centroid for the integer-exact
  * k-means path: given a quantized vector q, a centroid's per-dim integer
  * sum `csum` and its count `ccnt`, returns Σ(ccnt·qᵢ − sumᵢ)² / ccnt² —
  * the squared Euclidean distance to the centroid MEAN, with an exact
  * int64 numerator and one IEEE double division (bit-identical across
  * engines). Replaces an `aggregate(zip_with(...))` formulation: higher-
  * order functions are CodegenFallback (interpreted per row per element),
  * and this sits in the corpus×centroids assignment pass — the k-means
  * hot path at scale.
  *
  * Overflow: the numerator is exact only while Σ(ccnt·qᵢ − sumᵢ)² fits in
  * int64. Per-element `Math.*Exact` would keep that contract but defeats
  * the JIT's auto-vectorization of the hot loop (the overflow branch is
  * per SIMD lane), so the helper instead proves safety once per row from
  * min/max element bounds (a branchless, vectorizable pre-pass) and runs
  * the unchecked fused loop when the proof holds; only a row whose bounds
  * admit overflow takes the per-element-checked path, which raises
  * `ArithmeticException` — the same fail-loud contract as DuckDB BIGINT —
  * instead of silently wrapping to a wrong distance.
  */
final case class ScaledSqDist(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), LongType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_scaled_sq_dist"

  @transient private lazy val helper = new ScaledSqDistHelper

  override def nullSafeEval(q: Any, s: Any, c: Any): Any =
    helper.compute(q.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (q, s, c) => {
        val h = ctx.addReferenceObj("scaledSqDistHelper", helper, classOf[ScaledSqDistHelper].getName)
        s"${ev.value} = $h.compute($q, $s, $c);"
      }
    )

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression
  ): Expression = copy(first = newFirst, second = newSecond, third = newThird)
}

/** Integer dot product of two vectors quantized to floor(xᵢ·scale) — the
  * int8-style quantization scale path for similarity search: at 100 TB a
  * quantized corpus is ~4× smaller in memory/shuffle than float32 (scale 64
  * bounds each element to a signed byte for unit-normalized embeddings),
  * and the score is EXACT integer arithmetic, so ranking is bit-identical
  * across engines with no float-summation-order caveats at all.
  *
  * floor(x·scale) is one IEEE multiply + floor on both engines (identical
  * results); the accumulator is int64. Exactness bound: n·(scale·max|x|)²
  * must fit in int64 — at scale 64, dim 64 that allows max|x| ≈ 1.8e7,
  * far beyond any normalized embedding. Quantization happens INSIDE the
  * expression, fused with the multiply-accumulate, so the hot loop never
  * materializes the quantized arrays.
  */
final case class QuantizedDot(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(x.getDouble(i) * scale).toLong *
        math.floor(y.getDouble(i) * scale).toLong
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
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (long) java.lang.Math.floor($a.getDouble($i) * $scale)
           |      * (long) java.lang.Math.floor($b.getDouble($i) * $scale);
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

/** Product-quantization encoder: codes an int64-quantized vector against a
  * per-subspace codebook. The input is split into `numSub` contiguous
  * subvectors of `subDim` dims; element m of the result is the index of
  * the centroid (0..numCent-1) minimizing the exact int64 squared
  * distance to subvector m, ties to the SMALLEST index. `codebook` is
  * flat, laid out `[(m·numCent + j)·subDim + i]`. One codegen'd loop per
  * row — the unrolled Column-algebra formulation of the same argmin
  * exceeds janino's method-size limit at 8×8×8 and drops the whole stage
  * out of codegen (measured), which is exactly what a 100 TB map-only
  * encode pass cannot afford.
  */
final case class PqEncode(
    child: Expression,
    codebook: Seq[Long],
    numSub: Int,
    numCent: Int,
    subDim: Int
) extends UnaryExpression
    with ExpectsInputTypes {
  require(
    codebook.length == numSub * numCent * subDim,
    s"codebook size ${codebook.length} != $numSub*$numCent*$subDim"
  )

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val flat: Array[Long] = codebook.toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    // fail LOUD on a short vector (the ScaledSqDist convention): reading
    // past an UnsafeArrayData's end is undefined adjacent memory, which
    // would silently encode garbage codes instead of flagging the row
    if (v.numElements() < numSub * subDim)
      throw new IllegalArgumentException(
        s"graft_pq_encode: vector has ${v.numElements()} dims, needs ${numSub * subDim}"
      )
    val out = new Array[Long](numSub)
    var m = 0
    while (m < numSub) {
      var bestJ = 0L
      var bestD = Long.MaxValue
      var j = 0
      while (j < numCent) {
        val off = (m * numCent + j) * subDim
        var s = 0L
        var i = 0
        while (i < subDim) {
          val diff = v.getLong(m * subDim + i) - flat(off + i)
          s += diff * diff
          i += 1
        }
        if (s < bestD) { bestD = s; bestJ = j.toLong }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val cb = ctx.addReferenceObj("pqCodebook", flat, "long[]")
        val m = ctx.freshName("m")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val diff = ctx.freshName("diff")
        val bestJ = ctx.freshName("bestJ")
        val bestD = ctx.freshName("bestD")
        val out = ctx.freshName("out")
        s"""
           |if ($a.numElements() < ${numSub * subDim}) {
           |  throw new IllegalArgumentException(
           |    "graft_pq_encode: vector has " + $a.numElements() + " dims, needs ${numSub * subDim}");
           |}
           |long[] $out = new long[$numSub];
           |for (int $m = 0; $m < $numSub; $m++) {
           |  long $bestJ = 0L;
           |  long $bestD = Long.MAX_VALUE;
           |  for (int $j = 0; $j < $numCent; $j++) {
           |    long $s = 0L;
           |    for (int $i = 0; $i < $subDim; $i++) {
           |      long $diff = $a.getLong($m * $subDim + $i) - $cb[($m * $numCent + $j) * $subDim + $i];
           |      $s += $diff * $diff;
           |    }
           |    if ($s < $bestD) { $bestD = $s; $bestJ = (long) $j; }
           |  }
           |  $out[$m] = $bestJ;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
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

  def hyperplaneSignsPacked(emb: Column, planes: Seq[Double], dim: Int): Column =
    GraftColumns.lift(HyperplaneSignsPacked(GraftColumns.unlift(emb), planes, dim))

  def bandKeys(sig: Column, bandBits: Int): Column =
    GraftColumns.lift(BandKeys(GraftColumns.unlift(sig), bandBits))

  def firstEqualBand(a: Column, b: Column, bandBits: Int): Column =
    GraftColumns.lift(FirstEqualBand(GraftColumns.unlift(a), GraftColumns.unlift(b), bandBits))

  def quantizedDot(a: Column, b: Column, scale: Int): Column =
    GraftColumns.lift(QuantizedDot(GraftColumns.unlift(a), GraftColumns.unlift(b), scale))

  def pqEncode(qv: Column, codebook: Seq[Long], numSub: Int, numCent: Int, subDim: Int): Column =
    GraftColumns.lift(PqEncode(GraftColumns.unlift(qv), codebook, numSub, numCent, subDim))

  def scaledSqDist(qv: Column, csum: Column, ccnt: Column): Column =
    GraftColumns.lift(
      ScaledSqDist(GraftColumns.unlift(qv), GraftColumns.unlift(csum), GraftColumns.unlift(ccnt))
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
