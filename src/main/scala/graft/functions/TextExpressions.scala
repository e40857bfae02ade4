package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row worker for [[TopNGram]]: character n-gram mode of one string,
  * ties to the binary-smallest gram (UTF8 byte order — what DuckDB's
  * default collation and Spark's string ordering both use). A plain class
  * so generated code can invoke it through one reference-object virtual
  * call.
  */
final class TopNGramHelper(n: Int) extends Serializable {
  def compute(t: UTF8String): InternalRow = {
    val len = t.numChars()
    if (len < n) return null
    // Char byte-offsets computed once: substringSQL would rescan from the
    // string head per gram (O(len) char-boundary walk each), making gram
    // extraction O(len²) per document — measured 15× slower at sf0.1.
    val bytes = t.getBytes
    val offs = new Array[Int](len + 1)
    var o = 0
    var c = 0
    while (c < len) {
      offs(c) = o
      o += UTF8String.numBytesForFirstByte(bytes(o))
      c += 1
    }
    offs(len) = o
    val counts = new java.util.HashMap[UTF8String, Integer](len * 2)
    var i = 0
    while (i + n <= len) {
      val g = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var bestG: UTF8String = null
    var bestC = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c: Int = e.getValue
      if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) < 0)) {
        bestG = e.getKey
        bestC = c
      }
    }
    new GenericInternalRow(Array[Any](bestG, bestC.toLong))
  }
}

/** Most frequent character n-gram of a string as struct(gram, cnt), null
  * when the string is shorter than n; ties break to the binary-smallest
  * gram. The point is the PLAN: top-gram-per-document is a function of one
  * row, so this runs map-only — the explode → groupBy(doc, gram) →
  * argmax-per-doc formulation shuffles ~len(text) rows per document TWICE
  * for the same answer, which at 100 TB is two corpus-sized shuffles for
  * zero information exchange between documents.
  */
final case class TopNGram(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(n >= 1, s"n must be positive, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType =
    StructType(Seq(StructField("gram", StringType), StructField("cnt", LongType)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_top_ngram"

  @transient private lazy val helper = new TopNGramHelper(n)

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("topNGramHelper", helper, classOf[TopNGramHelper].getName)
    val res = nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
         |${ev.value} = $h.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    )
    res
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the native text expressions. */
object TextFunctions {
  def topNGram(text: Column, n: Int): Column =
    GraftColumns.lift(TopNGram(GraftColumns.unlift(text), n))
}
