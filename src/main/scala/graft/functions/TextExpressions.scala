package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** Per-row worker for [[NGrams]]: distinct space-joined token n-grams in
  * first-occurrence order — byte-for-byte what `array_distinct(transform(
  * sequence(...), i -> concat_ws(" ", tokens[i..i+n-1])))` produces, which
  * the DuckDB oracles mirror.
  */
final class NGramsHelper(n: Int) extends Serializable {
  private val space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]((m - n + 1) * 2)
    var i = 0
    while (i + n <= m) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = arr.getUTF8String(i + j)
        if (j < n - 1) parts(2 * j + 1) = space
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Distinct token n-grams of an array<string>, joined with single spaces —
  * the shingle/gram builder under MinHash, Jaccard and decontamination.
  * The `transform(sequence(...), i -> concat_ws(...))` formulation runs as
  * interpreted lambdas per element (HOFs are CodegenFallback), and gram
  * construction is the dominant map work of every text-dedup pipeline.
  */
final case class NGrams(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(n >= 1, s"n must be positive, got $n")

  override def inputTypes: Seq[DataType] = Seq(org.apache.spark.sql.types.ArrayType(StringType))

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_ngrams"

  @transient private lazy val helper = new NGramsHelper(n)

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("nGramsHelper", helper, classOf[NGramsHelper].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row worker for [[RollingFingerprint]]: seed = first token's hash,
  * then fold (acc·31 + hash) mod 1e9+7 left-to-right; the per-token hash
  * is the first 8 hex chars of md5 as an unsigned int — identical algebra
  * to the Column/oracle formulation. MessageDigest is not thread-safe and
  * the helper is shared across codegen'd tasks, hence the ThreadLocal.
  */
final class RollingFingerprintHelper extends Serializable {
  @transient private lazy val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def h8(t: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(t.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def compute(arr: ArrayData): java.lang.Long = {
    val m = arr.numElements()
    if (m == 0) return null
    var a = h8(arr.getUTF8String(0))
    var i = 1
    while (i < m) {
      a = (a * 31 + h8(arr.getUTF8String(i))) % 1000000007L
      i += 1
    }
    java.lang.Long.valueOf(a)
  }
}

/** Order-sensitive rolling fingerprint of a token array (the positional
  * dedup signal exact content-hashing misses). Replaces an interpreted
  * `transform` + `aggregate` HOF chain with one codegen'd loop.
  */
final case class RollingFingerprint(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(org.apache.spark.sql.types.ArrayType(StringType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_rolling_fingerprint"

  @transient private lazy val helper = new RollingFingerprintHelper

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("rollingFpHelper", helper, classOf[RollingFingerprintHelper].getName)
    val box = ctx.freshName("box")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
         |java.lang.Long $box = $h.compute($a);
         |${ev.isNull} = $box == null;
         |${ev.value} = ${ev.isNull} ? -1L : $box.longValue();
       """.stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row worker for [[TopTokenNGram]]: mode over space-joined token
  * n-grams WITH multiplicity (unlike [[NGramsHelper]], which dedups), ties
  * to the binary-smallest gram.
  */
final class TopTokenNGramHelper(n: Int) extends Serializable {
  private val space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    if (m < n) return null
    val counts = new java.util.HashMap[UTF8String, Integer]((m - n + 1) * 2)
    var i = 0
    while (i + n <= m) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = arr.getUTF8String(i + j)
        if (j < n - 1) parts(2 * j + 1) = space
        j += 1
      }
      val g = UTF8String.concat(parts: _*)
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

/** Most frequent token n-gram of an array<string> as struct(gram, cnt),
  * null when shorter than n — the repetition-signal core (q29's top-bigram
  * fraction), map-only instead of explode → two corpus shuffles.
  */
final case class TopTokenNGram(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(n >= 1, s"n must be positive, got $n")

  override def inputTypes: Seq[DataType] = Seq(org.apache.spark.sql.types.ArrayType(StringType))

  override def dataType: DataType =
    StructType(Seq(StructField("gram", StringType), StructField("cnt", LongType)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_top_token_ngram"

  @transient private lazy val helper = new TopTokenNGramHelper(n)

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("topTokenNGramHelper", helper, classOf[TopTokenNGramHelper].getName)
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
         |${ev.value} = $h.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row worker for [[KeywordHits]]: counts how many tokens land in each
  * keyword set, all sets checked in ONE pass over the tokens.
  */
final class KeywordHitsHelper(sets: Seq[Seq[String]]) extends Serializable {
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    sets.zipWithIndex.foreach { case (ws, si) =>
      ws.foreach { w =>
        val k = UTF8String.fromString(w)
        var ids = m.get(k)
        if (ids == null) ids = Array.empty[Int]
        m.put(k, ids :+ si)
      }
    }
    m
  }
  private val nSets = sets.length

  def compute(arr: ArrayData): ArrayData = {
    val out = new Array[Int](nSets)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      val ids = lookup.get(arr.getUTF8String(i))
      if (ids != null) {
        var j = 0
        while (j < ids.length) { out(ids(j)) += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-set keyword hit counts over a token array as array<int> — the
  * stopword-voting core of language-ID. One hash probe per token replaces
  * one interpreted filter-HOF scan PER SET.
  */
final case class KeywordHits(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(org.apache.spark.sql.types.ArrayType(StringType))

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def prettyName: String = "graft_keyword_hits"

  @transient private lazy val helper = new KeywordHitsHelper(sets)

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("keywordHitsHelper", helper, classOf[KeywordHitsHelper].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row worker for [[SimHashBits]]: md5 each token once, tally bit
  * votes, emit the majority bit string. Bit p reads bit `p % lanes` of
  * md5 hex-nibble `p / lanes` (lanes=1 → the 16-bit parity profile;
  * lanes=4 → the full 64-bit signature), and bit p is '1' iff
  * 2·ones ≥ n — identical to the ±1-sum ≥ 0 formulation the oracles use.
  */
final class SimHashBitsHelper(numNibbles: Int, lanes: Int) extends Serializable {
  require(numNibbles >= 1 && numNibbles <= 32 && lanes >= 1 && lanes <= 4)
  private val nBits = numNibbles * lanes

  @transient private lazy val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def compute(arr: ArrayData): UTF8String = {
    val m = arr.numElements()
    val ones = new Array[Int](nBits)
    val md = digests.get()
    var i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var p = 0
      while (p < nBits) {
        val g = p / lanes
        // hex char g ↔ byte g/2, high nibble when g is even
        val nib = if ((g & 1) == 0) (d(g >> 1) >> 4) & 0xf else d(g >> 1) & 0xf
        ones(p) += (nib >> (p % lanes)) & 1
        p += 1
      }
      i += 1
    }
    val out = new Array[Char](nBits)
    var p = 0
    while (p < nBits) {
      out(p) = if (2 * ones(p) >= m) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** SimHash bit string of a token array — a per-document function, so it
  * runs map-only; the explode → md5-per-row → wide-aggregate form paid a
  * corpus shuffle plus (for 64 bits) the lane-packing gymnastics needed
  * to keep 65 aggregate buffers inside codegen limits.
  */
final case class SimHashBits(child: Expression, numNibbles: Int, lanes: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(org.apache.spark.sql.types.ArrayType(StringType))

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_simhash_bits"

  @transient private lazy val helper = new SimHashBitsHelper(numNibbles, lanes)

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("simHashBitsHelper", helper, classOf[SimHashBitsHelper].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row worker for [[MinHashSig]]: hash k of a shingle set is the
  * minimum over shingles of the 8-hex-char window `k%4` of
  * md5("{k/4}:" + shingle) — exactly the Column formulation's
  * min(substring(md5(concat(...)))). Lexicographic hex-string min equals
  * unsigned numeric min of the underlying 4 digest bytes, so the loop
  * tracks unsigned ints and renders hex once at the end. Returns null for
  * an empty shingle set (min over nothing), matching the aggregate's
  * NULL.
  */
final class MinHashSigHelper(numHashes: Int) extends Serializable {
  private val numGroups = (numHashes + 3) / 4

  @transient private lazy val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(numGroups)(g => s"$g:".getBytes("UTF-8"))

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m == 0) return null
    val mins = Array.fill(numHashes)(-1) // 0xffffffff = unsigned max
    val md = digests.get()
    var i = 0
    while (i < m) {
      val sb = arr.getUTF8String(i).getBytes
      var g = 0
      while (g < numGroups) {
        md.reset()
        md.update(prefixes(g))
        val d = md.digest(sb)
        var w = 0
        val kMax = math.min(4, numHashes - g * 4)
        while (w < kMax) {
          val v = ((d(4 * w) & 0xff) << 24) | ((d(4 * w + 1) & 0xff) << 16) |
            ((d(4 * w + 2) & 0xff) << 8) | (d(4 * w + 3) & 0xff)
          val k = g * 4 + w
          if (java.lang.Integer.compareUnsigned(v, mins(k)) < 0) mins(k) = v
          w += 1
        }
        g += 1
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = UTF8String.fromString(f"${mins(k) & 0xffffffffL}%08x")
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** MinHash signature of a shingle array as array<string> (8-hex-char
  * values) — per-row, so signature computation is map-only; the
  * explode → md5 → min-aggregate formulation shuffled every shingle row
  * to aggregate what each document already holds locally.
  */
final case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(numHashes >= 1, s"numHashes must be positive, got $numHashes")

  override def inputTypes: Seq[DataType] = Seq(org.apache.spark.sql.types.ArrayType(StringType))

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val helper = new MinHashSigHelper(numHashes)

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("minHashSigHelper", helper, classOf[MinHashSigHelper].getName)
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
         |${ev.value} = $h.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the native text expressions. */
/** Per-row worker for [[WinnowKeys]]: winnowing fingerprint selection
  * (Schleimer, Wilkerson, Aiken — the MOSS local document fingerprinting
  * scheme). Token k-grams are hashed to the same unsigned-32 md5-prefix
  * integer as [[RollingFingerprintHelper]] (DuckDB-reproducible via the
  * sqlHex8 idiom), and every length-`w` window of consecutive gram hashes
  * selects its minimum — ties broken deterministically by combining the
  * hash with the 0-based gram position into one `hash·2²⁴ + pos` key, so
  * both engines pick the identical gram. Distinct selected keys are the
  * document's fingerprints; expected density is 2/(w+1) of the grams.
  * Documents with fewer than w grams produce no fingerprints (no window
  * exists) — the oracle mirrors the same rule.
  */
final class WinnowKeysHelper(k: Int, w: Int) extends Serializable {
  @transient private lazy val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val space = UTF8String.fromString(" ")

  private def h8(t: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(t.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def compute(arr: ArrayData): ArrayData = {
    val nTok = arr.numElements()
    val m = nTok - k + 1 // gram count
    if (m < w) return new GenericArrayData(Array.empty[Any])
    // Positions occupy the low 24 bits of the combined key; a document with
    // >= 2^24 grams would bleed position into the hash component and corrupt
    // every shiftright(key, 24) extraction downstream. Fail loud instead.
    // (24 bits = ~16.7M grams per document — comfortable headroom over
    // million-token documents; the 32-bit hash · 2^24 still fits in 56
    // bits, exact in int64 on both engines.)
    require(
      m < 16777216,
      s"graft_winnow supports at most 2^24-1 grams per document (got $m); " +
        "split the document before fingerprinting")
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](2 * k - 1)
      var j = 0
      while (j < k) {
        parts(2 * j) = arr.getUTF8String(i + j)
        if (j < k - 1) parts(2 * j + 1) = space
        j += 1
      }
      // position folded in below keeps window minima unique (no hash ties)
      hs(i) = h8(UTF8String.concat(parts: _*)) * 16777216L + i
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var j = 0
    while (j + w <= m) {
      var best = hs(j)
      var t = j + 1
      while (t < j + w) {
        if (hs(t) < best) best = hs(t)
        t += 1
      }
      seen.add(java.lang.Long.valueOf(best))
      j += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** Winnowing fingerprints of a token array: the distinct `hash·2²⁴ + pos`
  * keys selected by a sliding min over `w` consecutive k-gram hashes. One
  * codegen'd loop per row (no explode, no shuffle) — the guaranteed-
  * coverage alternative to [[RollingFingerprint]]'s single whole-doc hash
  * and to modulo-sampled shingles: any shared substring of
  * k + w - 1 tokens is guaranteed to share at least one fingerprint.
  */
final case class WinnowKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")

  override def inputTypes: Seq[DataType] = Seq(org.apache.spark.sql.types.ArrayType(StringType))

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_winnow"

  @transient private lazy val helper = new WinnowKeysHelper(k, w)

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("winnowHelper", helper, classOf[WinnowKeysHelper].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row worker for [[BpeSegment]]: rank-ordered BPE merge application,
  * byte-for-byte equal to the unrolled literal-replace program
  * `fold(merges × passes)(replace(s, "|x|y|", "|xy|"))` over the
  * char-delimited text (TextOps.bpeSegmentUnrolled — the form the DuckDB
  * oracle still runs), but in unit-array passes instead of whole-document
  * string rebuilds: one delimit pass, then merges×passes scans over an
  * array of short unit strings with a fixpoint early-exit per merge. The
  * replace chain touches ~2·|merges|·passes·|doc| bytes per document
  * (q125/q126/q136/q185's CPU tail); this touches |doc| bytes once plus
  * cheap length-guarded equality per unit.
  *
  * Exact replace semantics reproduced (each verified against
  * java.lang.String.replace, which Spark's `replace` follows):
  *  - non-overlapping left-to-right scan that resumes AFTER the inserted
  *    replacement, so the trailing '|' of "|xy|" is consumed and the unit
  *    immediately after a merged pair can never start a match in the same
  *    pass (pair (i+2, i+3) is skipped; (i+3, i+4) is the next candidate);
  *  - the delimit step mirrors Spark's regexp_replace(text, "(.)", "$1|"):
  *    Java '.' matches any code point EXCEPT the line terminators \n, \r,
  *    U+0085, U+2028, U+2029, so line terminators glue to the following
  *    char as one inert unit and a trailing line terminator leaves the
  *    string without a final '|';
  *  - literal '|' chars in the text act as delimiters (empty units), which
  *    never match (merge tokens are non-empty and '|'-free).
  */
final class BpeSegmentHelper(merges: Seq[(String, String)], passes: Int) extends Serializable {
  private val xs: Array[String] = merges.map(_._1).toArray
  private val ys: Array[String] = merges.map(_._2).toArray
  private val xys: Array[String] = merges.map(m => m._1 + m._2).toArray

  private def isLineTerminator(cp: Int): Boolean =
    cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    // ---- delimit: unit array of ("|" + regexp_replace(s, "(.)", "$1|"))
    // sized 2·len + 1: a literal '|' code point contributes TWO units
    var units = new Array[String](2 * s.length + 1)
    var n = 0
    val pending = new java.lang.StringBuilder(8)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      if (cp == '|') {
        // the char itself is a delimiter (closes pending), then its
        // regexp-inserted delimiter closes an empty unit
        units(n) = pending.toString; n += 1
        units(n) = ""; n += 1
        pending.setLength(0)
      } else if (isLineTerminator(cp)) {
        pending.appendCodePoint(cp) // '.' doesn't match: no delimiter emitted
      } else {
        pending.appendCodePoint(cp)
        units(n) = pending.toString; n += 1
        pending.setLength(0)
      }
      i += cc
    }
    // trailing line terminators form an unclosed final unit (no '|' after)
    val endsWithDelim = pending.length() == 0
    if (!endsWithDelim) { units(n) = pending.toString; n += 1 }

    // ---- merge passes over the unit array, fixpoint early-exit per merge
    var buf = new Array[String](n)
    var m = 0
    while (m < xs.length) {
      val x = xs(m); val y = ys(m); val xy = xys(m)
      var p = 0
      var changed = true
      while (p < passes && changed) {
        changed = false
        var w = 0
        var j = 0
        while (j < n) {
          // pair (j, j+1) needs its closing '|': absent only for the last
          // unit of a terminator-ended string
          if (j + 1 < n && (endsWithDelim || j + 1 < n - 1) &&
            x == units(j) && y == units(j + 1)) {
            buf(w) = xy; w += 1
            changed = true
            // the unit after a merged pair cannot start a match this pass
            // (its leading '|' was consumed by the replacement)
            if (j + 2 < n) { buf(w) = units(j + 2); w += 1 }
            j += 3
          } else {
            buf(w) = units(j); w += 1
            j += 1
          }
        }
        val t = units; units = buf; buf = t
        n = w
        p += 1
      }
      m += 1
    }

    // ---- reconstruct "|u0|u1|...|", trailing '|' per the delimit rule
    val sb = new java.lang.StringBuilder(2 * s.length + 2)
    sb.append('|')
    var k = 0
    while (k < n) {
      sb.append(units(k))
      if (k < n - 1 || endsWithDelim) sb.append('|')
      k += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Rank-ordered BPE merge application as ONE codegen'd expression per row
  * — replaces the |merges|·passes chained `replace` scans of
  * `bpeSegmentUnrolled` (exact equality pinned by TextExprSpec). Map-only
  * at 100 TB, same as the chain, just ~1 pass instead of ~36.
  */
final case class BpeSegment(child: Expression, merges: Seq[(String, String)], passes: Int)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(passes >= 1, s"passes must be positive, got $passes")
  require(
    merges.forall { case (x, y) => x.nonEmpty && y.nonEmpty && !x.contains("|") && !y.contains("|") },
    s"merge tokens must be non-empty and '|'-free, got $merges")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_segment"

  @transient private lazy val helper = new BpeSegmentHelper(merges, passes)

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("bpeSegmentHelper", helper, classOf[BpeSegmentHelper].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row worker for [[CdcCuts]]: content-defined chunk boundaries — the
  * positions i (1-based, in code points) where the 16-char window starting
  * at i hashes to the 6-bit mask, emitted as cut offsets i+15. Equal by
  * construction to the q224 expression chain
  * `explode(transform(sequence(1, n-15), i -> substring(text, i, 16)))`
  * filtered on `conv(substring(md5(w), 1, 4), 16, 10) % 64 = 0`, but
  * without materializing a 16-char substring + struct per BYTE position
  * through an explode (~24× the corpus volume): one offsets walk, then an
  * md5 per window over the byte slice in place (the window hash mask is
  * the first two digest bytes — conv of the first 4 hex digits). Rows
  * emitted are only the ~1/64 boundaries.
  */
final class CdcCutsHelper extends Serializable {
  @transient private lazy val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String): ArrayData = {
    val nChars = text.numChars()
    if (nChars < 16) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    // code-point byte offsets (the TopNGramHelper discipline): substring
    // semantics are by character, md5 runs over the window's UTF-8 bytes
    val offs = new Array[Int](nChars + 1)
    var o = 0
    var c = 0
    while (c < nChars) {
      offs(c) = o
      o += UTF8String.numBytesForFirstByte(bytes(o))
      c += 1
    }
    offs(nChars) = o
    val md = digests.get()
    val cuts = new scala.collection.mutable.ArrayBuffer[Any](nChars / 32 + 1)
    var i = 0 // 0-based window start; SQL's i is this + 1
    val last = nChars - 16
    while (i <= last) {
      md.reset()
      md.update(bytes, offs(i), offs(i + 16) - offs(i))
      val d = md.digest()
      // conv(substring(hex, 1, 4), 16, 10) % 64 == 0  ⇔  low 6 bits of the
      // second digest byte are zero (the high byte contributes multiples
      // of 256 ≡ 0 mod 64)
      if ((d(1) & 0x3f) == 0) cuts += java.lang.Long.valueOf((i + 16).toLong) // (i+1) + 15
      i += 1
    }
    new GenericArrayData(cuts.toArray)
  }
}

/** Content-defined chunk cut positions of a string: `array<long>` of the
  * 1-based code-point offsets ending each hash-gated 16-char window. One
  * codegen'd loop per row; the document's final cut (its length) is NOT
  * included — q224 unions it per the chunking definition.
  */
final case class CdcCuts(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  @transient private lazy val helper = new CdcCutsHelper

  override def nullSafeEval(a: Any): Any =
    helper.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("cdcCutsHelper", helper, classOf[CdcCutsHelper].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  def topNGram(text: Column, n: Int): Column =
    GraftColumns.lift(TopNGram(GraftColumns.unlift(text), n))

  def nGrams(tokens: Column, n: Int): Column =
    GraftColumns.lift(NGrams(GraftColumns.unlift(tokens), n))

  def rollingFingerprint(tokens: Column): Column =
    GraftColumns.lift(RollingFingerprint(GraftColumns.unlift(tokens)))

  def topTokenNGram(tokens: Column, n: Int): Column =
    GraftColumns.lift(TopTokenNGram(GraftColumns.unlift(tokens), n))

  def keywordHits(tokens: Column, sets: Seq[Seq[String]]): Column =
    GraftColumns.lift(KeywordHits(GraftColumns.unlift(tokens), sets))

  def simHashBits(tokens: Column, numNibbles: Int, lanes: Int): Column =
    GraftColumns.lift(SimHashBits(GraftColumns.unlift(tokens), numNibbles, lanes))

  def minHashSig(shingles: Column, numHashes: Int): Column =
    GraftColumns.lift(MinHashSig(GraftColumns.unlift(shingles), numHashes))

  def winnowKeys(tokens: Column, k: Int, w: Int): Column =
    GraftColumns.lift(WinnowKeys(GraftColumns.unlift(tokens), k, w))

  def bpeSegment(text: Column, merges: Seq[(String, String)], passes: Int): Column =
    GraftColumns.lift(BpeSegment(GraftColumns.unlift(text), merges, passes))

  def cdcCuts(text: Column): Column =
    GraftColumns.lift(CdcCuts(GraftColumns.unlift(text)))
}
