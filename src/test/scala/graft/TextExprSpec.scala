package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.ops.TextOps

/** Native text expressions (TopNGram / NGrams / RollingFingerprint) pinned
  * to the Column/HOF formulations they replaced.
  */
class TextExprSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001"

  test("native n-grams equal the HOF formulation, including order and short arrays") {
    val toks = TextOps.tokens(col("text"))
    for (n <- Seq(3, 5, 8)) {
      val hof = when(
        size(toks) >= n,
        array_distinct(
          transform(
            sequence(lit(0), size(toks) - lit(n)),
            i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)
          )
        )
      ).otherwise(array().cast("array<string>"))
      val diff = graft.ops.Tables.documents(spark, docs)
        .select(TextFunctions.nGrams(toks, n).as("native"), hof.as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(diff == 0, s"n=$n native grams diverge from HOF formulation")
    }
    // short-array guard: 2 tokens, n=3 → empty
    val short = spark.sql("SELECT 1").select(TextFunctions.nGrams(array(lit("a"), lit("b")), 3).as("g"))
    assert(short.first().getSeq[String](0).isEmpty)
  }

  test("native BPE segmentation equals the unrolled replace chain") {
    // the whole corpus: byte-for-byte equality with the 36-pass literal
    // replace program (which the DuckDB oracle still runs)
    val diff = graft.ops.Tables.documents(spark, docs)
      .select(
        TextOps.bpeSegment(col("text")).as("native"),
        TextOps.bpeSegmentUnrolled(col("text")).as("chain")
      )
      .filter(col("native") =!= col("chain"))
      .count()
    assert(diff == 0, "native BPE segmentation diverges from the replace chain on the corpus")
    // adversarial strings the corpus can't be trusted to contain: literal
    // pipes (delimiter collisions), newlines incl. trailing (Java '.'
    // skips line terminators, gluing them to the next char), unicode,
    // empty text, back-to-back merge chains (the resume-after-replacement
    // skip: one replace pass merges every other pair), and rank-order
    // cascades (t+h → th, then th+e → the)
    val cases = Seq(
      "", "|", "a|b||c", "the window", "t h e", "ththththththth", "erererererer",
      "anananananan at in", "line1\nline2\n", "\n\n", "a\r\nb", "naïve café  x",
      "erer\nerer", "scat jowl kelu", "wow sow now", "aaaannnn", "ttthhh"
    )
    val bad = spark
      .createDataFrame(cases.map(Tuple1(_)))
      .toDF("text")
      .select(
        col("text"),
        TextOps.bpeSegment(col("text")).as("native"),
        TextOps.bpeSegmentUnrolled(col("text")).as("chain")
      )
      .collect()
      .filter(r => r.getString(1) != r.getString(2))
      .map(r => s"'${r.getString(0)}': native='${r.getString(1)}' chain='${r.getString(2)}'")
    assert(bad.isEmpty, s"native/chain divergence:\n${bad.mkString("\n")}")
  }

  test("BPE helper equals the literal Java regex+replace program on random strings") {
    // the ground-truth program, straight from the JDK primitives Spark's
    // regexp_replace/replace delegate to: delimit via Pattern "(.)" → "$1|"
    // then fold merges × passes of literal String.replace
    val merges = TextOps.bpeMerges
    val passes = 3
    def reference(s: String): String = {
      val delimited = "|" + java.util.regex.Pattern.compile("(.)").matcher(s).replaceAll("$1|")
      merges.foldLeft(delimited) { case (acc, (x, y)) =>
        (1 to passes).foldLeft(acc)((a, _) => a.replace(s"|$x|$y|", s"|$x$y|"))
      }
    }
    val helper = new graft.functions.BpeSegmentHelper(merges, passes)
    // seeded: failures reproduce. Alphabet is stacked with merge chars so
    // back-to-back chains and rank-order cascades occur constantly, plus
    // pipes, line terminators (\n and \r), space, and a supplementary
    // code point (surrogate pair)
    val alphabet = "tthheerrnnaaoowwssiilukcj| \n\r é😀".toCharArray
    val rnd = new scala.util.Random(42)
    var trial = 0
    while (trial < 2000) {
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      var i = 0
      while (i < len) {
        val c = alphabet(rnd.nextInt(alphabet.length))
        // keep surrogate pairs intact: a lone surrogate would be mangled
        // to '?' by the UTF-8 round-trip on the native side only
        if (Character.isSurrogate(c)) sb.append("😀") else sb.append(c)
        i += 1
      }
      val s = sb.toString
      val got = helper.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      val want = reference(s)
      assert(got == want, s"trial $trial diverged on ${s.map(_.toInt).mkString("[", ",", "]")}:\n  native '$got'\n  ref    '$want'")
      trial += 1
    }
  }

  test("native CDC cuts equal the window-explode + md5-mask formulation") {
    // the q224 window formulation as one HOF expression (same sequence /
    // substring / md5 / conv algebra, cuts kept in window order)
    val chainExpr = expr(
      """filter(transform(sequence(1L, length(text) - 15L),
        |  i -> CASE WHEN cast(conv(substring(md5(substring(text, cast(i as int), 16)), 1, 4), 16, 10) as bigint) % 64 = 0
        |            THEN i + 15L ELSE -1L END),
        |  x -> x != -1L)""".stripMargin
    )
    val diff = graft.ops.Tables.documents(spark, docs)
      .filter(length(col("text")) >= 16)
      .select(
        TextFunctions.cdcCuts(col("text")).as("native"),
        chainExpr.as("chain")
      )
      .filter(col("native") =!= col("chain"))
      .count()
    assert(diff == 0, "native CDC cuts diverge from the window-explode formulation")
    // multi-byte discipline: substring/length are CHARACTER-based while
    // md5 hashes UTF-8 BYTES — the corpus may be pure ASCII, so pin the
    // code-point offset walk on strings where chars ≠ bytes (2-, 3- and
    // 4-byte code points, mixed with ASCII)
    val uni = Seq(
      "é" * 40,
      "☕😀 mixed déjà-vu text with enough length to window ☕😀",
      ("ascii prefix " + "😀" * 20 + " ascii suffix") * 3,
      "日本語のテキストを十六文字以上にするためのサンプル文字列です"
    )
    val uniBad = spark
      .createDataFrame(uni.map(Tuple1(_)))
      .toDF("text")
      .select(
        col("text"),
        TextFunctions.cdcCuts(col("text")).as("native"),
        chainExpr.as("chain")
      )
      .collect()
      .filter(r => r.getSeq[Long](1) != r.getSeq[Long](2))
      .map(r => s"'${r.getString(0).take(30)}…': native=${r.getSeq[Long](1)} chain=${r.getSeq[Long](2)}")
    assert(uniBad.isEmpty, s"multi-byte divergence:\n${uniBad.mkString("\n")}")
    // short-text guard: fewer than 16 chars → no window, no cuts
    val short = spark.range(1).select(TextFunctions.cdcCuts(lit("fifteen chars!!").cast("string")).as("c")).first()
    assert(short.getSeq[Long](0).isEmpty)
  }

  test("native rolling fingerprint equals the HOF fold") {
    val toks = TextOps.tokens(col("text"))
    val tokInts = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val hof = aggregate(
      slice(tokInts, lit(2), greatest(size(tokInts) - 1, lit(0))),
      element_at(tokInts, 1),
      (a, x) => (a * 31 + x) % 1000000007L
    )
    val diff = graft.ops.Tables.documents(spark, docs)
      .select(TextFunctions.rollingFingerprint(toks).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0, "rolling fingerprint diverges from HOF fold")
  }

  test("native winnowing keys equal the HOF sliding-min formulation") {
    val k = 4
    val w = 5
    val toks = TextOps.tokens(col("text"))
    // gram hash · 2^24 + position, exactly the native's combined key
    val hashes = transform(
      sequence(lit(0), size(toks) - lit(k)),
      i =>
        conv(substring(md5(concat_ws(" ", slice(toks, i + lit(1), lit(k)))), 1, 8), 16, 10)
          .cast("long") * lit(16777216L) + i
    )
    val hof = when(
      size(toks) - lit(k) + 1 >= w,
      array_distinct(
        transform(
          sequence(lit(0), size(toks) - lit(k) + 1 - lit(w)),
          j => array_min(slice(hashes, j + lit(1), lit(w)))
        )
      )
    ).otherwise(array().cast("array<long>"))
    val diff = graft.ops.Tables.documents(spark, docs)
      .select(
        sort_array(TextFunctions.winnowKeys(toks, k, w)).as("native"),
        sort_array(hof).as("hof")
      )
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0, "winnow keys diverge from the HOF sliding-min formulation")
  }

  test("winnowing guarantees a shared fingerprint for any shared k+w-1 token run") {
    // two documents overlapping in an 8-token run (k=4, w=5 → guarantee
    // threshold k+w-1 = 8) MUST share at least one selected fingerprint —
    // the property modulo-sampled shingles cannot promise. Shared keys
    // compare on the hash component only (positions differ across docs).
    val shared = "u1 u2 u3 u4 u5 u6 u7 u8"
    val a = s"p1 p2 p3 $shared q1 q2"
    val b = s"r1 $shared s1 s2 s3"
    val df = spark
      .createDataFrame(Seq((1, a), (2, b)))
      .toDF("id", "text")
      .select(
        col("id"),
        transform(TextFunctions.winnowKeys(TextOps.tokens(col("text")), 4, 5), x =>
          shiftright(x, 24)
        ).as("fp")
      )
    val fps = df.collect().map(r => r.getSeq[Long](1).toSet)
    assert(fps(0).intersect(fps(1)).nonEmpty, "shared 8-token run produced no shared fingerprint")
    // density sanity: selections ≤ windows and ≥ windows/w
    val dens = graft.ops.Tables.documents(spark, docs)
      .select(
        size(TextFunctions.winnowKeys(TextOps.tokens(col("text")), 4, 5)).as("fps"),
        greatest(size(TextOps.tokens(col("text"))) - lit(7), lit(0)).as("windows")
      )
      .filter(col("windows") > 0)
      .filter(col("fps") > col("windows") || col("fps") * 5 < col("windows"))
      .count()
    assert(dens == 0, "winnow density outside [windows/w, windows]")
  }

  test("winnowing short-array guard: fewer than w windows selects nothing") {
    val r = spark
      .range(1)
      .select(
        TextFunctions
          .winnowKeys(array((1 to 7).map(i => lit(s"t$i")): _*), 4, 5)
          .as("fp") // 7 tokens → 4 grams < w=5
      )
      .first()
    assert(r.getSeq[Long](0).isEmpty)
  }

  test("winnowing position envelope: 2^24 grams rejected, million-token docs fit") {
    // positions pack into the low 24 bits of hash·2²⁴+pos — beyond 2^24
    // grams they would silently corrupt shiftright(key, 24) extractions,
    // so the helper must fail loud instead. m = tokens - k + 1 = 2^24
    // exactly is the first rejected gram count.
    val e = intercept[Exception] {
      spark
        .range(1)
        .select(
          TextFunctions
            .winnowKeys(transform(sequence(lit(1), lit(16777216 + 3)), _ => lit("t")), 4, 5)
            .as("fp")
        )
        .first()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("2^24")), s"unexpected error: $e")
    // headroom the old 2^20 field lacked: a million-token document (above
    // the previous ceiling) fingerprints cleanly, positions intact — the
    // last selected key decodes back to a position beyond 2^20
    val wide = spark
      .range(1)
      .select(
        TextFunctions
          .winnowKeys(
            transform(sequence(lit(1), lit(1100000)), i => concat(lit("t"), pmod(i, lit(97)))),
            4,
            5
          )
          .as("fp")
      )
      .select(max(expr("array_max(transform(fp, x -> x & 16777215))")).as("maxPos"))
      .first()
    assert(wide.getLong(0) > 1048575L, s"expected a position beyond 2^20, got ${wide.getLong(0)}")
  }

  test("top n-gram ties break to the binary-smallest gram") {
    // "ababa": trigrams aba(2), bab(1) → aba; "abcabc": abc(2),bca(1),cab(1)
    // "aabb": aab(1), abb(1) → tie → aab
    val r = spark.range(1).select(
      TextFunctions.topNGram(lit("ababa"), 3).as("a"),
      TextFunctions.topNGram(lit("aabb"), 3).as("t"),
      TextFunctions.topNGram(lit("ab"), 3).as("n")
    ).first()
    assert(r.getStruct(0).getString(0) == "aba" && r.getStruct(0).getLong(1) == 2L)
    assert(r.getStruct(1).getString(0) == "aab" && r.getStruct(1).getLong(1) == 1L)
    assert(r.isNullAt(2))
  }

  test("PII redaction replaces emails, IPs and phone runs with typed sentinels") {
    import graft.ops.TextOps
    import spark.implicits._
    val rows = Seq(
      ("mail me at alice.smith+x@example.co.uk please", "mail me at <EMAIL> please"),
      ("server 192.168.001.1 and 10.0.0.255 down", "server <IP> and <IP> down"),
      ("call 555-123-4567 or +555 9876 321", "call <PHONE> or <PHONE>"),
      // precision over recall: bare digit runs, versions, order ids survive
      ("order 1234567890 v1.2 shipped", "order 1234567890 v1.2 shipped"),
      ("clean text stays clean", "clean text stays clean")
    ).toDF("text", "expected")
    val bad = rows
      .select(TextOps.redactPii(col("text")).as("got"), col("expected"))
      .filter(col("got") =!= col("expected"))
      .collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
    val flags = rows
      .select(TextOps.hasPii(col("text")).as("f"))
      .collect()
      .map(_.getBoolean(0))
      .toSeq
    assert(flags == Seq(true, true, true, false, false), s"got $flags")
  }
}
