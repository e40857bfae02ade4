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
    // gram hash · 2^20 + position, exactly the native's combined key
    val hashes = transform(
      sequence(lit(0), size(toks) - lit(k)),
      i =>
        conv(substring(md5(concat_ws(" ", slice(toks, i + lit(1), lit(k)))), 1, 8), 16, 10)
          .cast("long") * lit(1048576L) + i
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
          shiftright(x, 20)
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

  test("winnowing rejects documents beyond the 2^20-gram position envelope") {
    // positions pack into the low 20 bits of hash·2²⁰+pos — beyond 2^20
    // grams they would silently corrupt shiftright(key, 20) extractions,
    // so the helper must fail loud instead
    val e = intercept[Exception] {
      spark
        .range(1)
        .select(
          TextFunctions
            .winnowKeys(transform(sequence(lit(1), lit(1048600)), _ => lit("t")), 4, 5)
            .as("fp")
        )
        .first()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("2^20")), s"unexpected error: $e")
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
