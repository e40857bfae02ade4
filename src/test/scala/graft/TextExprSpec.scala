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
